"""AdaptiveScaling product model: shared ConvNeXt backbone + two necks + six
heads, NHWC Flax.

Behavioral spec from the reference (/root/reference/vkit_open_model/model/
adaptive_scaling.py:27-177):
  * neck out_channels = backbone.in_channels_group[-2]   (:79)
  * rough neck -> rough_char_mask_head (1ch)
               -> rough_char_height_head (1ch + Softplus, bias init 8.0)
  * precise neck -> optional precise_char_mask_head (1ch)
                 -> precise_char_prob_head (1ch)
                 -> precise_char_up_left_corner_offset_head (2ch)
                 -> precise_char_corner_angle_head (4ch)
                 -> precise_char_corner_distance_head (4ch + Softplus)
    NOTE: the corner-distance head intentionally emits 4 channels while the
    GT supplies only 3 distances; the loss consumes ch0 (up-left) for
    distance regulation and ch1:4 against GT (loss_function/
    adaptive_scaling.py:253-268) and inference consumes all 4
    (inferencing/adaptive_scaling.py:435-437). Keep 4 channels.

``forward_rough(x)`` -> (mask_logits, height), each (B, H/FDF, W/FDF, 1)
``forward_precise(x)`` -> (prob_logits, offset, angle_logits, distance)
with FDF = 4 / upsampling_factor (default 2).

API is NHWC; the two entry points map onto jitted JAX functions the way the
reference's TorchScript ``forward_rough``/``forward_precise`` exports do
(train.py:278-280, inferencing/adaptive_scaling.py:85-90).
"""
from __future__ import annotations

import dataclasses
from enum import Enum, unique
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convnext import ConvNeXt, ConvNeXtConfig, CONVNEXT_PRESETS
from .fpn import FpnHead, FpnNeck
from .upernext import UperNextHead, UperNextNeck

Dtype = Any


@unique
class AdaptiveScalingSize(Enum):
    TINY = "tiny"
    SMALL = "small"
    BASE = "base"
    LARGE = "large"


@unique
class AdaptiveScalingNeckHeadType(Enum):
    FPN = "fpn"
    UPERNEXT = "upernext"


@dataclasses.dataclass(frozen=True)
class AdaptiveScalingConfig:
    """Mirrors reference model/adaptive_scaling.py:41-48."""

    size: AdaptiveScalingSize = AdaptiveScalingSize.SMALL
    neck_head_type: AdaptiveScalingNeckHeadType = AdaptiveScalingNeckHeadType.FPN
    rough_upsampling_factor: int = 2
    rough_init_char_height_output_bias: float = 8.0
    precise_upsampling_factor: int = 2
    precise_enable_char_mask_head: bool = False
    # Extension over the reference: override the backbone stage spec (e.g.
    # micro models for tests). None -> use the named size preset.
    custom_block_channels_and_num_layers: Optional[Tuple[Tuple[int, int], ...]] = None


class AdaptiveScaling(nn.Module):
    config: AdaptiveScalingConfig = AdaptiveScalingConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        size = cfg.size if isinstance(cfg.size, AdaptiveScalingSize) else AdaptiveScalingSize(cfg.size)
        nh = (
            cfg.neck_head_type
            if isinstance(cfg.neck_head_type, AdaptiveScalingNeckHeadType)
            else AdaptiveScalingNeckHeadType(cfg.neck_head_type)
        )

        backbone_config = ConvNeXtConfig(
            block_channels_and_num_layers=(
                cfg.custom_block_channels_and_num_layers
                if cfg.custom_block_channels_and_num_layers is not None
                else CONVNEXT_PRESETS[size.value]
            )
        )
        self.backbone = ConvNeXt(config=backbone_config, dtype=self.dtype)
        in_channels_group = backbone_config.in_channels_group
        neck_out_channels = in_channels_group[-2]

        if nh == AdaptiveScalingNeckHeadType.FPN:
            neck_cls, head_cls = FpnNeck, FpnHead
        else:
            neck_cls, head_cls = UperNextNeck, UperNextHead

        self.rough_neck = neck_cls(
            in_channels_group=in_channels_group,
            out_channels=neck_out_channels,
            dtype=self.dtype,
        )
        self.rough_char_mask_head = head_cls(
            out_channels=1,
            upsampling_factor=cfg.rough_upsampling_factor,
            dtype=self.dtype,
        )
        self.rough_char_height_head = head_cls(
            out_channels=1,
            upsampling_factor=cfg.rough_upsampling_factor,
            init_output_bias=cfg.rough_init_char_height_output_bias,
            dtype=self.dtype,
        )

        self.precise_neck = neck_cls(
            in_channels_group=in_channels_group,
            out_channels=neck_out_channels,
            dtype=self.dtype,
        )
        if cfg.precise_enable_char_mask_head:
            self.precise_char_mask_head = head_cls(
                out_channels=1,
                upsampling_factor=cfg.precise_upsampling_factor,
                dtype=self.dtype,
            )
        self.precise_char_prob_head = head_cls(
            out_channels=1,
            upsampling_factor=cfg.precise_upsampling_factor,
            dtype=self.dtype,
        )
        self.precise_char_up_left_corner_offset_head = head_cls(
            out_channels=2,
            upsampling_factor=cfg.precise_upsampling_factor,
            dtype=self.dtype,
        )
        self.precise_char_corner_angle_head = head_cls(
            out_channels=4,
            upsampling_factor=cfg.precise_upsampling_factor,
            dtype=self.dtype,
        )
        self.precise_char_corner_distance_head = head_cls(
            out_channels=4,
            upsampling_factor=cfg.precise_upsampling_factor,
            dtype=self.dtype,
        )

    def forward_rough(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        """(B, H, W, 3) -> mask logits, char height; each (B, H/FDF, W/FDF, 1)."""
        features = self.backbone(x, deterministic)
        neck = self.rough_neck(features)
        mask_logits = self.rough_char_mask_head(neck)
        height = jax.nn.softplus(
            self.rough_char_height_head(neck).astype(jnp.float32)
        )
        return mask_logits, height

    def forward_precise(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """(B, H, W, 3) -> (prob logits (B,h,w,1), up-left offset (B,h,w,2),
        corner-angle logits (B,h,w,4), corner distance (B,h,w,4))."""
        features = self.backbone(x, deterministic)
        neck = self.precise_neck(features)
        prob_logits = self.precise_char_prob_head(neck)
        offset = self.precise_char_up_left_corner_offset_head(neck)
        angle_logits = self.precise_char_corner_angle_head(neck)
        distance = jax.nn.softplus(
            self.precise_char_corner_distance_head(neck).astype(jnp.float32)
        )
        return prob_logits, offset, angle_logits, distance

    def forward_rough_from_features(
        self, features: Tuple[jax.Array, ...]
    ) -> Tuple[jax.Array, jax.Array]:
        """Rough neck + heads on precomputed backbone features — lets the
        inference engine swap in the Pallas-fused backbone
        (adascale.ops.pallas.convnext_forward_pallas) while sharing one
        param tree."""
        neck = self.rough_neck(list(features))
        mask_logits = self.rough_char_mask_head(neck)
        height = jax.nn.softplus(
            self.rough_char_height_head(neck).astype(jnp.float32)
        )
        return mask_logits, height

    def forward_precise_from_features(
        self, features: Tuple[jax.Array, ...]
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Precise neck + heads on precomputed backbone features."""
        neck = self.precise_neck(list(features))
        prob_logits = self.precise_char_prob_head(neck)
        offset = self.precise_char_up_left_corner_offset_head(neck)
        angle_logits = self.precise_char_corner_angle_head(neck)
        distance = jax.nn.softplus(
            self.precise_char_corner_distance_head(neck).astype(jnp.float32)
        )
        return prob_logits, offset, angle_logits, distance

    def forward_precise_with_mask(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, ...]:
        """Variant exposing the optional precise char-mask head
        (config.precise_enable_char_mask_head=True)."""
        assert self.config.precise_enable_char_mask_head
        features = self.backbone(x, deterministic)
        neck = self.precise_neck(features)
        mask_logits = self.precise_char_mask_head(neck)
        prob_logits = self.precise_char_prob_head(neck)
        offset = self.precise_char_up_left_corner_offset_head(neck)
        angle_logits = self.precise_char_corner_angle_head(neck)
        distance = jax.nn.softplus(
            self.precise_char_corner_distance_head(neck).astype(jnp.float32)
        )
        return mask_logits, prob_logits, offset, angle_logits, distance

    def __call__(self, x: jax.Array, deterministic: bool = True):
        """Default apply: both passes (used for init — must touch every
        head so their params materialize, including the optional precise
        char-mask head)."""
        rough = self.forward_rough(x, deterministic)
        if self.config.precise_enable_char_mask_head:
            precise = self.forward_precise_with_mask(x, deterministic)
        else:
            precise = self.forward_precise(x, deterministic)
        return rough, precise
