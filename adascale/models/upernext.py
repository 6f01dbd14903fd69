"""UPerNeXt neck + head (UPerNet-style alternative decoder), NHWC Flax.

Behavioral spec from the reference (/root/reference/vkit_open_model/model/
upernext.py:21-248): PPM (pyramid pooling at scales 1/2/3/6 + 1x1 blocks +
*bilinear* upsample back + concat + 3x3 block) on the last level; 1x1
laterals elsewhere; top-down bilinear fuse; 3x3 step-2 blocks that skip the
last level; bilinear upsample-all + concat. Head mirrors FpnHead with
bilinear upsampling. Init: trunc_normal(0.02).

Bilinear resizes use the half-pixel convention (align_corners=False parity)
and are expressed as separable MXU matmuls; adaptive pooling likewise
(see adascale.ops.resize).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import adaptive_avg_pool, resize_bilinear
from .convnext import gelu_exact, trunc_normal_init

Dtype = Any


class UConv1x1Block(nn.Module):
    """Dense -> (LN) -> GELU (reference upernext.py:21-35)."""

    out_channels: int
    no_ln: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.out_channels, kernel_init=trunc_normal_init, dtype=self.dtype, name="conv"
        )(x)
        if not self.no_ln:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        return gelu_exact(x)


class UConv3x3Block(nn.Module):
    """3x3 conv -> LN -> GELU (reference upernext.py:38-45)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(3, 3),
            padding=1,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        return gelu_exact(x)


class PpmBlock(nn.Module):
    """Pyramid pooling module (reference upernext.py:48-84)."""

    out_channels: int
    ppm_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shape = (x.shape[1], x.shape[2])
        features = [x]
        for i, scale in enumerate(self.ppm_scales):
            f = adaptive_avg_pool(x, scale)
            f = UConv1x1Block(self.out_channels, dtype=self.dtype, name=f"ap_conv{i}")(f)
            f = resize_bilinear(f, shape)
            features.append(f)
        cat = jnp.concatenate(features, axis=-1)
        return UConv3x3Block(self.out_channels, dtype=self.dtype, name="final_conv")(cat)


class UperNextNeck(nn.Module):
    """UPerNet-style multi-level fusion producing (B, H0, W0, out_channels)
    (reference upernext.py:87-198)."""

    in_channels_group: Sequence[int]
    out_channels: int
    ppm_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jax.Array]) -> jax.Array:
        num = len(features)
        assert num == len(self.in_channels_group) and num > 1
        assert self.out_channels % num == 0
        inner = self.out_channels // num

        # Step 1: 1x1 laterals; PPM on the last level (upernext.py:89-116).
        outputs = [
            UConv1x1Block(inner, dtype=self.dtype, name=f"step1_{i}")(features[i])
            for i in range(num - 1)
        ]
        outputs.append(
            PpmBlock(inner, ppm_scales=self.ppm_scales, dtype=self.dtype, name="ppm")(
                features[-1]
            )
        )

        # Top-down bilinear upsample + add (upernext.py:173-182).
        for i in range(num - 1, 0, -1):
            prev = outputs[i - 1]
            outputs[i - 1] = prev + resize_bilinear(
                outputs[i], (prev.shape[1], prev.shape[2])
            )

        # Step 2: 3x3 blocks, skipping the last level (upernext.py:118-133,184-186).
        for i in range(num - 1):
            outputs[i] = UConv3x3Block(inner, dtype=self.dtype, name=f"step2_{i}")(outputs[i])

        # Bilinear upsample all to level-0 resolution and concat (:188-198).
        shape0 = (features[0].shape[1], features[0].shape[2])
        outputs = [outputs[0]] + [resize_bilinear(o, shape0) for o in outputs[1:]]
        return jnp.concatenate(outputs, axis=-1)


class UperNextHead(nn.Module):
    """Prediction head with bilinear pre-upsample (reference upernext.py:201-248)."""

    out_channels: int
    upsampling_factor: int = 1
    init_output_bias: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        inner = (in_channels + self.out_channels) // 2

        if self.upsampling_factor > 1:
            x = resize_bilinear(
                x,
                (x.shape[1] * self.upsampling_factor, x.shape[2] * self.upsampling_factor),
            )

        x = UConv3x3Block(inner, dtype=self.dtype, name="step1")(x)
        x = nn.Dense(
            self.out_channels,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.constant(self.init_output_bias),
            dtype=self.dtype,
            name="step2",
        )(x)
        return x
