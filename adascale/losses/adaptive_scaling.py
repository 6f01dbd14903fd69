"""Composite rough / precise losses for AdaptiveScaling training.

Behavioral spec from /root/reference/vkit_open_model/loss_function/
adaptive_scaling.py:27-346, adapted to NHWC predictions and static-shape jit:

  * The label core box is a *static* (up, down, left, right) tuple — the
    collate contract makes it constant per batch (reference dataset/
    adaptive_scaling.py:353-363), so the crop is a static slice (recompiles
    only when the dataset geometry changes).
  * Predictions arrive NHWC; dense heatmap terms squeeze the channel dim,
    sparse geometry terms gather at P label points with one advanced-indexing
    gather (reference's get_label_point_feature, :167-179).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .primitives import (
    cross_entropy_with_logits_loss,
    dice_loss,
    focal_with_logits_loss,
    l1_loss,
    l2_loss,
    wahr_loss,
    weighted_bce_with_logits_loss,
)


class CoreBox(NamedTuple):
    """Inclusive box (reference vkit Box semantics: slice up:down+1, left:right+1)."""

    up: int
    down: int
    left: int
    right: int

    @property
    def height(self) -> int:
        return self.down + 1 - self.up

    @property
    def width(self) -> int:
        return self.right + 1 - self.left


@dataclasses.dataclass(frozen=True)
class AdaptiveScalingRoughLossConfig:
    """Reference loss_function/adaptive_scaling.py:27-35."""

    bce_negative_ratio: float = 3.0
    bce_factor: float = 0.0
    focal_factor: float = 5.0
    dice_factor: float = 1.0
    l1_factor: float = 1.0
    downsampled_score_map_min: float = 1.1
    char_height_feature_min: float = 1.1


@dataclasses.dataclass(frozen=True)
class AdaptiveScalingPreciseLossConfig:
    """Reference loss_function/adaptive_scaling.py:134-145."""

    char_mask_focal_factor: float = 0.0
    char_prob_l1_factor: float = 0.0
    char_prob_pos_l2_factor: float = 2.0
    char_prob_neg_l2_factor: float = 1.0
    char_prob_wahr_factor: float = 0.0
    char_up_left_offset_l1_factor: float = 1.0
    char_up_left_distance_regulation_l1_factor: float = 1.0
    char_corner_angle_cross_entropy_factor: float = 5.0
    char_corner_distance_l1_factor: float = 1.0
    loss_factor: float = 0.15


def _crop_core(x: jax.Array, core_box: CoreBox) -> jax.Array:
    """Static crop of (B, H, W) to the inclusive core box."""
    return x[:, core_box.up : core_box.down + 1, core_box.left : core_box.right + 1]


def get_label_point_feature(
    feature: jax.Array,  # (B, H, W, C)
    label_point_y: jax.Array,  # (B, P) int
    label_point_x: jax.Array,  # (B, P) int
) -> jax.Array:
    """Gather per-point channels: (B, H, W, C) + (B, P) -> (B, P, C)
    (reference loss_function/adaptive_scaling.py:167-179, NHWC layout)."""
    batch_size = feature.shape[0]
    batch_idx = jnp.arange(batch_size)[:, None]
    return feature[batch_idx, label_point_y, label_point_x]


def rough_loss(
    rough_char_mask_feature: jax.Array,  # (B, H, W, 1) logits
    rough_char_height_feature: jax.Array,  # (B, H, W, 1) softplus output
    downsampled_mask: jax.Array,  # (B, CH, CW)
    downsampled_score_map: jax.Array,  # (B, CH, CW)
    core_box: CoreBox,
    config: AdaptiveScalingRoughLossConfig = AdaptiveScalingRoughLossConfig(),
) -> jax.Array:
    """Reference AdaptiveScalingRoughLossFunction.__call__ (:53-131)."""
    mask_logits = _crop_core(jnp.squeeze(rough_char_mask_feature, -1), core_box)
    height = _crop_core(jnp.squeeze(rough_char_height_feature, -1), core_box)

    loss = jnp.zeros((), dtype=jnp.float32)

    if config.bce_factor > 0.0:
        loss += config.bce_factor * weighted_bce_with_logits_loss(
            mask_logits, downsampled_mask, negative_ratio=config.bce_negative_ratio
        )
    if config.focal_factor > 0.0:
        loss += config.focal_factor * focal_with_logits_loss(mask_logits, downsampled_mask)
    if config.dice_factor > 0.0:
        loss += config.dice_factor * dice_loss(
            jax.nn.sigmoid(mask_logits), downsampled_mask
        )

    if config.l1_factor > 0.0:
        # Critical mask: both prediction and GT above clamp minimum, inside
        # the char mask (:110-122).
        l1_mask = (
            (height > config.char_height_feature_min)
            & (downsampled_score_map > config.downsampled_score_map_min)
            & (downsampled_mask > 0)
        ).astype(jnp.float32)
        height_c = jnp.clip(height, min=config.char_height_feature_min)
        score_c = jnp.clip(downsampled_score_map, min=config.downsampled_score_map_min)
        # Log space + smooth-L1 models relative scale error (:123-128).
        loss += config.l1_factor * l1_loss(
            jnp.log(height_c), jnp.log(score_c), mask=l1_mask, smooth=True
        )

    return loss


def precise_loss(
    precise_char_prob_feature: jax.Array,  # (B, H, W, 1) logits
    precise_char_up_left_corner_offset_feature: jax.Array,  # (B, H, W, 2)
    precise_char_corner_angle_feature: jax.Array,  # (B, H, W, 4) logits
    precise_char_corner_distance_feature: jax.Array,  # (B, H, W, 4) softplus out
    downsampled_char_prob_score_map: jax.Array,  # (B, CH, CW)
    downsampled_char_mask: jax.Array,  # (B, CH, CW)
    core_box: CoreBox,
    downsampled_label_point_y: jax.Array,  # (B, P)
    downsampled_label_point_x: jax.Array,  # (B, P)
    char_up_left_offsets: jax.Array,  # (B, P, 2)
    char_corner_angles: jax.Array,  # (B, P, 4)
    char_corner_distances: jax.Array,  # (B, P, 3)
    config: AdaptiveScalingPreciseLossConfig = AdaptiveScalingPreciseLossConfig(),
    precise_char_mask_feature: Optional[jax.Array] = None,  # (B, H, W, 1) logits
) -> jax.Array:
    """Reference AdaptiveScalingPreciseLossFunction.__call__ (:181-346)."""
    prob_logits = _crop_core(jnp.squeeze(precise_char_prob_feature, -1), core_box)

    # Sparse gathers at P label points on the *uncropped* features (:233-268).
    offset_pts = get_label_point_feature(
        precise_char_up_left_corner_offset_feature,
        downsampled_label_point_y,
        downsampled_label_point_x,
    )  # (B, P, 2)
    angle_pts = get_label_point_feature(
        precise_char_corner_angle_feature,
        downsampled_label_point_y,
        downsampled_label_point_x,
    )  # (B, P, 4)
    distance_pts = get_label_point_feature(
        precise_char_corner_distance_feature,
        downsampled_label_point_y,
        downsampled_label_point_x,
    )  # (B, P, 4)
    distance_trimmed = distance_pts[:, :, 1:]  # (B, P, 3)
    distance_up_left = distance_pts[:, :, 0]  # (B, P)

    loss = jnp.zeros((), dtype=jnp.float32)

    if config.char_mask_focal_factor > 0.0:
        assert precise_char_mask_feature is not None
        mask_logits = _crop_core(jnp.squeeze(precise_char_mask_feature, -1), core_box)
        loss += config.char_mask_focal_factor * focal_with_logits_loss(
            mask_logits, downsampled_char_mask
        )

    if (
        config.char_prob_l1_factor > 0.0
        or config.char_prob_pos_l2_factor > 0.0
        or config.char_prob_neg_l2_factor > 0.0
        or config.char_prob_wahr_factor > 0.0
    ):
        prob_sigmoid = jax.nn.sigmoid(prob_logits)
        if config.char_prob_l1_factor > 0.0:
            loss += config.char_prob_l1_factor * l1_loss(
                prob_sigmoid,
                downsampled_char_prob_score_map,
                mask=downsampled_char_mask,
                smooth=True,
                smooth_beta=0.25,
            )
        if config.char_prob_pos_l2_factor > 0.0:
            loss += config.char_prob_pos_l2_factor * l2_loss(
                prob_sigmoid,
                downsampled_char_prob_score_map,
                mask=downsampled_char_mask,
            )
        if config.char_prob_neg_l2_factor > 0.0:
            loss += config.char_prob_neg_l2_factor * l2_loss(
                prob_sigmoid,
                downsampled_char_prob_score_map,
                mask=(1.0 - downsampled_char_mask),
            )
        if config.char_prob_wahr_factor > 0.0:
            loss += config.char_prob_wahr_factor * wahr_loss(
                prob_sigmoid, downsampled_char_prob_score_map
            )

    if config.char_up_left_offset_l1_factor > 0.0:
        loss += config.char_up_left_offset_l1_factor * l1_loss(
            offset_pts, char_up_left_offsets, smooth=True, smooth_beta=2.5
        )

    if config.char_up_left_distance_regulation_l1_factor > 0.0:
        # ||predicted offset|| should agree with the predicted up-left
        # corner distance (:315-326).
        loss += config.char_up_left_distance_regulation_l1_factor * l1_loss(
            jnp.linalg.norm(offset_pts, axis=2),
            distance_up_left,
            smooth=True,
            smooth_beta=2.5,
        )

    if config.char_corner_angle_cross_entropy_factor > 0.0:
        # Class axis is the last (channel) axis in NHWC gather layout.
        loss += config.char_corner_angle_cross_entropy_factor * (
            cross_entropy_with_logits_loss(angle_pts, char_corner_angles, class_axis=2)
        )

    if config.char_corner_distance_l1_factor > 0.0:
        loss += config.char_corner_distance_l1_factor * l1_loss(
            distance_trimmed, char_corner_distances, smooth=True, smooth_beta=2.5
        )

    # Multitask gradient balance (:343-344).
    return loss * config.loss_factor
