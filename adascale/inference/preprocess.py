"""On-device preprocessing for inference.

The reference does short-side-720 INTER_AREA downsampling, /32 zero-padding
and HWC->CHW layout on the host with cv2/numpy (inferencing/
adaptive_scaling.py:96-121,296-308). Here the whole chain — area resize, pad,
normalize — runs inside one jitted function per shape bucket, so a page goes
host->device once as raw uint8 and everything else stays on-chip
(BASELINE.json north star).

Static-shape strategy: target shapes are computed on host (cheap integer
math), then snapped up to a bucket (multiple of ``bucket`` which is itself a
multiple of 32) so recompiles are bounded; validity masks handle the
bucket slack.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import area_downsample, pad_length_to_make_divisible


def compute_rough_shapes(
    height: int,
    width: int,
    short_side: int = 720,
    divisor: int = 32,
    bucket: int = 64,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Returns (resized_hw, padded_hw) for the rough pass.

    resized_hw follows the reference's short-side rule (inferencing/
    adaptive_scaling.py:96-107): downsample only if min side > short_side,
    preserving aspect ratio (round like cv2 resize with fx=fy scale).
    padded_hw snaps resized_hw up to the bucket (>= divisor granularity).
    """
    h, w = height, width
    if min(h, w) > short_side:
        if h < w:
            scale = short_side / h
            rh, rw = short_side, round(w * scale)
        else:
            scale = short_side / w
            rh, rw = round(h * scale), short_side
    else:
        rh, rw = h, w
    assert bucket % divisor == 0
    ph = math.ceil(rh / bucket) * bucket
    pw = math.ceil(rw / bucket) * bucket
    return (rh, rw), (ph, pw)


def compute_padded_shape(
    height: int, width: int, divisor: int = 32, bucket: int = 64
) -> Tuple[int, int]:
    assert bucket % divisor == 0
    return (
        math.ceil(height / bucket) * bucket,
        math.ceil(width / bucket) * bucket,
    )


@partial(jax.jit, static_argnames=("resized_hw", "padded_hw"))
def preprocess_image(
    image: jax.Array,  # (H, W, 3) uint8/float
    resized_hw: Tuple[int, int],
    padded_hw: Tuple[int, int],
) -> jax.Array:
    """uint8 HWC -> (1, PH, PW, 3) float32: area-downsample to resized_hw,
    zero-pad bottom/right to padded_hw."""
    x = image.astype(jnp.float32)[None]
    x = area_downsample(x, resized_hw)
    rh, rw = resized_hw
    ph, pw = padded_hw
    if (ph, pw) != (rh, rw):
        x = jnp.pad(x, ((0, 0), (0, ph - rh), (0, pw - rw), (0, 0)))
    return x
