"""Tiled whole-page rough inference for large scans.

The reference caps rough-pass cost by downsampling every page to
short-side-720 (inferencing/adaptive_scaling.py:96-107), trading small-text
recall for bounded compute. This TPU-native extension (BASELINE.json
config 3) processes large scans (e.g. 2048px) at higher resolution instead:

  * the page is cut into overlapping fixed-size tiles (static shapes — one
    XLA compile regardless of page size),
  * all tiles run through ``forward_rough`` as ONE batch (MXU-friendly),
  * the per-tile mask/height maps are stitched back on-device, each tile
    owning its interior (overlap margins cropped except at page borders),
    which hides convolutional edge effects up to the margin radius.

Everything from tile extraction through stitching runs inside one jitted
program; only the final stitched maps cross to host.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def compute_tile_origins(length: int, tile: int, stride: int) -> List[int]:
    """1-D tile origins covering [0, length): stride-spaced, last tile
    end-aligned. Requires length >= tile."""
    assert length >= tile and stride >= 1
    origins = list(range(0, length - tile + 1, stride))
    if origins[-1] + tile < length:
        origins.append(length - tile)
    return origins


def _ownership(
    origins: Sequence[int], tile: int, margin: int, length: int
) -> List[Tuple[int, int]]:
    """Per-tile (start, stop) of the region each tile owns in the stitched
    output: crop `margin` on interior edges, keep page borders. Later tiles
    overwrite earlier ones outside their ownership, so we return exact
    half-open intervals and write only those."""
    n = len(origins)
    spans = []
    for i, o in enumerate(origins):
        start = 0 if i == 0 else o + margin
        stop = length if i == n - 1 else min(o + tile - margin, length)
        # Guarantee continuity with the previous span.
        if i > 0:
            prev_stop = spans[-1][1]
            start = min(start, prev_stop)
        spans.append((start, stop))
    # Make spans non-overlapping and covering.
    fixed = []
    for i, (start, stop) in enumerate(spans):
        if i > 0:
            start = fixed[-1][1]
        fixed.append((start, max(start, stop)))
    assert fixed[0][0] == 0 and fixed[-1][1] == length
    return fixed


def tiled_rough_forward(
    forward_rough_batch,
    image: jax.Array,  # (H, W, 3), H/W multiples of the feature stride
    tile: int,
    overlap: int,
    fdf: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run ``forward_rough`` tile-wise over a large page and stitch.

    ``forward_rough_batch(x: (N, tile, tile, 3)) -> (mask_logits, height)``
    each (N, tile/fdf, tile/fdf, 1). Returns stitched (H/fdf, W/fdf) maps.
    All shapes static; jit-traceable.
    """
    h, w = image.shape[:2]
    assert tile % fdf == 0 and overlap % (2 * fdf) == 0
    stride = tile - overlap
    ys = compute_tile_origins(h, tile, stride)
    xs = compute_tile_origins(w, tile, stride)

    tiles = jnp.stack(
        [
            jax.lax.dynamic_slice(image, (oy, ox, 0), (tile, tile, 3))
            for oy in ys
            for ox in xs
        ]
    )
    mask_logits, height = forward_rough_batch(tiles)

    ft, margin = tile // fdf, overlap // (2 * fdf)
    fh, fw = h // fdf, w // fdf
    own_y = _ownership([o // fdf for o in ys], ft, margin, fh)
    own_x = _ownership([o // fdf for o in xs], ft, margin, fw)

    out_mask = jnp.zeros((fh, fw), mask_logits.dtype)
    out_height = jnp.zeros((fh, fw), height.dtype)
    idx = 0
    for iy, oy in enumerate([o // fdf for o in ys]):
        sy0, sy1 = own_y[iy]
        for ix, ox in enumerate([o // fdf for o in xs]):
            sx0, sx1 = own_x[ix]
            m = mask_logits[idx, sy0 - oy : sy1 - oy, sx0 - ox : sx1 - ox, 0]
            hgt = height[idx, sy0 - oy : sy1 - oy, sx0 - ox : sx1 - ox, 0]
            out_mask = jax.lax.dynamic_update_slice(out_mask, m, (sy0, sx0))
            out_height = jax.lax.dynamic_update_slice(out_height, hgt, (sy0, sx0))
            idx += 1
    return out_mask, out_height
