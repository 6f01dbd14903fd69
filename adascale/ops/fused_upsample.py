"""Exact phase decomposition of nearest-x2-upsample -> conv3x3.

The FPN head (reference fpn.py:193-208) nearest-upsamples the neck output
x2 and then runs a 3x3 conv — the single most expensive op in the model at
large page sizes (the conv runs at 4x the pixels of anything else and the
upsampled activation tensor dominates HBM traffic).

For nearest x2 (out[p] = src[p // 2], torch 'nearest' convention) the
composition is algebraically a *sub-pixel* conv: output pixel (2i+a, 2j+b)
sees at most 2x2 distinct source pixels, with phase-specific kernels
obtained by collapsing the 3x3 taps that land on the same source pixel:

    rows, a=0: taps at source rows {i-1, i} with weights {W[0], W[1]+W[2]}
    rows, a=1: taps at source rows {i, i+1} with weights {W[0]+W[1], W[2]}
    (columns identically with b)

so each of the 4 phases is a 2x2 conv at LOW resolution: 16/36 of the
naive FLOPs, and no upsampled intermediate is ever materialized. Exact to
float associativity (parity-tested against the naive path).

``phase_conv3x3_after_nearest2x`` returns the 4 phase outputs (so callers
can keep running elementwise ops per-phase at low res);
``interleave_phases2x`` assembles the full-resolution tensor at the end.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _collapse(kernel: jax.Array, axis: int, parity: int) -> jax.Array:
    """Collapse 3 taps along `axis` (0=rows, 1=cols) of an HWIO 3x3 kernel
    into the 2 taps a given output parity actually touches."""
    k0, k1, k2 = jnp.split(kernel, 3, axis=axis)
    if parity == 0:
        return jnp.concatenate([k0, k1 + k2], axis=axis)
    return jnp.concatenate([k0 + k1, k2], axis=axis)


def phase_conv3x3_after_nearest2x(
    x: jax.Array,  # (B, H, W, Ci)
    kernel: jax.Array,  # (3, 3, Ci, Co) HWIO
    bias: jax.Array,  # (Co,)
) -> List[jax.Array]:
    """conv3x3(nearest_x2(x)) computed as 4 low-res phase convs.

    Returns [y00, y01, y10, y11], each (B, H, W, Co), where phase (a, b)
    holds the output pixels (2i+a, 2j+b).
    """
    b_, h, w, _ = x.shape
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phases = []
    for a in (0, 1):
        ka = _collapse(kernel, 0, a)
        for bb in (0, 1):
            kab = _collapse(ka, 1, bb)  # (2, 2, Ci, Co)
            y = jax.lax.conv_general_dilated(
                xpad,
                kab.astype(x.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # VALID on (H+2) gives H+1 positions; parity a starts at
            # padded row a (covering source rows {a-1+i, a+i}).
            y = y[:, a : a + h, bb : bb + w, :]
            phases.append(y + bias.astype(y.dtype))
    return phases


def interleave_phases2x(phases: Sequence[jax.Array]) -> jax.Array:
    """[y00, y01, y10, y11] each (B, H, W, C) -> (B, 2H, 2W, C)."""
    y00, y01, y10, y11 = phases
    b, h, w, c = y00.shape
    rows0 = jnp.stack([y00, y01], axis=3)  # (B, H, W, 2, C)
    rows1 = jnp.stack([y10, y11], axis=3)
    full = jnp.stack([rows0, rows1], axis=2)  # (B, H, 2, W, 2, C)
    return full.reshape(b, 2 * h, 2 * w, c)
