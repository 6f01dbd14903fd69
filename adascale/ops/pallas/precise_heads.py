"""Fused quad-head kernel for the precise pass.

Same bottleneck shape as the rough heads (ops/pallas/fpn_heads.py): the
precise pass runs FOUR FpnHead chains (prob 1ch, up-left offset 2ch,
corner angle 4ch, corner distance 4ch — reference
model/adaptive_scaling.py:104-141) over one shared neck output, each
nearest-x2-upsampling and smoothing to ``inner=(384+out)//2`` channels.
This kernel packs all four smoothers side by side on the feature dim
(192+193+194+194 = 773 -> 896 lanes, 14% pad vs 33% for any head alone),
runs the 4 phase x 4 tap MXU matmuls once for all heads, does per-segment
LayerNorm + exact GELU, and projects to the 11 packed output channels
with one (896, 128) matmul.

Output leaves the kernel as 4 low-res phase maps (B, 4, H, W, 128) —
lane-aligned, no in-kernel transposes — and the x2 interleave + per-head
channel split happen in XLA on the tiny 11-channel result.

``forward_precise_from_features_fused`` is the drop-in twin of
AdaptiveScaling.forward_precise_from_features (parity-tested).
"""
from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convnext_block import _gelu_exact
from .fpn_heads import _phase_tap_weights


def _kernel(
    xt,  # (1, 1, Wp + 2, Cp)
    xc,  # (1, TH, Wp + 2, Cp)
    xb,  # (1, 1, Wp + 2, Cp)
    wk,  # (4 phases, 4 taps, Cp, Fp) packed smoothing weights
    sb,  # (1, Fp) f32 packed smoothing bias
    ln_g,  # (1, Fp) f32
    ln_b,  # (1, Fp) f32
    w2,  # (Fp, Mp) compute dtype — packed projections (Mp = 128)
    b2,  # (1, Mp) f32
    out_ref,  # (1, 4, TH, Wp, Mp)
    *,
    seg_bounds: Tuple[int, ...],  # cumulative segment offsets, len = heads+1
):
    th, wp2, cp = xc.shape[1], xc.shape[2], xc.shape[3]
    wp = wp2 - 2
    hi = pl.program_id(1)
    nh = pl.num_programs(1)
    fp = wk.shape[3]

    top = jnp.where(hi > 0, xt[0], 0.0)
    bot = jnp.where(hi < nh - 1, xb[0], 0.0)
    xv = jnp.concatenate([top, xc[0], bot], axis=0)
    sbv, gv, bv = sb[:], ln_g[:], ln_b[:]
    w2v = w2[:]

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, fp), 1)
    segs = [
        ((ch >= lo) & (ch < hi_)).astype(jnp.float32)
        for lo, hi_ in zip(seg_bounds[:-1], seg_bounds[1:])
    ]
    inv = [1.0 / (hi_ - lo) for lo, hi_ in zip(seg_bounds[:-1], seg_bounds[1:])]

    for a in (0, 1):
        for b in (0, 1):
            p = a * 2 + b
            acc = jnp.zeros((th * wp, fp), jnp.float32) + sbv
            for dy in (0, 1):
                for dx in (0, 1):
                    src = xv[a + dy : a + dy + th, b + dx : b + dx + wp, :]
                    acc = acc + jnp.dot(
                        src.reshape(th * wp, cp),
                        wk[p, dy * 2 + dx],
                        preferred_element_type=jnp.float32,
                    )
            # Per-segment LayerNorm (each head's own inner width),
            # composed lane-wise: every lane carries its own segment's
            # mean/var so one rsqrt normalizes all heads at once.
            mean_l = jnp.zeros((th * wp, fp), jnp.float32)
            for s, iv in zip(segs, inv):
                mean_l = mean_l + jnp.sum(acc * s, axis=-1, keepdims=True) * iv * s
            cen = (acc - mean_l) * sum(segs)
            var_l = jnp.zeros((th * wp, fp), jnp.float32)
            for s, iv in zip(segs, inv):
                var_l = var_l + jnp.sum(cen * cen * s, axis=-1, keepdims=True) * iv * s
            g = _gelu_exact(cen * jax.lax.rsqrt(var_l + 1e-6) * gv + bv)
            y = (
                jnp.dot(g.astype(w2v.dtype), w2v, preferred_element_type=jnp.float32)
                + b2[:]
            )
            out_ref[0, p] = y.reshape(th, wp, out_ref.shape[4]).astype(
                out_ref.dtype
            )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("tile_h", "interpret", "seg_bounds")
)
def _fused_heads_phases(
    x: jax.Array,  # (B, H, W, C) neck output
    wk: jax.Array,  # (4, 4, C, Fsum) packed per-phase tap weights
    sb: jax.Array,  # (Fsum,)
    ln_g: jax.Array,
    ln_b: jax.Array,
    w2: jax.Array,  # (Fsum, M) packed projection
    b2: jax.Array,  # (M,)
    seg_bounds: Tuple[int, ...],
    *,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns the 4 phase maps (B, 4, H, W, Mp) f32 (Mp = M padded to a
    lane); phase p = (a, b) holds output pixels (2i+a, 2j+b)."""
    b, h, w, c = x.shape
    fsum, m = w2.shape
    cp = _round_up(c, 128)
    fp = _round_up(fsum, 128)
    mp = _round_up(m, 128)
    cdt = x.dtype
    f32 = jnp.float32

    wp = _round_up(w, 8)
    hp = pl.cdiv(h, tile_h) * tile_h
    xpad = jnp.pad(x, ((0, 0), (0, hp - h), (1, 1 + wp - w), (0, cp - c)))
    wkp = jnp.pad(wk, ((0, 0), (0, 0), (0, cp - c), (0, fp - fsum))).astype(cdt)
    sbp = jnp.pad(sb.reshape(1, -1), ((0, 0), (0, fp - fsum))).astype(f32)
    gp = jnp.pad(ln_g.reshape(1, -1), ((0, 0), (0, fp - fsum))).astype(f32)
    bp = jnp.pad(ln_b.reshape(1, -1), ((0, 0), (0, fp - fsum))).astype(f32)
    w2p = jnp.pad(w2, ((0, fp - fsum), (0, mp - m))).astype(cdt)
    b2p = jnp.pad(b2.reshape(1, -1), ((0, 0), (0, mp - m))).astype(f32)

    nh = hp // tile_h
    wp2 = wp + 2
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_kernel, seg_bounds=tuple(seg_bounds)),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(
                (1, 1, wp2, cp),
                lambda bi, hi: (bi, jnp.maximum(hi * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, wp2, cp),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wp2, cp),
                lambda bi, hi: (bi, jnp.minimum((hi + 1) * tile_h, hp - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, tile_h, wp, mp),
            lambda bi, hi: (bi, 0, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, hp, wp, mp), f32),
        interpret=interpret,
    )(xpad, xpad, xpad, wkp, sbp, gp, bp, w2p, b2p)
    return out[:, :, :h, :w, :]


def _interleave(phases: jax.Array, m0: int, m1: int) -> jax.Array:
    """(B, 4, H, W, Mp) -> (B, 2H, 2W, m1-m0): x2 interleave + channel cut."""
    b, _, h, w, _ = phases.shape
    sl = phases[..., m0:m1]
    rows0 = jnp.stack([sl[:, 0], sl[:, 1]], axis=3)  # (B, H, W, 2, k)
    rows1 = jnp.stack([sl[:, 2], sl[:, 3]], axis=3)
    fullr = jnp.stack([rows0, rows1], axis=2)  # (B, H, 2, W, 2, k)
    return fullr.reshape(b, 2 * h, 2 * w, m1 - m0)


def _pack_heads(head_params: Sequence[Any]):
    """Pack N FpnHead param trees (step1 conv/ln + step2 dense) into the
    kernel operands. Returns (wk, sb, ln_g, ln_b, w2, b2, seg_bounds,
    out_sizes)."""
    wks, sbs, gs, bs = [], [], [], []
    w2_blocks, b2s, bounds, outs = [], [], [0], []
    for hp in head_params:
        s1 = hp["step1"]
        k = s1["conv"]["kernel"]
        wks.append(_phase_tap_weights(k).reshape(4, 4, k.shape[2], k.shape[3]))
        sbs.append(s1["conv"]["bias"])
        gs.append(s1["ln"]["scale"])
        bs.append(s1["ln"]["bias"])
        w2_blocks.append(hp["step2"]["kernel"])
        b2s.append(hp["step2"]["bias"])
        bounds.append(bounds[-1] + k.shape[3])
        outs.append(hp["step2"]["kernel"].shape[1])
    wk = jnp.concatenate(wks, axis=-1)
    sb = jnp.concatenate(sbs)
    ln_g = jnp.concatenate(gs)
    ln_b = jnp.concatenate(bs)
    m = sum(outs)
    fsum = bounds[-1]
    w2 = jnp.zeros((fsum, m), jnp.float32)
    mo = 0
    for blk, lo, hi in zip(w2_blocks, bounds[:-1], bounds[1:]):
        w2 = w2.at[lo:hi, mo : mo + blk.shape[1]].set(blk.astype(jnp.float32))
        mo += blk.shape[1]
    b2 = jnp.concatenate(b2s)
    return wk, sb, ln_g, ln_b, w2, b2, tuple(bounds), outs


def forward_precise_from_features_fused(
    model: Any,
    params: Any,
    features,
    *,
    fuse_neck: bool = True,
    tile_h: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Twin of AdaptiveScaling.forward_precise_from_features
    (models/adaptive_scaling.py:193-204) with all four heads fused into
    one Pallas pass (and the FPN neck's level-0 chain fused too); the
    model's f32 softplus applies to the corner distances outside, exactly
    as the Flax path does."""
    neck_type = getattr(
        model.config.neck_head_type, "value", model.config.neck_head_type
    )
    if fuse_neck and str(neck_type) == "fpn":
        from .fpn_neck import fpn_neck_forward_fused

        neck = fpn_neck_forward_fused(
            params["precise_neck"], list(features), dtype=model.dtype,
            interpret=interpret,
        )
    else:
        neck = model.apply(
            {"params": params}, list(features),
            method=lambda mdl, fs: mdl.precise_neck(fs),
        )
    names = [
        "precise_char_prob_head",
        "precise_char_up_left_corner_offset_head",
        "precise_char_corner_angle_head",
        "precise_char_corner_distance_head",
    ]
    wk, sb, g, bb, w2, b2, bounds, outs = _pack_heads([params[n] for n in names])
    phases = _fused_heads_phases(
        neck, wk, sb, g, bb, w2, b2, bounds, tile_h=tile_h, interpret=interpret
    )
    mos = [0]
    for o in outs:
        mos.append(mos[-1] + o)
    prob = _interleave(phases, mos[0], mos[1])
    offset = _interleave(phases, mos[1], mos[2])
    angle = _interleave(phases, mos[2], mos[3])
    distance = jax.nn.softplus(_interleave(phases, mos[3], mos[4]))
    return prob, offset, angle, distance
