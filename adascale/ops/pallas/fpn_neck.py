"""Fused FPN-neck level-0 chain as a Pallas TPU kernel.

Round-5 serving profile: the FPN neck costs 60.2 ms at B16@1280 bf16
against a ~15 ms traffic+matmul floor, and nearly all of its work happens
at level-0 resolution (320x320 for 1280px pages — 4x the pixels of every
other level combined). The level-0 chain (reference fpn.py:53-133)

    a  = GELU(LN(f0 @ W1 + b1))          # step1 lateral, 96 -> 384
    t  = a + nearest_up2x(topdown_l1)    # top-down fuse
    z0 = GELU(LN(conv3x3(t) + b2))       # step2, 384 -> 96

materializes four ~1.3 GB tensors in HBM under XLA. This kernel runs the
whole chain in one pass over row bands: step1 is recomputed for the one
halo row the 3x3 needs (cheaper than staging `t` twice), the top-down
addend arrives as a normal banded input, and only the final 96-channel
map is written.

Border semantics: conv3x3's zero padding applies to `t`, not to the
inputs — step1(0)+b1 is NOT zero — so halo positions outside the real
page are zeroed by global row/col masks before the 3x3.

Levels 1-3 (<= 1/4 the pixels at 2x smaller resolution each) stay XLA;
``fpn_neck_forward_fused`` composes both into the exact FpnNeck output
(parity-tested against the Flax module in tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convnext_block import _gelu_exact


def _kernel(
    xt,  # (1, 1, Wp + 2, C0) f0 row above (clamped)
    xc,  # (1, TH, Wp + 2, C0) f0 current band
    xb,  # (1, 1, Wp + 2, C0) f0 row below (clamped)
    ut,  # (1, 1, Wp + 2, Cm) top-down addend, same banding
    uc,  # (1, TH, Wp + 2, Cm)
    ub,  # (1, 1, Wp + 2, Cm)
    w1,  # (C0, Cm) compute dtype — step1 lateral
    b1,  # (1, Cm) f32
    g1,  # (1, Cm) f32
    e1,  # (1, Cm) f32
    w2,  # (9, Cm, Cop) compute dtype — step2 3x3 taps, out zero-padded
    b2,  # (1, Cop) f32
    g2,  # (1, Cop) f32
    e2,  # (1, Cop) f32
    out_ref,  # (1, TH, Wp, Cop)
    *,
    h_real: int,
    w_real: int,
    c_out: int,
):
    th, wp2 = xc.shape[1], xc.shape[2]
    wp = wp2 - 2
    cm = uc.shape[3]
    cop = out_ref.shape[3]
    hi = pl.program_id(1)

    xv = jnp.concatenate([xt[0], xc[0], xb[0]], axis=0)  # (TH+2, Wp+2, C0)
    uv = jnp.concatenate([ut[0], uc[0], ub[0]], axis=0)  # (TH+2, Wp+2, Cm)

    # step1 lateral + LN + GELU over the halo-extended band, f32.
    n = (th + 2) * wp2
    h1 = (
        jnp.dot(
            xv.reshape(n, xv.shape[-1]),
            w1[:],
            preferred_element_type=jnp.float32,
        )
        + b1[:]
    )
    inv_cm = 1.0 / cm
    mean = jnp.sum(h1, axis=-1, keepdims=True) * inv_cm
    cen = h1 - mean
    var = jnp.sum(cen * cen, axis=-1, keepdims=True) * inv_cm
    a = _gelu_exact(cen * jax.lax.rsqrt(var + 1e-6) * g1[:] + e1[:])

    # Top-down fuse, then zero every position outside the real page: the
    # 3x3's zero padding applies to t (a+u), and step1 of a zero input is
    # NOT zero (bias + LN), so masking must happen here.
    t = a + uv.reshape(n, cm).astype(jnp.float32)
    grow = (
        jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp2, 1), 0)
        + hi * th
        - 1
    )
    gcol = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp2, 1), 1) - 1
    ok = (
        (grow >= 0) & (grow < h_real) & (gcol >= 0) & (gcol < w_real)
    ).astype(jnp.float32)
    t = (t.reshape(th + 2, wp2, cm) * ok).astype(xc.dtype)

    # step2: 3x3 conv as 9 shifted matmuls, f32 accumulation.
    acc = jnp.zeros((th * wp, cop), jnp.float32) + b2[:]
    for dy in range(3):
        for dx in range(3):
            src = t[dy : dy + th, dx : dx + wp, :]
            acc = acc + jnp.dot(
                src.reshape(th * wp, cm),
                w2[dy * 3 + dx],
                preferred_element_type=jnp.float32,
            )
    # Masked LN over the real c_out channels (output is zero-padded).
    ch_ok = jax.lax.broadcasted_iota(jnp.int32, (1, cop), 1) < c_out
    inv_c = 1.0 / c_out
    mean2 = jnp.sum(jnp.where(ch_ok, acc, 0.0), axis=-1, keepdims=True) * inv_c
    cen2 = jnp.where(ch_ok, acc - mean2, 0.0)
    var2 = jnp.sum(cen2 * cen2, axis=-1, keepdims=True) * inv_c
    z = _gelu_exact(cen2 * jax.lax.rsqrt(var2 + 1e-6) * g2[:] + e2[:])
    out_ref[0] = z.reshape(th, wp, cop).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_neck_l0(
    f0: jax.Array,  # (B, H, W, C0) backbone level-0 feature
    u: jax.Array,  # (B, H, W, Cm) upsampled top-down addend (level-1 sum)
    w1: jax.Array,  # (C0, Cm) step1 Dense kernel
    b1: jax.Array,  # (Cm,)
    g1: jax.Array,  # (Cm,) LN scale
    e1: jax.Array,  # (Cm,) LN bias
    k2: jax.Array,  # (3, 3, Cm, Co) step2 conv kernel (HWIO)
    b2: jax.Array,  # (Co,)
    g2: jax.Array,  # (Co,)
    e2: jax.Array,  # (Co,)
    *,
    tile_h: int = 6,
    interpret: bool = False,
) -> jax.Array:
    """GELU(LN(conv3x3(GELU(LN(f0@W1+b1)) + u))) -> (B, H, W, Co), the
    FpnNeck level-0 output slice (reference fpn.py:53-133)."""
    b, h, w, c0 = f0.shape
    cm, co = w1.shape[1], k2.shape[-1]
    c0p = _round_up(c0, 128)
    cop = _round_up(co, 128)
    cdt = f0.dtype
    f32 = jnp.float32

    tile_h = max(2, tile_h)
    hp = pl.cdiv(h, tile_h) * tile_h
    # W is a sublane dim everywhere here (the out lane dim is cop), so it
    # only needs the f32 sublane granularity, not a lane multiple.
    wp = _round_up(w, 8)
    xpad = jnp.pad(f0, ((0, 0), (0, hp - h), (1, 1 + wp - w), (0, c0p - c0)))
    upad = jnp.pad(u, ((0, 0), (0, hp - h), (1, 1 + wp - w), (0, 0)))

    def v2(p):
        return p.reshape(1, -1).astype(f32)

    w1p = jnp.pad(w1, ((0, c0p - c0), (0, 0))).astype(cdt)
    w2p = jnp.pad(k2, ((0, 0), (0, 0), (0, 0), (0, cop - co)))
    w2p = w2p.reshape(9, cm, cop).astype(cdt)
    b2p = jnp.pad(b2.reshape(1, -1), ((0, 0), (0, cop - co))).astype(f32)
    g2p = jnp.pad(g2.reshape(1, -1), ((0, 0), (0, cop - co))).astype(f32)
    e2p = jnp.pad(e2.reshape(1, -1), ((0, 0), (0, cop - co))).astype(f32)

    nh = hp // tile_h
    wp2 = wp + 2

    def thin(cc):
        return lambda im: pl.BlockSpec(
            (1, 1, wp2, cc), im, memory_space=pltpu.VMEM
        )

    def band(cc):
        return lambda im: pl.BlockSpec(
            (1, tile_h, wp2, cc), im, memory_space=pltpu.VMEM
        )

    top_im = lambda bi, hi: (bi, jnp.maximum(hi * tile_h - 1, 0), 0, 0)  # noqa: E731
    cur_im = lambda bi, hi: (bi, hi, 0, 0)  # noqa: E731
    bot_im = lambda bi, hi: (bi, jnp.minimum((hi + 1) * tile_h, hp - 1), 0, 0)  # noqa: E731
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_kernel, h_real=h, w_real=w, c_out=co),
        grid=(b, nh),
        in_specs=[
            thin(c0p)(top_im), band(c0p)(cur_im), thin(c0p)(bot_im),
            thin(cm)(top_im), band(cm)(cur_im), thin(cm)(bot_im),
            full(), full(), full(), full(),
            full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wp, cop), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cop), cdt),
        interpret=interpret,
    )(
        xpad, xpad, xpad, upad, upad, upad,
        w1p, v2(b1), v2(g1), v2(e1),
        w2p, b2p, g2p, e2p,
    )
    return out[:, :h, :w, :co]


def _c1x1(params: Any, x: jax.Array, dtype) -> jax.Array:
    """XLA twin of Conv1x1Block (models/fpn.py:30-43)."""
    y = x.astype(dtype) @ params["conv"]["kernel"].astype(dtype)
    y = y + params["conv"]["bias"].astype(dtype)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    yn = (yf - mean) * jax.lax.rsqrt(var + 1e-6)
    yn = yn * params["ln"]["scale"].astype(jnp.float32) + params["ln"][
        "bias"
    ].astype(jnp.float32)
    return jax.nn.gelu(yn.astype(dtype), approximate=False)


def _c3x3(params: Any, x: jax.Array, dtype) -> jax.Array:
    """XLA twin of ConvKxKBlock(kernel=3) (models/fpn.py:46-65)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        params["conv"]["kernel"].astype(dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv"]["bias"].astype(dtype)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    yn = (yf - mean) * jax.lax.rsqrt(var + 1e-6)
    yn = yn * params["ln"]["scale"].astype(jnp.float32) + params["ln"][
        "bias"
    ].astype(jnp.float32)
    return jax.nn.gelu(yn.astype(dtype), approximate=False)


def fpn_neck_forward_fused(
    neck_params: Any,
    features: List[jax.Array],
    dtype=jnp.bfloat16,
    *,
    tile_h: int = 6,
    interpret: bool = False,
) -> jax.Array:
    """FpnNeck.__call__ twin (models/fpn.py:68-102) with the level-0 chain
    fused into one Pallas kernel; levels 1..n stay XLA (<=1/4 the pixels).
    """
    from ..resize import resize_nearest

    num = len(features)
    # step1 laterals for levels 1..n-1 and the top-down chain among them.
    outs = [None] + [
        _c1x1(neck_params[f"step1_{i}"], features[i], dtype)
        for i in range(1, num)
    ]
    for i in range(num - 1, 1, -1):
        prev = outs[i - 1]
        outs[i - 1] = prev + resize_nearest(outs[i], (prev.shape[1], prev.shape[2]))
    f0 = features[0]
    u = resize_nearest(outs[1], (f0.shape[1], f0.shape[2]))

    s1 = neck_params["step1_0"]
    s2 = neck_params["step2_0"]
    z0 = fused_neck_l0(
        f0.astype(dtype),
        u.astype(dtype),
        s1["conv"]["kernel"], s1["conv"]["bias"],
        s1["ln"]["scale"], s1["ln"]["bias"],
        s2["conv"]["kernel"], s2["conv"]["bias"],
        s2["ln"]["scale"], s2["ln"]["bias"],
        tile_h=tile_h,
        interpret=interpret,
    )

    shape0 = (f0.shape[1], f0.shape[2])
    zs = [z0] + [
        resize_nearest(
            _c3x3(neck_params[f"step2_{i}"], outs[i], dtype), shape0
        )
        for i in range(1, num)
    ]
    return jnp.concatenate(zs, axis=-1)
