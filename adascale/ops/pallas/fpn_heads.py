"""Fused dual FPN rough-head kernel (nearest-x2 -> conv3x3 -> LN -> GELU
-> 1x1, both heads in one pass).

Round-5 serving profile (tools/serve_profile.py, B16@1280 bf16, v5e):
the rough forward splits 137.8 ms backbone / 60.2 ms neck / **134.0 ms
heads** — the two heads are the single largest component, at ~3.4x their
~39 ms MXU floor. The reference head (fpn.py:149-208 — nearest-x2
upsample, 3x3 smoothing to ``inner=(384+1)//2=192`` channels, LN, GELU,
1x1 projection) is already phase-decomposed in XLA
(adascale/ops/fused_upsample.py); this kernel goes further:

  * **both heads in one matmul**: the two heads' 192-channel smoothing
    weights are packed side by side into one (C, 384) operand — 384 is a
    lane multiple, so the MXU runs at zero channel-padding waste (a lone
    192-channel head would pad to 256 = 33% waste);
  * per phase (a, b) of the nearest-x2 grid, the collapsed 2x2 conv runs
    as 4 shifted (TH*W, C) x (C, 384) MXU matmuls with f32 accumulation
    (phase decomposition identical to fused_upsample.py — exact math);
  * LayerNorm is computed per head over its 192-channel segment
    (masked segment mean/var, torch eps 1e-6 semantics), then exact-erf
    GELU, then each head's 1x1 projection as a lane reduction;
  * the kernel writes the 4 phase maps as separate (B, H, W) outputs and
    XLA interleaves them to (2H, 2W) outside — the (B, 2H, 2W, 192)
    smoothed intermediate that XLA materializes per head (4x 400 MB at
    B16@1280) never exists, while the 1-channel f32 interleave XLA pays
    instead is ~26 MB/head. (The first cut interleaved in VMEM via
    lane-dim reshapes; Mosaic's layout inference rejects that shape cast
    — `vector<8x320x2> -> vector<8x1x640>` — on hardware, so the
    interleave lives where the compiler is happy to do it.)

The vertical 2x2 halo is one row, staged as thin 1-row neighbor blocks.
Outputs are the two raw head maps (pre-softplus), f32, shaped
(B, 2H, 2W, 1) to match FpnHead exactly (parity-tested in
tests/test_pallas.py against the Flax head).
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convnext_block import _gelu_exact


def _collapse(kernel: jax.Array, axis: int, parity: int) -> jax.Array:
    """Collapse 3 taps along ``axis`` of an HWIO 3x3 kernel into the 2 taps
    a given nearest-x2 output parity touches (fused_upsample.py math)."""
    k0, k1, k2 = jnp.split(kernel, 3, axis=axis)
    if parity == 0:
        return jnp.concatenate([k0, k1 + k2], axis=axis)
    return jnp.concatenate([k0 + k1, k2], axis=axis)


def _phase_tap_weights(kernel: jax.Array) -> jax.Array:
    """(3,3,C,F) HWIO -> (4 phases, 2, 2, C, F): phase (a,b) holds its
    collapsed 2x2 kernel; tap (dy,dx) multiplies source pixel
    (i+a-1+dy, j+b-1+dx) for output (2i+a, 2j+b)."""
    phases = []
    for a in (0, 1):
        ka = _collapse(kernel, 0, a)
        for b in (0, 1):
            phases.append(_collapse(ka, 1, b))  # (2,2,C,F)
    return jnp.stack(phases, axis=0)


def _kernel(
    xt,  # (1, 1, Wp + 2, C) row above (clamped at top)
    xc,  # (1, TH, Wp + 2, C) current row band
    xb,  # (1, 1, Wp + 2, C) row below (clamped at bottom)
    wk,  # (4 phases, 4 taps, C, 2F) packed smoothing weights, compute dtype
    sb,  # (1, 2F) f32 packed smoothing bias
    ln_g,  # (1, 2F) f32 packed LN scales
    ln_b,  # (1, 2F) f32 packed LN biases
    w2,  # (2, 2F) f32 per-head projection vectors (zero outside own segment)
    b2,  # (1, 2F) f32; [0, 0] / [0, F] hold the two projection biases
    *out_refs,  # 8 x (1, TH, Wp) f32 — [head0 phases 00,01,10,11, head1 ...]
    f_real: int,
):
    th, wp2, c = xc.shape[1], xc.shape[2], xc.shape[3]
    wp = wp2 - 2
    hi = pl.program_id(1)
    nh = pl.num_programs(1)
    twof = wk.shape[3]

    top = jnp.where(hi > 0, xt[0], 0.0)
    bot = jnp.where(hi < nh - 1, xb[0], 0.0)
    xv = jnp.concatenate([top, xc[0], bot], axis=0)  # (TH+2, Wp+2, C)
    sbv, gv, bv = sb[:], ln_g[:], ln_b[:]  # (1, 2F) loads

    # Per-head segment masks over the packed 2F lane dim.
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, twof), 1)
    seg0 = (ch < f_real).astype(jnp.float32)
    seg1 = ((ch >= f_real) & (ch < 2 * f_real)).astype(jnp.float32)
    inv_f = 1.0 / f_real

    for a in (0, 1):
        for b in (0, 1):
            p = a * 2 + b
            acc = jnp.zeros((th * wp, twof), jnp.float32) + sbv
            for dy in (0, 1):
                for dx in (0, 1):
                    src = xv[a + dy : a + dy + th, b + dx : b + dx + wp, :]
                    acc = acc + jnp.dot(
                        src.reshape(th * wp, c),
                        wk[p, dy * 2 + dx],
                        preferred_element_type=jnp.float32,
                    )
            # Segment LayerNorm: per-row mean/var over each head's own
            # F real channels (pad lanes hold zeros via zero ln_g).
            s0 = jnp.sum(acc * seg0, axis=-1, keepdims=True) * inv_f
            s1 = jnp.sum(acc * seg1, axis=-1, keepdims=True) * inv_f
            mean = s0 * seg0 + s1 * seg1
            cen = (acc - mean) * (seg0 + seg1)
            v0 = jnp.sum(cen * cen * seg0, axis=-1, keepdims=True) * inv_f
            v1 = jnp.sum(cen * cen * seg1, axis=-1, keepdims=True) * inv_f
            inv_std = jax.lax.rsqrt(v0 * seg0 + v1 * seg1 + 1e-6)
            g = _gelu_exact(cen * inv_std * gv + bv)
            # Per-head 1x1 projection: lane reduction against w2 (+ bias).
            y0 = jnp.sum(g * w2[0:1, :], axis=-1) + b2[0, 0]
            y1 = jnp.sum(g * w2[1:2, :], axis=-1) + b2[0, f_real]
            out_refs[p][0] = y0.reshape(th, wp)
            out_refs[4 + p][0] = y1.reshape(th, wp)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_rough_heads(
    x: jax.Array,  # (B, H, W, C) neck output
    k0: jax.Array,  # (3, 3, C, F) mask-head smoothing kernel (HWIO)
    sb0: jax.Array,  # (F,)
    g0: jax.Array,  # (F,) LN scale
    be0: jax.Array,  # (F,) LN bias
    p0: jax.Array,  # (F, 1) projection kernel
    pb0: jax.Array,  # (1,)  projection bias
    k1: jax.Array,  # same, height head
    sb1: jax.Array,
    g1: jax.Array,
    be1: jax.Array,
    p1: jax.Array,
    pb1: jax.Array,
    *,
    tile_h: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Both rough heads over a shared neck output, fused: returns
    (mask_logits, height_raw), each (B, 2H, 2W, 1) f32 — identical math to
    FpnHead(upsampling_factor=2) per head (reference fpn.py:149-208)."""
    b, h, w, c = x.shape
    f = k0.shape[-1]
    # The input channel dim is purely a contraction dim: zero-pad it to a
    # lane multiple (the flagship neck's 384 already is; micro/test models
    # are not).
    cp = _round_up(c, 128)
    twof = _round_up(2 * f, 128)
    cdt = x.dtype
    f32 = jnp.float32

    # Pack the two heads side by side on the output-feature dim.
    def packed(a0, a1, fill=0.0):
        out = jnp.full(a0.shape[:-1] + (twof,), fill, f32)
        out = out.at[..., :f].set(a0.astype(f32))
        return out.at[..., f : 2 * f].set(a1.astype(f32))

    wk = jnp.concatenate(
        [_phase_tap_weights(k0), _phase_tap_weights(k1)], axis=-1
    )  # (4, 2, 2, C, 2F real)
    wk = wk.reshape(4, 4, c, 2 * f)
    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, cp - c), (0, twof - 2 * f)))
    sb = packed(sb0, sb1)[None, :]
    ln_g = packed(g0, g1)[None, :]
    ln_b = packed(be0, be1)[None, :]
    w2 = jnp.zeros((2, twof), f32)
    w2 = w2.at[0, :f].set(p0[:, 0].astype(f32))
    w2 = w2.at[1, f : 2 * f].set(p1[:, 0].astype(f32))
    b2 = jnp.zeros((1, twof), f32)
    b2 = b2.at[0, 0].set(pb0[0].astype(f32))
    b2 = b2.at[0, f].set(pb1[0].astype(f32))

    # Pad W so the interleaved lane dim (2*Wp) is a lane multiple, H to a
    # tile multiple; +1 halo column each side (zero = conv zero padding).
    wp = _round_up(w, 64)
    hp = pl.cdiv(h, tile_h) * tile_h
    xpad = jnp.pad(x, ((0, 0), (0, hp - h), (1, 1 + wp - w), (0, cp - c)))

    nh = hp // tile_h
    wp2 = wp + 2
    out_shape = jax.ShapeDtypeStruct((b, hp, wp), f32)
    out_spec = pl.BlockSpec(
        (1, tile_h, wp), lambda bi, hi: (bi, hi, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    phases = pl.pallas_call(
        functools.partial(_kernel, f_real=f),
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
        out_specs=(out_spec,) * 8,
        out_shape=(out_shape,) * 8,
        interpret=interpret,
    )(
        xpad, xpad, xpad,
        wk.astype(cdt), sb, ln_g, ln_b, w2, b2,
    )

    # XLA-side phase interleave: out[:, 2i+a, 2j+b] = y_ab[:, i, j]. These
    # are 1-channel f32 maps (~26 MB/head at B16@1280) — cheap where the
    # same reshape inside the kernel is an unsupported Mosaic shape cast.
    def interleave(y00, y01, y10, y11):
        r0 = jnp.stack([y00, y01], axis=-1).reshape(b, hp, 2 * wp)
        r1 = jnp.stack([y10, y11], axis=-1).reshape(b, hp, 2 * wp)
        return jnp.stack([r0, r1], axis=2).reshape(b, 2 * hp, 2 * wp)

    out0 = interleave(*phases[:4])
    out1 = interleave(*phases[4:])
    return (
        out0[:, : 2 * h, : 2 * w, None],
        out1[:, : 2 * h, : 2 * w, None],
    )


def _head_leaves(hp: Any):
    s1 = hp["step1"]
    return (
        s1["conv"]["kernel"], s1["conv"]["bias"],
        s1["ln"]["scale"], s1["ln"]["bias"],
        hp["step2"]["kernel"], hp["step2"]["bias"],
    )


def forward_rough_from_features_fused(
    model: Any,
    params: Any,
    features,
    *,
    fuse_neck: bool = True,
    tile_h: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Twin of AdaptiveScaling.forward_rough_from_features with the two
    heads fused into one Pallas pass (and, for the FPN neck, the level-0
    neck chain fused too — ops/pallas/fpn_neck.py), then the model's f32
    softplus on the height map (models/adaptive_scaling.py:179-191)."""
    neck_type = getattr(model.config.neck_head_type, "value", model.config.neck_head_type)
    if fuse_neck and str(neck_type) == "fpn":
        from .fpn_neck import fpn_neck_forward_fused

        neck = fpn_neck_forward_fused(
            params["rough_neck"], list(features), dtype=model.dtype,
            interpret=interpret,
        )
    else:
        neck = model.apply(
            {"params": params}, list(features), method=lambda mdl, fs: mdl.rough_neck(fs)
        )
    mask_logits, height_raw = fused_rough_heads(
        neck,
        *_head_leaves(params["rough_char_mask_head"]),
        *_head_leaves(params["rough_char_height_head"]),
        tile_h=tile_h,
        interpret=interpret,
    )
    return mask_logits, jax.nn.softplus(height_raw)
