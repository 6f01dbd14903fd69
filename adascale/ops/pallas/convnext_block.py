"""Fused ConvNeXt residual block as a Pallas TPU kernel.

The ConvNeXt block (reference convnext.py:20-59; flax twin
adascale/models/convnext.py:53-81) is the backbone hot loop — ~all of the
model FLOPs (SURVEY.md §3.3). Its chain

    dwconv7x7 -> LayerNorm -> 1x1 (4x expand) -> GELU -> 1x1
    -> * layer_scale -> + residual

is bandwidth-bound between the two matmuls: XLA materializes the dwconv
output, the LN output and the 4C-wide MLP intermediate in HBM. This kernel
keeps one (tile_h, W) row band of the activation resident in VMEM for the
whole chain:

  * grid = (B, H/tile_h); the halo needed by the 7x7 window is assembled
    from three BlockSpec views of the same input (previous / current /
    next row band via clamped index maps) — no manual DMA, so Pallas'
    automatic double-buffered pipeline does the HBM->VMEM staging,
  * page borders get an explicit zero halo (the 7x7's zero padding),
  * the depthwise 7x7 is 49 shifted VPU FMAs in f32,
  * LayerNorm runs in f32 (eps 1e-6, biased variance — torch semantics),
  * the two 1x1 convs are (tile_h*W, C) x (C, 4C) / (4C, C) MXU matmuls
    with f32 accumulation,
  * exact (erf) GELU, layer scale and the residual add stay in-register.

TPU constraints honored here: channels are zero-padded to a lane multiple
(128) so every block is lane-aligned, LayerNorm statistics are computed
over the real C channels only, and erf (no Mosaic lowering) uses an
A&S-7.1.26 approximation (|err|<=1.5e-7, far below the 1e-3 parity bar).

``fused_convnext_block`` is the raw inference kernel (stochastic depth =
identity). ``make_trainable_block`` wraps it in a ``jax.custom_vjp`` whose
backward recomputes the block with a numerically-identical XLA composition
and differentiates that — so training gets the fused forward while autodiff
semantics stay exactly the XLA ones (a rematerialized backward: no
activations saved between forward and backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # 7x7, pad 3
LANE = 128


def _erf(x: jax.Array) -> jax.Array:
    """float32 erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0, y, -y)


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(
    xp,  # (1, TH or HALO, W + 2*HALO, Cp) row band above (clamped at top)
    xc,  # (1, TH, W + 2*HALO, Cp) current row band
    xn,  # (1, TH or HALO, W + 2*HALO, Cp) row band below (clamped at bottom)
    dwk,  # (49, Cp) f32
    dwb,  # (1, Cp) f32
    ln_g,  # (1, Cp) f32
    ln_b,  # (1, Cp) f32
    up_w,  # (Cp, 4C) compute dtype
    up_b,  # (1, 4C) f32
    down_w,  # (4C, Cp) compute dtype
    down_b,  # (1, Cp) f32
    scale,  # (1, Cp) f32
    out_ref,  # (1, TH, W, Cp)
    *,
    c_real: int,
    dw_tap_major: bool,
):
    th, w, cp = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    hi = pl.program_id(1)
    nh = pl.num_programs(1)

    # Assemble the vertically halo-extended band; zero halo at page borders
    # (= the 7x7's zero padding semantics). The neighbor refs are either
    # full tile_h bands (legacy 3-view scheme) or thin HALO-row blocks
    # (halo_thin scheme) — both cases want their last/first HALO rows.
    top = jnp.where(hi > 0, xp[0, xp.shape[1] - HALO :, :, :], 0.0)
    bot = jnp.where(hi < nh - 1, xn[0, :HALO, :, :], 0.0)
    xv = jnp.concatenate([top, xc[0], bot], axis=0)  # (TH+6, W+6, Cp)

    # Depthwise 7x7 (+ conv bias): 49 FMAs, f32 accumulation. Channel-pad
    # region stays exactly 0 (zero inputs x zero weights).
    acc = jnp.zeros((th, w, cp), jnp.float32) + dwb[0][None, None, :]
    if dw_tap_major:
        # Legacy tap-major order: every tap pays a W-shift (sublane
        # rotate) AND an f32 convert — ~3 VPU passes per tap. Kept for
        # A/B timing (tools/kernel_sweep.py).
        for ky in range(7):
            for kx in range(7):
                acc = acc + (
                    xv[ky : ky + th, kx : kx + w, :].astype(jnp.float32)
                    * dwk[ky * 7 + kx][None, None, :]
                )
    else:
        # kx-major order: 7 W-shifts + 7 f32 converts of the full halo
        # band; the inner ky offsets slice only the row (second-minor)
        # axis, which is pure addressing on TPU — so the steady-state
        # cost is ~1 FMA per tap instead of shift+convert+FMA.
        for kx in range(7):
            xs = xv[:, kx : kx + w, :].astype(jnp.float32)  # (TH+6, W, Cp)
            for ky in range(7):
                acc = acc + xs[ky : ky + th] * dwk[ky * 7 + kx][None, None, :]

    # LayerNorm over the REAL channels only (pad channels hold zeros), f32,
    # biased variance, eps 1e-6 — torch semantics.
    ch_ok = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2) < c_real
    inv_c = 1.0 / c_real
    mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
    centered = jnp.where(ch_ok, acc - mean, 0.0)
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) * inv_c
    h = centered * jax.lax.rsqrt(var + 1e-6)
    # ln_g/ln_b are zero-padded, so pad channels of h become exactly 0.
    h = h * ln_g[0][None, None, :] + ln_b[0][None, None, :]

    # MLP: (TH*W, Cp) @ (Cp, 4C) -> GELU(exact) -> @ (4C, Cp), f32 accum.
    # The 4C hidden dim is processed in chunks so the intermediate stays
    # small enough in VMEM to allow larger row tiles.
    h2 = h.reshape(th * w, cp).astype(up_w.dtype)
    hidden = up_w.shape[1]
    n_chunks = 1
    while (
        (th * w * -(-hidden // n_chunks)) * 4 > 4 * 1024 * 1024
        and n_chunks < hidden
    ):
        n_chunks *= 2
    # Ceil-div chunking with a clamped final slice so a non-dividing hidden
    # dim never silently drops trailing channels.
    chunk = -(-hidden // n_chunks)
    y = jnp.zeros((th * w, cp), jnp.float32)
    for start in range(0, hidden, chunk):
        sl = slice(start, min(start + chunk, hidden))
        u = jnp.dot(h2, up_w[:, sl], preferred_element_type=jnp.float32)
        u = _gelu_exact(u + up_b[0:1, sl])
        y = y + jnp.dot(
            u.astype(down_w.dtype), down_w[sl, :], preferred_element_type=jnp.float32
        )
    y = (y + down_b[0][None, :]).reshape(th, w, cp)

    # Layer scale + residual.
    res = xc[0, :, HALO : HALO + w, :].astype(jnp.float32)
    out_ref[0] = (res + y * scale[0][None, None, :]).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Known-good VMEM working set: tile_h=8 at a (W+6)*Cp band of ~41.7k
# elements (1280px stage0). tile_h scales down for wider bands so the
# 3 double-buffered input bands + accumulators stay under the ~16MB VMEM.
_BAND_BUDGET = 8 * 326 * 128


def _auto_tile_h(w: int, cpad: int, requested: int, halo_thin: bool = False) -> int:
    # Requesting more than the default (8 band / 12 thin) scales the budget
    # with it: the caller is explicitly asking for bigger tiles
    # (kernel_sweep probes whether the later, narrower stages have VMEM
    # headroom) and a too-big tile fails loudly at compile time rather than
    # silently.
    if halo_thin:
        # Thin halos replace the two full neighbor bands, so the input
        # VMEM cost per tile drops ~3x — allow correspondingly taller tiles.
        budget = _BAND_BUDGET * 3 * max(1, requested // 12)
        th = max(4, min(requested, budget // max(1, w * cpad)))
        return max(2 * HALO, th // HALO * HALO)
    budget = _BAND_BUDGET * max(1, requested // 8)
    return max(4, min(requested, budget // max(1, w * cpad)))


@functools.partial(
    jax.jit, static_argnames=("tile_h", "interpret", "dw_tap_major", "halo_thin")
)
def fused_convnext_block(
    x: jax.Array,  # (B, H, W, C)
    dw_kernel: jax.Array,  # (7, 7, 1, C) — flax depthwise layout
    dw_bias: jax.Array,  # (C,)
    ln_scale: jax.Array,  # (C,)
    ln_bias: jax.Array,  # (C,)
    up_kernel: jax.Array,  # (C, 4C)
    up_bias: jax.Array,  # (4C,)
    down_kernel: jax.Array,  # (4C, C)
    down_bias: jax.Array,  # (C,)
    block_scale: jax.Array,  # (C,)
    *,
    tile_h: int = 8,
    interpret: bool = False,
    # Default stays the hardware-proven tap-major loop until the kx-major
    # variant is validated by tools/kernel_sweep.py on the real device
    # (interpret-clean kernels can still fail Mosaic compile).
    dw_tap_major: bool = True,
    # halo_thin=True fetches the vertical halo as two HALO-row blocks
    # instead of two full tile_h neighbor bands, cutting input HBM reads
    # from 3x to (tile_h + 2*HALO)/tile_h (requires tile_h % HALO == 0;
    # the wrapper rounds). Default off until validated by kernel_sweep.
    halo_thin: bool = False,
) -> jax.Array:
    """y = x + block_scale * mlp(ln(dwconv7x7(x))) — one fused kernel.

    Matches ConvNeXtBlockLayer (adascale/models/convnext.py:53-81) in
    deterministic mode. Works for any H (zero-padded up to a tile multiple)
    and any C (zero-padded to a lane multiple of 128 internally).

    Contract on ``tile_h``: values > 8 scale the VMEM budget with the
    request (``_auto_tile_h``), so an oversized tile fails loudly at
    Mosaic compile time instead of being silently clamped — callers
    probing large tiles (tools/kernel_sweep.py) must guard with
    try/except; production paths should stay at the default 8.

    Note on H padding: rows H..Hp-1 are zeros, which would make the
    bottom tile's halo see zeros exactly like the true page border — the
    same semantics the 7x7's zero padding gives, so cropping out[:, :H]
    is exact.
    """
    b, h, w, c = x.shape
    cpad = _round_up(c, LANE)
    # In thin mode the result is a HALO multiple: halo blocks are HALO rows
    # tall and addressed in HALO-row units, so hi*tile_h must be one too.
    tile_h = _auto_tile_h(w, cpad, tile_h, halo_thin=halo_thin)
    hp = pl.cdiv(h, tile_h) * tile_h
    dc = cpad - c
    xpad = jnp.pad(x, ((0, 0), (0, hp - h), (HALO, HALO), (0, dc)))

    cdt = x.dtype
    f32 = jnp.float32

    def padc(v, axis):
        if dc == 0:
            return v
        widths = [(0, 0)] * v.ndim
        widths[axis] = (0, dc)
        return jnp.pad(v, widths)

    args = (
        xpad,
        xpad,
        xpad,
        padc(dw_kernel.reshape(49, c).astype(f32), 1),
        padc(dw_bias.reshape(1, c).astype(f32), 1),
        padc(ln_scale.reshape(1, c).astype(f32), 1),
        padc(ln_bias.reshape(1, c).astype(f32), 1),
        padc(up_kernel.astype(cdt), 0),
        up_bias.reshape(1, -1).astype(f32),
        padc(down_kernel.astype(cdt), 1),
        padc(down_bias.reshape(1, c).astype(f32), 1),
        padc(block_scale.reshape(1, c).astype(f32), 1),
    )

    nh = hp // tile_h
    wp = w + 2 * HALO
    band = lambda im: pl.BlockSpec(  # noqa: E731
        (1, tile_h, wp, cpad), im, memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    if halo_thin:
        # Neighbor halos as HALO-row blocks (index units of HALO rows):
        # top rows [hi*tile_h - HALO, hi*tile_h), bottom rows
        # [(hi+1)*tile_h, (hi+1)*tile_h + HALO) — clamped at the page
        # borders, where the kernel zeroes them anyway.
        r = tile_h // HALO
        nthin = hp // HALO
        thin = lambda im: pl.BlockSpec(  # noqa: E731
            (1, HALO, wp, cpad), im, memory_space=pltpu.VMEM
        )
        above = thin(lambda bi, hi: (bi, jnp.maximum(hi * r - 1, 0), 0, 0))
        below = thin(
            lambda bi, hi: (bi, jnp.minimum((hi + 1) * r, nthin - 1), 0, 0)
        )
    else:
        above = band(lambda bi, hi: (bi, jnp.maximum(hi - 1, 0), 0, 0))
        below = band(lambda bi, hi: (bi, jnp.minimum(hi + 1, nh - 1), 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, c_real=c, dw_tap_major=dw_tap_major),
        grid=(b, nh),
        in_specs=[
            above,
            band(lambda bi, hi: (bi, hi, 0, 0)),
            below,
            full(), full(), full(), full(), full(),
            full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, cpad),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cpad), cdt),
        interpret=interpret,
    )(*args)
    return out[:, :h, :, :c]


def block_xla(
    x, dw_kernel, dw_bias, ln_scale, ln_bias,
    up_kernel, up_bias, down_kernel, down_bias, block_scale,
):
    """Pure-XLA twin of the fused kernel (deterministic ConvNeXtBlockLayer,
    adascale/models/convnext.py:53-81 math): used as the recompute target
    for the trainable block's backward, and as a parity reference."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x,
        dw_kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(HALO, HALO), (HALO, HALO)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + dw_bias.astype(x.dtype)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    h = (yf - mean) * jax.lax.rsqrt(var + 1e-6)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = h.astype(x.dtype)
    u = h @ up_kernel.astype(x.dtype) + up_bias.astype(x.dtype)
    u = jax.nn.gelu(u, approximate=False)
    v = u @ down_kernel.astype(x.dtype) + down_bias.astype(x.dtype)
    return x + v * block_scale.astype(v.dtype)


@functools.lru_cache(maxsize=None)
def make_trainable_block(tile_h: int = 8, interpret: bool = False):
    """Differentiable fused block: Pallas forward, recompute-based XLA
    backward (jax.custom_vjp). Residuals carry only the INPUTS — the
    backward re-runs the XLA composition and differentiates it, trading
    ~1 extra forward of FLOPs for zero saved intra-block activations
    (the same trade jax.checkpoint makes)."""

    @jax.custom_vjp
    def block(x, dwk, dwb, ln_g, ln_b, up_w, up_b, down_w, down_b, scale):
        return fused_convnext_block(
            x, dwk, dwb, ln_g, ln_b, up_w, up_b, down_w, down_b, scale,
            tile_h=tile_h, interpret=interpret,
        )

    def fwd(x, dwk, dwb, ln_g, ln_b, up_w, up_b, down_w, down_b, scale):
        out = block(x, dwk, dwb, ln_g, ln_b, up_w, up_b, down_w, down_b, scale)
        return out, (x, dwk, dwb, ln_g, ln_b, up_w, up_b, down_w, down_b, scale)

    def bwd(residuals, g):
        _, vjp = jax.vjp(block_xla, *residuals)
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block
