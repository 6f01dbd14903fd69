"""A/B sweep of the fused ConvNeXt-block kernel on the real device.

BASELINE.md's roofline (round 4) showed the depthwise 7x7 is the serving
bottleneck: XLA's lowering reaches ~1/7th of the HBM bound, and inside the
fused Pallas block the 49-tap VPU loop paid a width-shift (sublane rotate)
plus an f32 convert per tap. This tool measures, per backbone stage shape
and end-to-end, the two dwconv loop orders:

  * ``tap``  — legacy tap-major: 49x (shift + convert + FMA)
  * ``kx``   — kx-major: 7 shifts + 7 converts, then 49 FMAs whose row
               offsets are pure addressing (ops/pallas/convnext_block.py)

plus a requested-tile_h sweep (the auto-clamp in the kernel may leave VMEM
headroom on the later, narrower stages).

Timing methodology matches bench.py: scan-chained compiled programs with a
value-level carry dependency, synced once via scalar fetch (the tunnel's
``block_until_ready`` does not synchronize).

Usage (TPU):  python -m adascale.tools.kernel_sweep [--batch 16] [--hw 1280]
                  [--dtype bf16] [--iters 8]

Reference hot loop being optimized:
/root/reference/vkit_open_model/model/convnext.py:29-59.
"""
from __future__ import annotations

import argparse
import json

from . import train_profile as tp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=1280)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tile-hs", default="8,16")
    ap.add_argument(
        "--skip-stages", action="store_true",
        help="skip the per-stage block sweep and only time the end-to-end "
        "serving variants (fast validation of the neck/heads kernels)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )
    from adascale.models.convnext import CONVNEXT_PRESETS, ConvNeXtBlockLayer
    from adascale.ops.pallas import convnext_forward_pallas, fused_convnext_block

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if jax.default_backend() == "tpu":
        tp._PEAK = tp.V5E_PEAK_BF16 if args.dtype == "bf16" else tp.V5E_PEAK_F32
    b, hw = args.batch, args.hw
    key = jax.random.PRNGKey(0)
    stage_specs = list(CONVNEXT_PRESETS[AdaptiveScalingSize.TINY.value])
    tile_hs = [int(t) for t in args.tile_hs.split(",") if t]
    print(
        f"kernel sweep: tiny backbone stages, B{b}@{hw} {args.dtype}, "
        f"backend={jax.default_backend()}",
        flush=True,
    )

    def chain(body):
        def wrapped(c):
            c2 = body(c)
            return c2, c2.astype(jnp.float32).mean()

        return wrapped

    results: dict[str, float] = {}

    # (label, dw_tap_major, halo_thin, tile_h) — band variants from
    # --tile-hs, thin-halo variants at their natural HALO-multiple tiles.
    variants = [
        (f"tap band th{th}", True, False, th) for th in tile_hs
    ] + [
        (f"kx  band th{th}", False, False, th) for th in tile_hs
    ] + [
        ("kx  thin th12", False, True, 12),
        ("kx  thin th24", False, True, 24),
        ("tap thin th12", True, True, 12),
    ]

    # ---- per-stage fused block chains ----
    for si, (c, n) in enumerate(stage_specs if not args.skip_stages else []):
        r = (hw // 4) // (2**si)
        layer = ConvNeXtBlockLayer(channels=c)
        params = layer.init(key, jnp.zeros((1, 8, 8, c)))["params"]
        x = jax.random.normal(key, (b, r, r, c), dtype)
        for vlabel, tap_major, thin, th in variants:
            label = f"s{si} {r}x{r}x{c} x{n} {vlabel}"

            def body(t, _p=params, _n=n, _tap=tap_major, _thin=thin, _th=th):
                for _ in range(_n):
                    t = fused_convnext_block(
                        t,
                        _p["dwconv"]["kernel"],
                        _p["dwconv"]["bias"],
                        _p["ln"]["scale"],
                        _p["ln"]["bias"],
                        _p["mlp_up"]["kernel"],
                        _p["mlp_up"]["bias"],
                        _p["mlp_down"]["kernel"],
                        _p["mlp_down"]["bias"],
                        _p["block_scale"],
                        tile_h=_th,
                        dw_tap_major=_tap,
                        halo_thin=_thin,
                    )
                return t

            try:
                dt, _ = tp._time_scan(chain(body), x, args.iters, label)
                results[label.strip()] = dt * 1e3
            except Exception as exc:  # VMEM overflow etc — report, move on
                print(f"{label:<36} FAILED: {type(exc).__name__}", flush=True)

    # ---- end-to-end rough forward, Pallas backbone, both variants ----
    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        ),
        dtype=dtype,
    )
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    image = jax.random.uniform(key, (b, hw, hw, 3), jnp.float32, 0, 255)

    from adascale.ops.pallas import forward_rough_from_features_fused

    # (label, dw_tap_major, halo_thin, tile_h, neck_heads_mode) where
    # neck_heads_mode: "flax" = Flax neck+heads, "heads" = fused dual-head
    # kernel only, "full" = fused neck L0 + fused heads (ops/pallas/fpn_*).
    full_variants = [
        ("tap band th8", True, False, 8, "flax"),
        ("kx  band th8", False, False, 8, "flax"),
        ("tap band th8 +heads", True, False, 8, "heads"),
        ("tap band th8 +neck+heads", True, False, 8, "full"),
    ]
    for vlabel, tap_major, thin, th, nh_mode in full_variants:

        def full_body(img, _tap=tap_major, _thin=thin, _th=th, _nh=nh_mode):
            feats = convnext_forward_pallas(
                params["backbone"], img.astype(dtype), stage_specs,
                dw_tap_major=_tap, halo_thin=_thin, tile_h=_th,
            )
            if _nh == "flax":
                mask_logits, height = model.apply(
                    {"params": params},
                    tuple(feats),
                    method=model.forward_rough_from_features,
                )
            else:
                mask_logits, height = forward_rough_from_features_fused(
                    model, params, feats, fuse_neck=(_nh == "full")
                )
            return img + 1e-6 * jnp.tanh(
                mask_logits.astype(jnp.float32).mean()
                + height.astype(jnp.float32).mean()
            )

        label = f"full rough fwd {vlabel}"
        # Same guard as the per-stage loop: an unproven variant failing
        # Mosaic compile must not discard the results already collected.
        try:
            dt, _ = tp._time_scan(chain(full_body), image, args.iters, label)
            results[label.strip()] = dt * 1e3
            print(f"    -> {b / dt:.1f} pages/s", flush=True)
        except Exception as exc:
            print(f"{label:<28} FAILED: {type(exc).__name__}", flush=True)

    # ---- precise pass: Flax vs fused quad-head kernel ----
    from adascale.ops.pallas import forward_precise_from_features_fused

    for vlabel, fused in [("flax", False), ("fused", True)]:

        def precise_body(img, _fused=fused):
            feats = convnext_forward_pallas(
                params["backbone"], img.astype(dtype), stage_specs
            )
            if _fused:
                outs = forward_precise_from_features_fused(model, params, feats)
            else:
                outs = model.apply(
                    {"params": params},
                    tuple(feats),
                    method=model.forward_precise_from_features,
                )
            bump = sum(o.astype(jnp.float32).mean() for o in outs)
            return img + 1e-6 * jnp.tanh(bump)

        label = f"full precise fwd {vlabel}"
        try:
            dt, _ = tp._time_scan(chain(precise_body), image, args.iters, label)
            results[label.strip()] = dt * 1e3
            print(f"    -> {b / dt:.1f} pages/s", flush=True)
        except Exception as exc:
            print(f"{label:<28} FAILED: {type(exc).__name__}", flush=True)

    print(json.dumps({"kernel_sweep_ms": results}), flush=True)


if __name__ == "__main__":
    import os

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
