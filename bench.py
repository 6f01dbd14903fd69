"""Benchmarks over the BASELINE.json configs.

Default (no args) prints ONE JSON line for the headline metric —
1280px whole-page rough-pass throughput (pages/s/chip):
{"metric", "value", "unit", "vs_baseline"}.

``python bench.py --config N`` (N in 1..5) benches the other BASELINE
configs, one JSON line each:
  1  tiny/FPN single 640x640 page rough forward
  2  small/UPerNeXt 1024px batch-8 forward (PPM + multi-scale fusion)
  3  tiled whole-page: 2048px scan, overlapping 768px tiles, on-device stitch
  4  single two-task train step (grad + clip + AdamW), batch 4 @ 512px
  4f same, backbone via the fused Pallas custom-VJP block
  5  data-parallel train step over an 8-device mesh (needs 8 devices;
     run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8)
  6  END-TO-END train loop: real multiprocess synth data + prefetcher,
     reports steps/s and data_stall_pct (done-bar: stall < 10%)

Baseline (BASELINE.md): the PyTorch reference, TorchScript TINY/FPN
``forward_rough``, CPU fp32 — 0.044 pages/s @1280px, 0.235 pages/s @640px.
The driver-set north star is >=8x @1280 on one TPU v5e chip.

Methodology (this sandbox): the TPU is reached through a tunnel whose RPC
latency dwarfs kernel time and whose ``block_until_ready`` does not
actually synchronize, so every bench chains ITERS steps inside ONE jitted
``lax.scan`` with a value-level data dependency between iterations (XLA
cannot elide or overlap them) and synchronizes once via a scalar host
fetch. Inputs are generated on device (no H2D in the timed region).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent executable cache: compile RPCs to the tunneled TPU dominate
# wall-clock, so repeated bench runs reuse the on-disk compiled program.
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_1280 = 0.044  # torch-CPU forward_rough @1280 (BASELINE.md)
BASELINE_640 = 0.235  # torch-CPU forward_rough @640 (BASELINE.md)
ITERS = 20
HEADLINE_BATCH = 16  # throughput-optimal on v5e (sweep: B=4 36.7, B=8 48.1, B=16 50.7 pages/s)
# Peak dense matmul throughput, one v5e chip: 197 TFLOP/s bf16 / 99 TFLOP/s
# fp32 (public TPU v5e spec). MFU = achieved model FLOP/s / peak.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 99e12


def _flops_of(fn, *args):
    """Model FLOPs for one call of `fn(*args)` from XLA's compiled-program
    cost analysis; None if the backend doesn't expose it."""
    try:
        lowerable = fn if hasattr(fn, "lower") else jax.jit(fn)
        analysis = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu_fields(flops, dt, dtype=None):
    """tflops_per_sec + mfu fields for a step of `flops` taking `dt` sec.

    The peak is chosen by the benched compute dtype (f32 runs at half the
    bf16 MXU rate on v5e), not just the backend — otherwise f32 configs
    report MFU vs a peak they cannot reach (advisor r3 finding, same bug
    as tools/train_profile.py had).
    """
    if not flops or not dt:
        return {}
    achieved = flops / dt
    if jax.default_backend() != "tpu":
        peak = V5E_PEAK_F32
    elif dtype is not None and jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        peak = V5E_PEAK_F32
    else:
        peak = V5E_PEAK_BF16
    return {
        "tflops_per_sec": round(achieved / 1e12, 2),
        "mfu_vs_v5e_peak": round(achieved / peak, 4),
    }


def _chained(forward, iters=ITERS):
    """One jitted program running `iters` sequential forwards with a
    value-level dependency; returns a scalar (host fetch = true sync)."""

    @jax.jit
    def f(p, x):
        def body(img, _):
            out = forward(p, img)
            lead = jax.tree.leaves(out)[0]
            fb = (lead.astype(jnp.float32).mean() * 0.0).astype(img.dtype)
            return img + fb, lead.astype(jnp.float32).mean()

        _, means = jax.lax.scan(body, x, None, length=iters)
        return means.mean()

    return f


def _time_chained(f, p, x, iters=ITERS):
    v = float(f(p, x))  # compile + warmup
    assert np.isfinite(v), v
    t0 = time.perf_counter()
    float(f(p, x))
    return (time.perf_counter() - t0) / iters


def _emit(metric, value, unit, baseline=None, extra=None):
    record = {
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    if extra:
        record.update(extra)
    print(json.dumps(record))


def _build(size, neck, dtype):
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )

    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize(size),
            neck_head_type=AdaptiveScalingNeckHeadType(neck),
        ),
        dtype=dtype,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    return model, params


# Fused FPN neck-L0 + dual-head kernels for the rough pass (round 5,
# ops/pallas/fpn_neck.py + fpn_heads.py). Flip to True only after the
# variant wins on hardware (tools/kernel_sweep.py --skip-stages) —
# interpret-clean kernels can still fail Mosaic compile, and bench.py
# must never die at the round boundary. Only the FPN neck has the fused
# path; UPerNeXt benches fall back automatically.
FUSED_NECK_HEADS = False


def _rough_forward(model, size, dtype, use_pallas):
    if use_pallas:
        from adascale.models.convnext import CONVNEXT_PRESETS
        from adascale.ops.pallas import (
            convnext_forward_pallas,
            forward_rough_from_features_fused,
        )

        spec = CONVNEXT_PRESETS[size]
        neck_type = getattr(
            model.config.neck_head_type, "value", model.config.neck_head_type
        )
        fuse_nh = FUSED_NECK_HEADS and str(neck_type) == "fpn"

        def forward(p, x):
            feats = convnext_forward_pallas(p["backbone"], x.astype(dtype), spec)
            if fuse_nh:
                return forward_rough_from_features_fused(model, p, feats)
            return model.apply(
                {"params": p}, tuple(feats), method=model.forward_rough_from_features
            )

        return forward

    def forward(p, x):
        return model.apply({"params": p}, x, True, method=model.forward_rough)

    return forward


def _make_input(batch, res):
    return jax.jit(
        lambda k: jax.random.uniform(k, (batch, res, res, 3), jnp.float32),
        static_argnums=(),
    )(jax.random.PRNGKey(1))


def bench_rough(res, batch, size="tiny", neck="fpn", baseline=None, tag=None):
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = _build(size, neck, dtype)
    forward = _rough_forward(model, size, dtype, use_pallas=on_tpu)
    f = _chained(forward)
    x = _make_input(batch, res)
    dt = _time_chained(f, params, x)
    flops = _flops_of(forward, params, x)
    _emit(
        tag or f"rough_forward_{res}px_pages_per_sec_per_chip",
        batch / dt,
        "pages/s",
        baseline,
        extra=_mfu_fields(flops, dt, dtype),
    )


def bench_tiled_2048():
    """BASELINE config 3: 2048px scan, tiled rough pass, on-device stitch."""
    from adascale.inference.tiled import tiled_rough_forward

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = _build("tiny", "fpn", dtype)
    forward_b = _rough_forward(model, "tiny", dtype, use_pallas=on_tpu)

    def forward(p, x):  # x: (1, 2048, 2048, 3) -> stitched maps
        return tiled_rough_forward(
            lambda t: forward_b(p, t), x[0], tile=768, overlap=128, fdf=2
        )

    f = _chained(forward, iters=4)
    x = _make_input(1, 2048)
    dt = _time_chained(f, params, x, iters=4)
    _emit("tiled_rough_2048px_pages_per_sec_per_chip", 1.0 / dt, "pages/s")


def bench_train_step(
    n_devices=1, hw=512, per_device_batch=4, iters=5, micro=False, fused=False,
    dtype=None, precise_hw=320,
):
    """BASELINE configs 4/5: two-task train step, single device or sharded
    over an n-device data mesh. ``fused=True`` routes the backbone through
    the Pallas custom-VJP block (TrainStepConfig.fused_backbone);
    ``dtype=jnp.bfloat16`` benches mixed precision (bf16 compute, f32
    params/optimizer, f32 losses).

    Shapes default to the flagship operating point (rough crop ``hw``=512,
    precise crop ``precise_hw``=320 — examples/flagship_training/steps.json).
    Inputs are generated ON DEVICE and the loop is timed with device-resident
    batches: rounds 1-2 fed numpy per step, so the "train step" numbers were
    dominated by ~30 MB/step of tunnel H2D (see BASELINE.md) — the real
    pipeline overlaps H2D on the prefetch thread (training/loop.py)."""
    from adascale.losses import CoreBox
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )
    from adascale.parallel import create_mesh, replicate, shard_batch
    from adascale.training import (
        OptimizerConfig,
        TrainStepConfig,
        build_optimizer,
        make_train_step,
    )
    from adascale.training.train_step import TrainState

    b, p = per_device_batch * n_devices, 200
    fh = hw // 2
    ph = precise_hw
    pfh = ph // 2
    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
            custom_block_channels_and_num_layers=(
                ((16, 1), (32, 1), (64, 1), (128, 1)) if micro else None
            ),
        ),
        dtype=dtype or jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    rough = {
        "image": jax.random.uniform(ks[0], (b, hw, hw, 3), jnp.float32, 0, 255),
        "downsampled_mask": (
            jax.random.uniform(ks[1], (b, fh, fh)) > 0.5
        ).astype(jnp.float32),
        "downsampled_score_map": jax.random.uniform(
            ks[2], (b, fh, fh), jnp.float32, 0, 10
        ),
    }
    precise = {
        "image": jax.random.uniform(ks[3], (b, ph, ph, 3), jnp.float32, 0, 255),
        "downsampled_mask": (
            jax.random.uniform(ks[4], (b, pfh, pfh)) > 0.5
        ).astype(jnp.float32),
        "downsampled_score_map": jax.random.uniform(ks[5], (b, pfh, pfh)),
        "downsampled_label_point_y": jax.random.randint(ks[6], (b, p), 0, pfh),
        "downsampled_label_point_x": jax.random.randint(ks[7], (b, p), 0, pfh),
        "up_left_offsets": jax.random.uniform(ks[8], (b, p, 2), jnp.float32, -4, 4),
        "corner_angles": jax.nn.softmax(
            jax.random.normal(ks[9], (b, p, 4)), axis=-1
        ),
        "corner_distances": jax.random.uniform(ks[10], (b, p, 3), jnp.float32, 0, 10),
    }
    jax.block_until_ready(rough["image"])
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=1000)
    state = TrainState(params=params, opt_state=tx.init(params))
    config = TrainStepConfig(
        rough_core_box=CoreBox(0, fh - 1, 0, fh - 1),
        precise_core_box=CoreBox(0, pfh - 1, 0, pfh - 1),
        fused_backbone=fused,
    )

    mesh = None
    if n_devices > 1:
        devices = jax.devices()
        if len(devices) < n_devices:
            # Fall back to virtual CPU devices (the axon TPU plugin ignores
            # JAX_PLATFORMS, so ask the CPU backend explicitly).
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                devices = []
        if len(devices) < n_devices:
            _emit(f"train_step_dp{n_devices}", float("nan"), "steps/s")
            return
        mesh = create_mesh(devices[:n_devices])
        state = replicate(state, mesh)
        rough = shard_batch(rough, mesh)
        precise = shard_batch(precise, mesh)
    step = make_train_step(model, tx, config, mesh=mesh, donate=False)

    # Warmup/compile, then time N sequential steps (each step's output state
    # feeds the next — a real dependency chain, no scan tricks needed).
    state2, m = step(state, key, rough, precise)
    float(m["rough_loss"])
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, m = step(s, key, rough, precise)
    float(m["rough_loss"]) ; float(m["precise_loss"])
    dt = (time.perf_counter() - t0) / iters
    tag = (
        f"train_step_batch{b}_{hw}r{ph}p"
        if n_devices == 1
        else f"train_step_dp{n_devices}_batch{b}_{hw}r{ph}p"
    )
    if fused:
        tag += "_fused"
    if dtype is not None and dtype != jnp.float32:
        tag += f"_{jnp.dtype(dtype).name}"
    flops = _flops_of(step, state, key, rough, precise)
    _emit(tag, 1.0 / dt, "steps/s",
          extra=_mfu_fields(flops, dt, dtype or jnp.float32))


def bench_train_loop_e2e(num_batches=30, batch_size=4, num_processes=8):
    """VERDICT r1 #3: END-TO-END train-loop throughput with the real synth
    data pipeline (multiprocess generator pool + background prefetcher) —
    reports steps/s and the data-stall fraction. Done-bar: stall < 10%,
    i.e. hardware steps/s ~= device-only steps/s."""
    import tempfile

    from adascale.data.dataset import (
        AdaptiveScalingDatasetConfig,
        AdaptiveScalingIterableDataset,
        SynthPipelineConfig,
        collate_samples,
    )
    from adascale.data.prefetch import BatchPrefetcher
    from adascale.data.synth import SynthPageConfig
    from adascale.losses import CoreBox
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )
    from adascale.training import (
        OptimizerConfig,
        TrainStepConfig,
        build_optimizer,
        make_train_step,
    )
    from adascale.training.train_step import TrainState
    from adascale.utils.config import dump_config

    pipe = SynthPipelineConfig(
        page=SynthPageConfig(page_height=768, page_width=768),
        rough_crop_size=512,
        precise_crop_size=320,
    )
    steps_json = tempfile.mktemp(suffix=".json")
    dump_config(pipe, steps_json)
    ds = AdaptiveScalingIterableDataset(
        AdaptiveScalingDatasetConfig(
            steps_json=steps_json,
            num_samples=num_batches * batch_size * 2,
            num_page_char_regression_labels=200,
            rng_seed=7,
            num_processes=num_processes,
        )
    )
    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        )
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=1000)
    state = TrainState(params=params, opt_state=tx.init(params))
    rd, pd = pipe.rough_crop_size // 2, pipe.precise_crop_size // 2
    config = TrainStepConfig(
        rough_core_box=CoreBox(16, rd - 17, 16, rd - 17),
        precise_core_box=CoreBox(8, pd - 9, 8, pd - 9),
    )
    step = make_train_step(model, tx, config, donate=False)

    drop = {"downsampled_shape", "downsampled_core_box", "rng_states"}
    batch_iter = iter(ds)

    def make_batch():
        nonlocal batch_iter
        pairs = []
        for _ in range(batch_size):
            try:
                pairs.append(next(batch_iter))
            except StopIteration:
                batch_iter = iter(ds)
                pairs.append(next(batch_iter))
        b = collate_samples(pairs)
        return (
            {k: jnp.asarray(v) for k, v in b["rough"].items() if k not in drop},
            {k: jnp.asarray(v) for k, v in b["precise"].items() if k not in drop},
        )

    pf = BatchPrefetcher(make_batch, depth=3)
    # Compile + warm the pool. Stage stamps: the train-step compile via the
    # TPU tunnel can take many minutes on first run (then cached).
    print("# config6: first batch...", file=sys.stderr, flush=True)
    rough, precise = pf.get()
    print("# config6: compiling train step...", file=sys.stderr, flush=True)
    state, m = step(state, key, rough, precise)
    float(m["rough_loss"])
    print("# config6: timed loop...", file=sys.stderr, flush=True)
    pf.reset_stall_accounting()
    t0 = time.perf_counter()
    for _ in range(num_batches):
        rough, precise = pf.get()
        state, m = step(state, key, rough, precise)
    float(m["rough_loss"]); float(m["precise_loss"])
    wall = time.perf_counter() - t0
    pf.stop()
    ds.pool.cleanup()
    _emit(
        f"train_loop_e2e_batch{batch_size}_{pipe.rough_crop_size}px",
        num_batches / wall,
        "steps/s",
        extra={"data_stall_pct": round(100.0 * pf.stall_seconds / wall, 2)},
    )


def bench_datagen(runs=20):
    """Host synth-data throughput, python vs native rasterizer (the
    flagship-recipe pipeline: 768px pages, 4 rough + 6 precise crops)."""
    from adascale.data.dataset import SynthPipelineConfig, run_pipeline
    from adascale.data.synth import SynthPageConfig

    results = {}
    for backend in ("python", "native"):
        pipe = SynthPipelineConfig(
            page=SynthPageConfig(
                page_height=768, page_width=768, render_backend=backend
            ),
            rough_crop_size=512,
            precise_crop_size=320,
            rough_samples_per_page=4,
            precise_samples_per_page=6,
        )
        try:
            run_pipeline(pipe, 7, 0)  # warm (builds the native lib/atlas)
        except AssertionError:
            continue  # native lib unavailable
        t0 = time.perf_counter()
        pairs = 0
        for i in range(runs):
            rough, precise = run_pipeline(pipe, 7, i)
            pairs += min(len(rough), len(precise))
        results[backend] = pairs / (time.perf_counter() - t0)
    for backend, rate in results.items():
        _emit(f"datagen_pairs_per_sec_{backend}", rate, "pairs/s")


def main() -> None:
    cfg = None
    if len(sys.argv) > 2 and sys.argv[1] == "--config":
        cfg = sys.argv[2]
    if cfg is None:
        bench_rough(1280, HEADLINE_BATCH, baseline=BASELINE_1280)
        return
    if cfg == "4f":
        bench_train_step(1, fused=True)
        return
    if cfg == "4b":
        bench_train_step(1, dtype=jnp.bfloat16)
        return
    if cfg == "4b6":
        # Flagship operating point: batch 6, bf16 (examples/flagship_training).
        bench_train_step(1, per_device_batch=6, dtype=jnp.bfloat16)
        return
    if cfg == "4b8":
        bench_train_step(1, per_device_batch=8, dtype=jnp.bfloat16)
        return
    if cfg == "4fb":
        bench_train_step(1, fused=True, dtype=jnp.bfloat16)
        return
    if cfg == "6":
        bench_train_loop_e2e()
        return
    if cfg == "7":
        bench_datagen()
        return
    cfg = int(cfg)
    if cfg == 1:
        bench_rough(640, 1, baseline=BASELINE_640, tag="rough_forward_640px_single_page")
    elif cfg == 2:
        bench_rough(1024, 8, size="small", neck="upernext",
                    tag="upernext_small_1024px_batch8")
    elif cfg == 3:
        bench_tiled_2048()
    elif cfg == 4:
        bench_train_step(1)
    elif cfg == 5:
        # DP validation scale: on this sandbox the 8-device mesh is virtual
        # CPU; keep shapes small (it validates sharding, not peak perf).
        small = jax.default_backend() != "tpu" or len(jax.devices()) < 8
        if small:
            bench_train_step(8, hw=128, per_device_batch=1, iters=2, micro=True)
        else:
            bench_train_step(8)
    else:
        raise SystemExit(f"unknown config {cfg}")


if __name__ == "__main__":
    main()
