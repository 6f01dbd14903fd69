"""Ablation profiler for the two-task train step (VERDICT r2 weak #1).

The sandbox TPU sits behind an RPC tunnel where ``block_until_ready``
does not synchronize and op-level profiler traces are unreliable, so this
tool attributes step time by *ablation*: each component (forward only,
grad only, one task only, backbone only, depthwise-conv microbench,
optimizer only) is timed as its own scan-chained jitted program with a
value-level inter-iteration dependency + one scalar host fetch (the
bench.py methodology), and the full step's time is decomposed by
differencing.

Usage:  python -m adascale.tools.train_profile [--batch 6] [--iters 8]
        [--dtype bf16|f32] [--remat] [--fused]

Reference hot loop being attributed: the reference trains this model with
torch autograd (``/root/reference/experiment/adaptive_scaling/train.py:397-478``);
there is no torch-side number — the target is v5e peak, not the reference.
"""
from __future__ import annotations

import argparse
import os
import time

os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 99e12
# Set by main() from --dtype so f32 runs report MFU against the f32 peak
# (ADVICE r3: backend-only selection overstated f32 MFU 2x).
_PEAK = None


def _time_scan(body_fn, carry, iters, label, want_flops=False):
    """Time ``iters`` sequential applications of ``body_fn`` chained inside
    one jitted lax.scan (value dependency via the carry); returns s/iter.
    FLOPs come from the SAME compiled program's cost analysis (no extra
    compile — tunnel compiles cost 100-700 s each)."""

    @jax.jit
    def run(c):
        c2, outs = jax.lax.scan(lambda c, _: body_fn(c), c, None, length=iters)
        return outs[-1] if outs is not None else 0.0

    flops = None
    compiled = run.lower(carry).compile()
    if want_flops:
        try:
            analysis = compiled.cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            f = float(analysis.get("flops", 0.0))
            flops = f / iters if f > 0 else None
        except Exception:
            pass
    v = float(np.asarray(compiled(carry)).ravel()[0])  # warmup + sync
    assert np.isfinite(v), (label, v)
    t0 = time.perf_counter()
    float(np.asarray(compiled(carry)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    peak = _PEAK or (
        V5E_PEAK_BF16 if jax.default_backend() == "tpu" else V5E_PEAK_F32
    )
    mfu = f"  mfu={flops / dt / peak * 100:5.1f}%" if flops else ""
    tfs = f"  {flops / dt / 1e12:6.2f} TF/s" if flops else ""
    print(f"{label:<28} {dt * 1e3:8.1f} ms{tfs}{mfu}", flush=True)
    return dt, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--rough-hw", type=int, default=512)
    ap.add_argument("--precise-hw", type=int, default=320)
    ap.add_argument(
        "--loop-probe",
        action="store_true",
        help="measure the TRAIN-LOOP overheads instead of the step ablations: "
        "python-loop dispatch with device-resident vs numpy (H2D-per-call) "
        "inputs, and the RTT of fetching an already-computed scalar",
    )
    args = ap.parse_args()

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
    )
    from adascale.training.train_step import TrainState, _two_task_loss

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    global _PEAK
    if jax.default_backend() == "tpu":
        _PEAK = V5E_PEAK_BF16 if args.dtype == "bf16" else V5E_PEAK_F32
    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        ),
        dtype=dtype,
    )
    b, p = args.batch, 200
    rhw, phw = args.rough_hw, args.precise_hw
    rfh, pfh = rhw // 2, phw // 2

    # Inputs generated ON DEVICE (H2D over the tunnel is ~6 MB/s).
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    rough = {
        "image": jax.random.uniform(ks[0], (b, rhw, rhw, 3), jnp.float32, 0, 255),
        "downsampled_mask": (
            jax.random.uniform(ks[1], (b, rfh, rfh)) > 0.5
        ).astype(jnp.float32),
        "downsampled_score_map": jax.random.uniform(
            ks[2], (b, rfh, rfh), jnp.float32, 0, 10
        ),
    }
    precise = {
        "image": jax.random.uniform(ks[3], (b, phw, phw, 3), jnp.float32, 0, 255),
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
        "corner_distances": jax.random.uniform(
            ks[10], (b, p, 3), jnp.float32, 0, 10
        ),
    }
    jax.block_until_ready(rough["image"])

    params = model.init(ks[11], jnp.zeros((1, 64, 64, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=1000)
    state = TrainState(params=params, opt_state=tx.init(params))
    config = TrainStepConfig(
        rough_core_box=CoreBox(0, rfh - 1, 0, rfh - 1),
        precise_core_box=CoreBox(0, pfh - 1, 0, pfh - 1),
        remat=args.remat,
        fused_backbone=args.fused,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(
        f"tiny/FPN {n_params / 1e6:.1f}M params, {args.dtype}, "
        f"rough B{b}@{rhw}, precise B{b}@{phw}, backend={jax.default_backend()}",
        flush=True,
    )

    loss_fn = lambda prm, rb, pb, rng: _two_task_loss(  # noqa: E731
        model, prm, rb, pb, rng, config, False
    )

    if args.loop_probe:
        from adascale.training import make_train_step

        step = make_train_step(model, tx, config, mesh=None, donate=False)
        # numpy copies (forces an H2D transfer per call, what the train
        # loop does today) vs the device-resident arrays.
        rough_np = {k: np.asarray(v) for k, v in rough.items()}
        precise_np = {k: np.asarray(v) for k, v in precise.items()}
        h2d_bytes = sum(v.nbytes for v in rough_np.values()) + sum(
            v.nbytes for v in precise_np.values()
        )

        def run_loop(rb, pb, label):
            st, m = step(state, key, rb, pb)  # compile + warmup
            float(m["rough_loss"])
            t0 = time.perf_counter()
            st = state
            for _ in range(args.iters):
                st, m = step(st, key, rb, pb)
            float(m["rough_loss"])  # one sync at the end
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{label:<40} {dt * 1e3:8.1f} ms/step", flush=True)
            return dt

        # Compact-transfer variants (uint8 image / f16 maps — what the
        # flagship loop actually ships, loop._clean_batch).
        def compact(batch):
            out = {}
            for k, v in batch.items():
                if k == "image":
                    out[k] = np.asarray(v).astype(np.uint8)
                elif v.dtype == np.float32:
                    out[k] = np.asarray(v).astype(np.float16)
                else:
                    out[k] = np.asarray(v)
            return out

        rough_c, precise_c = compact(rough_np), compact(precise_np)
        c_bytes = sum(v.nbytes for v in rough_c.values()) + sum(
            v.nbytes for v in precise_c.values()
        )

        t_dev = run_loop(rough, precise, "py-loop, device-resident inputs")
        t_np = run_loop(
            rough_np, precise_np, f"py-loop, numpy f32 inputs ({h2d_bytes / 1e6:.1f} MB H2D)"
        )
        t_c = run_loop(
            rough_c, precise_c, f"py-loop, numpy compact inputs ({c_bytes / 1e6:.1f} MB H2D)"
        )
        # RTT of fetching an already-computed scalar (the per-step
        # float(metrics) sync the train loop pays).
        st2, m2 = step(state, key, rough, precise)
        float(m2["rough_loss"])  # ensure complete
        t0 = time.perf_counter()
        for _ in range(10):
            float(m2["precise_loss"]) ; float(m2["rough_loss"])
        rtt = (time.perf_counter() - t0) / 10
        print(f"{'fetch 2 ready scalars (loop sync cost)':<40} {rtt * 1e3:8.1f} ms", flush=True)
        print(
            f"H2D overhead/step: {(t_np - t_dev) * 1e3:.1f} ms "
            f"(~{h2d_bytes / max(t_np - t_dev, 1e-9) / 1e6:.0f} MB/s)",
            flush=True,
        )
        return

    # ---- full step (grad + clip + AdamW), state-chained ----
    def full_body(carry):
        st, rng = carry
        rng, k = jax.random.split(rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (rl, pl)), grads = grad_fn(st.params, rough, precise, k)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        new_params = jax.tree.map(lambda a, u: a + u, st.params, updates)
        return (TrainState(params=new_params, opt_state=opt_state), rng), rl + pl

    t_full, _ = _time_scan(
        full_body, (state, key), args.iters, "full_step", want_flops=True
    )

    # ---- forward only (loss value, no grad) ----
    def fwd_body(carry):
        rng = carry
        rng, k = jax.random.split(rng)
        total, _ = loss_fn(params, rough, precise, k)
        return rng, total

    t_fwd, _ = _time_scan(fwd_body, key, args.iters, "fwd_only(two-task loss)", want_flops=True)

    # ---- grad only (no optimizer) ----
    def grad_body(carry):
        rng = carry
        rng, k = jax.random.split(rng)
        (_, (rl, pl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rough, precise, k
        )
        gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        return rng, rl + pl + gnorm * 0.0

    t_grad, _ = _time_scan(grad_body, key, args.iters, "grad_only", want_flops=True)

    # ---- single-task grads ----
    def one_task(batch, is_rough):
        def body(carry):
            rng = carry
            rng, k = jax.random.split(rng)

            def lf(prm):
                total, (rl, pl) = loss_fn(prm, rough, precise, k)
                return rl if is_rough else pl

            l, grads = jax.value_and_grad(lf)(params)
            gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
            return rng, l + gnorm * 0.0

        return body

    # NOTE: rough/precise single-task still traces the other forward? No:
    # grad of rl only — XLA DCEs the precise branch since rl doesn't depend
    # on it (separate necks/heads; shared backbone applied per-branch).
    t_rough, _ = _time_scan(one_task(rough, True), key, args.iters, "rough_task_grad", want_flops=True)
    t_precise, _ = _time_scan(
        one_task(precise, False), key, args.iters, "precise_task_grad",
        want_flops=True,
    )

    # ---- backbone-only grad at the rough shape ----
    def bb_body(carry):
        rng = carry
        rng, k = jax.random.split(rng)

        def lf(prm):
            feats = model.apply(
                {"params": prm},
                rough["image"].astype(dtype),
                False,
                rngs={"drop_path": k},
                method=lambda m, x, det: m.backbone(x, det),
            )
            return sum(f.astype(jnp.float32).mean() for f in feats)

        l, grads = jax.value_and_grad(lf)(params)
        gnorm = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        return rng, l + gnorm * 0.0

    try:
        t_bb, _ = _time_scan(bb_body, key, args.iters, "backbone_grad(rough shape)", want_flops=True)
    except Exception as e:  # forward_backbone may not exist as a method
        print(f"backbone_grad skipped: {type(e).__name__}: {e}", flush=True)
        t_bb = None

    # ---- optimizer only ----
    grads0 = jax.jit(
        lambda prm: jax.grad(lambda q: loss_fn(q, rough, precise, key)[0])(prm)
    )(params)
    jax.block_until_ready(jax.tree.leaves(grads0)[0])

    def opt_body2(carry):
        st = carry
        updates, opt_state = tx.update(grads0, st.opt_state, st.params)
        new_params = jax.tree.map(lambda a, u: a + u, st.params, updates)
        lead = jax.tree.leaves(new_params)[0]
        return (
            TrainState(params=new_params, opt_state=opt_state),
            lead.astype(jnp.float32).mean(),
        )

    t_opt, _ = _time_scan(opt_body2, state, args.iters, "optimizer_only")

    # ---- depthwise-conv microbench per stage (fwd+bwd) ----
    # ConvNeXt tiny stages at rough 512px: (128,128,96) (64,64,192)
    # (32,32,384) (16,16,768); dims halved from /2 stem + 3 downsamples.
    print("-- depthwise 7x7 fwd+bwd microbench (rough shapes) --", flush=True)
    t_dw_total = 0.0
    for (hw, c) in ((rhw // 4, 96), (rhw // 8, 192), (rhw // 16, 384), (rhw // 32, 768)):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, c), dtype)
        w = jax.random.normal(jax.random.PRNGKey(2), (7, 7, 1, c), dtype) * 0.01

        def dw_body(carry, x=x, w=w, c=c):
            xx = carry

            def lf(w_):
                y = jax.lax.conv_general_dilated(
                    xx, w_, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c,
                )
                return y.astype(jnp.float32).mean()

            l, gw = jax.value_and_grad(lf)(w)
            return xx + (l * 0.0).astype(dtype), l + gw.astype(jnp.float32).mean() * 0.0

        t, _ = _time_scan(dw_body, x, args.iters, f"  dw7x7 {hw}x{hw}x{c}", want_flops=True)
        t_dw_total += t

    print("-- summary --", flush=True)
    print(f"full step          {t_full * 1e3:8.1f} ms  ({1.0 / t_full:.2f} steps/s)")
    print(f"  forward           {t_fwd * 1e3:8.1f} ms  ({t_fwd / t_full * 100:.0f}%)")
    print(f"  backward (diff)   {(t_grad - t_fwd) * 1e3:8.1f} ms  ({(t_grad - t_fwd) / t_full * 100:.0f}%)")
    print(f"  optimizer (diff)  {(t_full - t_grad) * 1e3:8.1f} ms  ({(t_full - t_grad) / t_full * 100:.0f}%)")
    print(f"  rough task grad   {t_rough * 1e3:8.1f} ms")
    print(f"  precise task grad {t_precise * 1e3:8.1f} ms")
    if t_bb is not None:
        print(f"  backbone grad     {t_bb * 1e3:8.1f} ms  (rough shape; task - this = neck/head/loss)")
    print(f"  optimizer alone   {t_opt * 1e3:8.1f} ms")
    print(f"  dwconv micro sum  {t_dw_total * 1e3:8.1f} ms  (one branch fwd+wgrad)")


if __name__ == "__main__":
    main()
