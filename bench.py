"""Headline benchmark: 1280px whole-page rough-pass throughput (pages/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the PyTorch reference, TorchScript TINY/FPN
``forward_rough`` on a 1280x1280 page, CPU fp32 = 0.044 pages/s. The
driver-set north star is >=8x that on one TPU v5e chip.

Measured path: flagship AdaptiveScaling TINY/FPN rough forward (backbone +
FPN neck + mask/height heads), bfloat16 compute / fp32 params — the dtype
policy the inference engine uses on TPU.

Methodology notes (this sandbox): the TPU is reached through a tunnel whose
RPC latency dwarfs kernel time and whose ``block_until_ready`` does not
actually synchronize, so the benchmark chains ITERS forwards inside ONE
jitted ``lax.scan`` with a value-level data dependency between iterations
(XLA cannot elide or overlap them) and synchronizes once via a scalar host
fetch. Input lives on device (no H2D in the timed region).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent executable cache: compile RPCs to the tunneled TPU dominate
# wall-clock, so repeated bench runs reuse the on-disk compiled program.
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_PAGES_PER_S = 0.044  # torch-CPU forward_rough @1280 (BASELINE.md)
RES = 1280
BATCH = 4
ITERS = 20


def main() -> None:
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )

    platform = jax.default_backend()
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        ),
        dtype=dtype,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    if platform == "tpu":
        # Fused Pallas ConvNeXt blocks (+~8% over plain XLA at this shape).
        from adascale.models.convnext import CONVNEXT_PRESETS
        from adascale.ops.pallas import convnext_forward_pallas

        spec = CONVNEXT_PRESETS["tiny"]

        def forward(p, x):
            feats = convnext_forward_pallas(p["backbone"], x.astype(dtype), spec)
            return model.apply(
                {"params": p}, tuple(feats), method=model.forward_rough_from_features
            )
    else:

        def forward(p, x):
            return model.apply({"params": p}, x, True, method=model.forward_rough)

    @jax.jit
    def chained(p, x):
        def body(img, _):
            mask_logits, height = forward(p, img)
            # Value-level dependency: the next input depends on this output,
            # so the scan body cannot be deduplicated or reordered. The
            # perturbation is exactly 0 at runtime but opaque to XLA.
            feedback = (mask_logits.astype(jnp.float32).mean() * 0.0).astype(x.dtype)
            return img + feedback, mask_logits.astype(jnp.float32).mean()
        img, means = jax.lax.scan(body, x, None, length=ITERS)
        return means.mean()

    @jax.jit
    def make_input(key):
        return jax.random.uniform(key, (BATCH, RES, RES, 3), jnp.float32)

    x = make_input(jax.random.PRNGKey(1))
    # Warmup / compile (also proves the result is finite & real).
    v = float(chained(params, x))
    assert np.isfinite(v), v

    t0 = time.perf_counter()
    v = float(chained(params, x))  # scalar host fetch = true sync
    dt = time.perf_counter() - t0

    pages_per_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"rough_forward_{RES}px_pages_per_sec_per_chip",
                "value": round(pages_per_s, 4),
                "unit": "pages/s",
                "vs_baseline": round(pages_per_s / BASELINE_PAGES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
