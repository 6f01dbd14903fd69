"""Measure bf16-serving drift vs f32 on the trained overfit fixture.

Runs the full two-stage engine twice over the fixture page — once at
f32/highest-precision matmuls, once at bf16/default — and reports rough
mask agreement, height-map drift and end-to-end char F1 for both. The
overfit fixture is the adversarial case for low-precision drift (weights
memorize exact pixels), so these numbers bound what diverse-data
checkpoints see. Recorded in PARITY.md.

Usage: python -m adascale.tools.bf16_drift   (runs on the default jax
backend; meaningful on TPU).
"""
from __future__ import annotations

import os


def main() -> None:
    import jax

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sys

    import numpy as np

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "..", "tests")
    )
    from test_detection_quality import MODEL_SPEC, PAGE_SPEC, _load_fixture_params

    from ..data.synth import generate_page
    from ..inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from ..inference.eval import evaluate_char_detection

    params = _load_fixture_params()
    page = generate_page(PAGE_SPEC, np.random.default_rng([42, 0]))
    gt = [c.corners for c in page.chars]
    results = {}
    for name, dtype, prec in [
        ("f32", "float32", "highest"),
        ("bf16", "bfloat16", "default"),
    ]:
        engine = AdaptiveScalingInference(
            AdaptiveScalingInferenceConfig(
                model=MODEL_SPEC, compute_dtype=dtype, matmul_precision=prec
            ),
            params=params,
        )
        rough = engine.rough_infer(page.image)
        detect = engine.detect(page.image)
        metrics = evaluate_char_detection(
            detect["char_polygons"], gt, iou_thr=0.5
        )
        results[name] = (rough, metrics)
        print(
            f"{name}: F1={metrics.f1:.4f} P={metrics.precision:.4f} "
            f"R={metrics.recall:.4f}",
            flush=True,
        )

    r32, m32 = results["f32"]
    r16, m16 = results["bf16"]
    agree = float((r32.rough_char_mask == r16.rough_char_mask).mean())
    h32 = r32.rough_char_height_score_map
    h16 = r16.rough_char_height_score_map
    both = (h32 > 0) & (h16 > 0)
    print(f"mask agreement: {agree:.6f}")
    print(f"height max-abs-diff (both valid): {float(np.abs(h32 - h16)[both].max()):.4f}")
    print(
        "height median f32/bf16:",
        round(float(np.median(h32[h32 > 0])), 3),
        round(float(np.median(h16[h16 > 0])), 3),
    )
    print(f"dF1: {m16.f1 - m32.f1:+.4f}")


if __name__ == "__main__":
    main()
