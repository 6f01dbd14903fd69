"""Tiled-mode recall proof on high-resolution small-print pages.

The reference pipeline downsamples every page to short-side 720 before the
rough pass (/root/reference/vkit_open_model/inferencing/adaptive_scaling.py:96-107),
so a 2048px scan with ~8-14px characters lands at ~3-5px per char — below
the detector's resolving power. Our tiled mode (adascale/inference/tiled.py)
runs the rough pass at FULL resolution over overlapping tiles with an
on-device stitch instead. This tool measures what that buys: char
recall/F1 of `detect()` (short-side-720 resize, the reference's operating
point) vs `detect(tiled=True)` on the same generated pages.

Usage:
  python -m adascale.tools.tiled_recall --checkpoint <state_dir> \
      --model-config model.json [--num-pages 8] [--page-size 2048] \
      [--char-min 8 --char-max 14]

Prints one JSON line with both settings' metrics.
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile


def evaluate_tiled_recall(
    checkpoint_path: str,
    model_config_json: str,
    num_pages: int = 8,
    page_size: int = 2048,
    char_min: int = 8,
    char_max: int = 14,
    seed: int = 4242,
    compute_dtype: str = "float32",
) -> dict:
    import numpy as np

    from ..data.synth import SynthPageConfig, generate_page
    from ..inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from ..inference.eval import evaluate_char_detection
    from ..models import AdaptiveScalingConfig
    from ..training.loop import export_inference_artifact
    from ..utils.config import load_config

    # Dense small print filling a large scan: many lines, tiny glyphs.
    page_config = SynthPageConfig(
        page_height=page_size,
        page_width=page_size,
        num_lines_min=int(page_size * 0.55 / (char_max * 1.4)),
        num_lines_max=int(page_size * 0.8 / (char_max * 1.4)),
        char_height_min=char_min,
        char_height_max=char_max,
    )

    artifact = export_inference_artifact(
        checkpoint_path, tempfile.mkdtemp(prefix="adascale_tiled_"), model_config_json
    )
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            checkpoint=os.path.join(artifact, "params"),
            model=load_config(model_config_json, AdaptiveScalingConfig),
            compute_dtype=compute_dtype,
            matmul_precision="highest" if compute_dtype == "float32" else "default",
        )
    )

    counts = {False: [0, 0, 0], True: [0, 0, 0]}  # tiled -> [tp, fp, fn]
    total_chars = 0
    for i in range(num_pages):
        page = generate_page(page_config, np.random.default_rng([seed, i]))
        if not page.chars:
            continue
        total_chars += len(page.chars)
        gt = [c.corners for c in page.chars]
        for tiled in (False, True):
            m = evaluate_char_detection(
                engine.detect(page.image, tiled=tiled)["char_polygons"],
                gt,
                iou_thr=0.5,
            )
            counts[tiled][0] += m.num_matched
            counts[tiled][1] += m.num_pred - m.num_matched
            counts[tiled][2] += m.num_gt - m.num_matched

    def metrics(tp, fp, fn):
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        return {
            "precision": round(p, 4),
            "recall": round(r, 4),
            "f1": round(2 * p * r / max(p + r, 1e-9), 4),
        }

    return {
        "checkpoint": checkpoint_path,
        "num_pages": num_pages,
        "page_size": page_size,
        "char_height_range": [char_min, char_max],
        "total_gt_chars": total_chars,
        "resized_720": metrics(*counts[False]),
        "tiled_full_res": metrics(*counts[True]),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model-config", required=True)
    parser.add_argument("--num-pages", type=int, default=8)
    parser.add_argument("--page-size", type=int, default=2048)
    parser.add_argument("--char-min", type=int, default=8)
    parser.add_argument("--char-max", type=int, default=14)
    parser.add_argument("--seed", type=int, default=4242)
    parser.add_argument("--compute-dtype", default="float32")
    args = parser.parse_args()

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(
        json.dumps(
            evaluate_tiled_recall(
                args.checkpoint,
                args.model_config,
                num_pages=args.num_pages,
                page_size=args.page_size,
                char_min=args.char_min,
                char_max=args.char_max,
                seed=args.seed,
                compute_dtype=args.compute_dtype,
            )
        )
    )


if __name__ == "__main__":
    main()
