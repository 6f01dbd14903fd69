"""Detection-quality evaluation of a trained checkpoint on HELD-OUT pages.

Drives the full two-stage pipeline (rough -> flatten/rescale/stack ->
precise -> polar build -> remap -> NMS) over freshly generated synthetic
pages whose rng stream is disjoint from the training/dev streams, and
reports char-level precision/recall/F1 (polygon IoU matching) plus rough
mask IoU and height-map calibration. This is the measurement the reference
never makes (its demo driver renders JPEGs for eyeballing,
experiment/adaptive_scaling/demo.py:178-220).

Usage:
  python -m adascale.tools.eval_checkpoint --run <train_output_dir> \
      --model-config model.json [--steps steps.json] [--num-pages 20]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import tempfile
from typing import Optional


def find_latest_checkpoint(run_dir: str) -> str:
    """Highest-epoch checkpoint dir (best ones preferred on ties)."""
    best = (-1, 1, None)  # (epoch, not_best_rank, path) — lower rank wins
    for name in os.listdir(run_dir):
        m = re.fullmatch(r"state_(\d+)(_not_best)?", name)
        if not m:
            continue
        epoch = int(m.group(1))
        rank = 1 if m.group(2) else 0
        cand = (epoch, -rank)
        if cand > (best[0], -best[1]):
            best = (epoch, rank, os.path.join(run_dir, name))
    if best[2] is None:
        raise FileNotFoundError(f"no state_<N> checkpoints under {run_dir}")
    return best[2]


def shift_page_config(base):
    """Generator knobs pushed OUTSIDE the training ranges (distribution-
    shift robustness probe, trained ranges in the flagship steps.json):
    char heights 8-110 vs trained 14-64, rotation to 40 deg vs 25,
    perspective 2.5x stronger and more frequent, double the noise, denser
    lines and tables, lower ink contrast."""
    import dataclasses

    return dataclasses.replace(
        base,
        char_height_min=8,
        char_height_max=110,
        num_lines_min=14,
        num_lines_max=30,
        line_rotate_prob=0.6,
        line_rotate_max_deg=40.0,
        perspective_prob=0.7,
        perspective_max_ratio=0.05,
        noise_sigma=16.0,
        ink_gray_max=130,
        background_gray_min=160,
        ruled_line_prob=0.5,
        table_prob=0.4,
        vignette_prob=0.7,
    )


def evaluate(
    checkpoint_path: str,
    model_config_json: str,
    steps_json: Optional[str] = None,
    num_pages: int = 20,
    heldout_seed: int = 9999,
    compute_dtype: str = "float32",
    page_size: int = 768,
    direct: bool = True,
    shift: bool = False,
    fixtures_dir: Optional[str] = None,
    pallas: bool = False,
) -> dict:
    import numpy as np

    from ..data.dataset import SynthPipelineConfig
    from ..data.synth import SynthPageConfig, generate_page
    from ..inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from ..inference.eval import evaluate_char_detection, evaluate_rough_mask
    from ..models import AdaptiveScalingConfig
    from ..training.loop import export_inference_artifact
    from ..utils.config import load_config

    if steps_json is not None:
        page_config = load_config(steps_json, SynthPipelineConfig).page
    else:
        page_config = SynthPageConfig(page_height=page_size, page_width=page_size)
    if shift:
        page_config = shift_page_config(page_config)
        heldout_seed = heldout_seed + 777000  # disjoint from the in-dist stream

    if checkpoint_path.endswith(".npz"):
        # Compact committed weights (tools/export_params.py) load straight
        # into the engine — the fresh-clone path: no orbax dir required.
        params_path = checkpoint_path
    else:
        artifact = export_inference_artifact(
            checkpoint_path, tempfile.mkdtemp(prefix="adascale_eval_"), model_config_json
        )
        params_path = os.path.join(artifact, "params")
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            checkpoint=params_path,
            model=load_config(model_config_json, AdaptiveScalingConfig),
            compute_dtype=compute_dtype,
            matmul_precision="highest" if compute_dtype == "float32" else "default",
            use_pallas_backbone=pallas,
            use_pallas_neck_heads=pallas,
        )
    )

    tp = fp = fn = 0
    dtp = dfp = dfn = 0
    mious, herrs = [], []
    for i in range(num_pages):
        page = generate_page(page_config, np.random.default_rng([heldout_seed, i]))
        if not page.chars:
            continue
        gt_corners = [c.corners for c in page.chars]
        if direct:
            # Precise pass straight on the page (no flatten/stack/remap):
            # isolates model quality from the host geometry chain, so the
            # report shows chain and direct numbers side by side.
            pr = engine.precise_infer(page.image)
            ys, xs = np.nonzero(pr.precise_peak_mask)
            polys = [
                engine.precise_build_polygon(pr, int(y), int(x))
                for y, x in zip(ys, xs)
            ]
            dm = evaluate_char_detection(polys, gt_corners, iou_thr=0.5)
            dtp += dm.num_matched
            dfp += dm.num_pred - dm.num_matched
            dfn += dm.num_gt - dm.num_matched
        result = engine.detect(page.image)
        m = evaluate_char_detection(result["char_polygons"], gt_corners, iou_thr=0.5)
        tp += m.num_matched
        fp += m.num_pred - m.num_matched
        fn += m.num_gt - m.num_matched
        rough = result["rough"]
        mious.append(
            evaluate_rough_mask(
                rough.rough_char_mask,
                page.chars,
                page.image.shape[:2],
                valid_shape=rough.resized_shape,
            )
        )
        hm = rough.rough_char_height_score_map
        if np.any(hm > 0):
            # Height calibration in the RESIZED frame the head predicts in.
            # The prediction median is over PIXELS, so weight each GT char
            # by its area (big chars cover quadratically more pixels) to
            # compare like with like.
            scale = rough.resized_image_shape[0] / page.image.shape[0]
            heights = np.asarray([c.height for c in page.chars])
            widths = np.asarray(
                [np.linalg.norm(c.corners[1] - c.corners[0]) for c in page.chars]
            )
            order = np.argsort(heights)
            cum = np.cumsum((heights * widths)[order])
            gt_med = float(heights[order][np.searchsorted(cum, cum[-1] / 2)]) * scale
            herrs.append(abs(float(np.median(hm[hm > 0])) - gt_med) / max(gt_med, 1e-6))

    def _prf(tp_, fp_, fn_):
        p = tp_ / max(tp_ + fp_, 1)
        r = tp_ / max(tp_ + fn_, 1)
        return p, r, 2 * p * r / max(p + r, 1e-9)

    fix_metrics = None
    if fixtures_dir and os.path.isdir(fixtures_dir):
        # Real-FONT fixture pages (tools/shift_fixtures.py): DejaVu glyphs,
        # scan skew, JPEG artifacts — a glyph distribution training never
        # produced.
        from ..data.synth import CharInstance

        ftp = ffp = ffn = 0
        fmious = []
        files = sorted(
            f for f in os.listdir(fixtures_dir) if f.endswith(".npz")
        )
        for name in files:
            data = np.load(os.path.join(fixtures_dir, name))
            image = data["image"]
            quads = data["corners"]
            result = engine.detect(image)
            m = evaluate_char_detection(
                result["char_polygons"], list(quads), iou_thr=0.5
            )
            ftp += m.num_matched
            ffp += m.num_pred - m.num_matched
            ffn += m.num_gt - m.num_matched
            chars = [
                CharInstance(corners=q, height=float(h))
                for q, h in zip(quads, data["heights"])
            ]
            rough = result["rough"]
            fmious.append(
                evaluate_rough_mask(
                    rough.rough_char_mask,
                    chars,
                    image.shape[:2],
                    valid_shape=rough.resized_shape,
                )
            )
        if files:
            fp_, fr_, ff1_ = _prf(ftp, ffp, ffn)
            fix_metrics = {
                "font_fixture_pages": len(files),
                "font_fixture_precision": round(fp_, 4),
                "font_fixture_recall": round(fr_, 4),
                "font_fixture_f1": round(ff1_, 4),
                "font_fixture_rough_miou": round(float(np.mean(fmious)), 4),
            }

    precision, recall, f1 = _prf(tp, fp, fn)
    out = {
        "checkpoint": checkpoint_path,
        "num_pages": num_pages,
        "char_precision": round(precision, 4),
        "char_recall": round(recall, 4),
        "char_f1": round(f1, 4),
        "rough_mask_miou": round(float(np.mean(mious)), 4) if mious else None,
        "height_median_rel_err": round(float(np.mean(herrs)), 4) if herrs else None,
    }
    if shift:
        out["shift"] = True
    if direct:
        dp, dr, df1 = _prf(dtp, dfp, dfn)
        out["direct_char_precision"] = round(dp, 4)
        out["direct_char_recall"] = round(dr, 4)
        out["direct_char_f1"] = round(df1, 4)
    if fix_metrics:
        out.update(fix_metrics)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", help="training output folder (picks latest state_<N>)")
    parser.add_argument("--checkpoint", help="explicit checkpoint dir")
    parser.add_argument("--model-config", required=True)
    parser.add_argument("--steps", help="synth pipeline steps.json for the page spec")
    parser.add_argument("--num-pages", type=int, default=20)
    parser.add_argument("--seed", type=int, default=9999)
    parser.add_argument("--compute-dtype", default="float32")
    parser.add_argument(
        "--no-direct",
        action="store_true",
        help="skip the direct precise-pass comparison (chain metrics only)",
    )
    parser.add_argument(
        "--shift",
        action="store_true",
        help="distribution-shift mode: generator knobs pushed outside the "
        "training ranges, plus real-font fixture pages if present",
    )
    parser.add_argument(
        "--pallas",
        action="store_true",
        help="serve through the fused Pallas path (backbone + FPN neck/"
        "heads kernels) — quality A/B for the TPU serving configuration",
    )
    parser.add_argument(
        "--fixtures",
        default=None,
        help="directory of .npz fixture pages (default under --shift: "
        "tests/fixtures/shift_pages at the repo root)",
    )
    args = parser.parse_args()

    import jax

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    fixtures = args.fixtures
    if fixtures is None and args.shift:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cand = os.path.join(repo_root, "tests", "fixtures", "shift_pages")
        fixtures = cand if os.path.isdir(cand) else None

    ckpt = args.checkpoint or find_latest_checkpoint(args.run)
    result = evaluate(
        ckpt,
        args.model_config,
        steps_json=args.steps,
        num_pages=args.num_pages,
        heldout_seed=args.seed,
        compute_dtype=args.compute_dtype,
        direct=not args.no_direct,
        shift=args.shift,
        fixtures_dir=fixtures,
        pallas=args.pallas,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
