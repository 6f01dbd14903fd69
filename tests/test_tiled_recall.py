"""Tiled full-resolution mode must recover small print that the default
short-side-720 resize destroys.

The reference pipeline unconditionally downsamples large pages before the
rough pass (inferencing/adaptive_scaling.py:96-107), so characters whose
post-resize height falls below the model's trained range become
undetectable. Our tiled mode (adascale/inference/tiled.py) keeps native
resolution by scanning overlapping tiles with an on-device stitch.

Fixture setup: the overfit micro model (tests/fixtures/
overfit_micro_params.npz) was trained at 384px on 20-36px chars. A 1536px
page with the same char heights resizes to short-side 720 -> chars at
~9-17px (out of distribution) for plain detect(), while tiled mode with
384px tiles sees them at native scale.
"""
import dataclasses

import numpy as np

from adascale.data.synth import generate_page
from adascale.inference import (
    AdaptiveScalingInference,
    AdaptiveScalingInferenceConfig,
)
from adascale.inference.eval import evaluate_char_detection

from test_detection_quality import MODEL_SPEC, PAGE_SPEC, _load_fixture_params


def test_tiled_mode_recovers_small_print():
    page_spec = dataclasses.replace(
        PAGE_SPEC,
        page_height=1536,
        page_width=1536,
        num_lines_min=10,
        num_lines_max=14,
    )
    page = generate_page(page_spec, np.random.default_rng([77, 0]))
    assert page.chars

    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            model=MODEL_SPEC,
            tiled_rough_tile_size=384,
            tiled_rough_tile_overlap=64,
        ),
        params=_load_fixture_params(),
    )
    gt = [c.corners for c in page.chars]

    resized = evaluate_char_detection(
        engine.detect(page.image, tiled=False)["char_polygons"], gt, iou_thr=0.5
    )
    tiled = evaluate_char_detection(
        engine.detect(page.image, tiled=True)["char_polygons"], gt, iou_thr=0.5
    )

    # The short-side-720 path sees ~9-17px chars (model trained on 20-36px);
    # tiled mode sees native scale. The win must be decisive, not noise.
    assert tiled.recall >= resized.recall + 0.15, (
        tiled.as_dict(),
        resized.as_dict(),
    )
    assert tiled.recall >= 0.55, tiled.as_dict()
    assert tiled.f1 >= resized.f1, (tiled.as_dict(), resized.as_dict())
