"""Inference subsystem tests: flattener geometry, stacking packer, on-device
peak picking vs scipy, shape bucketing, and a two-stage E2E smoke run."""
import numpy as np
import pytest

import jax.numpy as jnp

from adascale.data.geometry import Box, Polygon
from adascale.inference import (
    AdaptiveScalingInference,
    AdaptiveScalingInferenceConfig,
    TextRegionFlattener,
    stack_flattened_text_regions,
)
from adascale.inference.engine import _max_filter_same
from adascale.inference.preprocess import compute_padded_shape, compute_rough_shapes
from adascale.models import (
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)


def test_compute_rough_shapes():
    # No downsample when short side <= 720.
    assert compute_rough_shapes(640, 640) == ((640, 640), (640, 640))
    # Downsample to short side 720, keep aspect, bucket to 64.
    (rh, rw), (ph, pw) = compute_rough_shapes(1440, 2160)
    assert rh == 720 and rw == 1080
    assert ph == 768 and pw == 1088
    assert ph % 32 == 0 and pw % 32 == 0
    assert compute_padded_shape(100, 70) == (128, 128)


def test_max_filter_matches_scipy():
    from scipy.ndimage import maximum_filter

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(33, 47)).astype(np.float32)
    got = np.asarray(_max_filter_same(jnp.asarray(x), 5))
    expected = maximum_filter(x, size=5, mode="constant", cval=-np.inf)
    np.testing.assert_allclose(got, expected)


def _rotated_rect_polygon(cx, cy, w, h, angle_deg):
    rad = np.deg2rad(angle_deg)
    rot = np.asarray([[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]])
    base = np.asarray([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
    return Polygon((base @ rot.T + np.asarray([cx, cy])).astype(np.float32))


def test_flattener_rotates_long_side_horizontal():
    image = np.full((200, 200, 3), 230, dtype=np.uint8)
    poly = _rotated_rect_polygon(100, 100, 120, 20, 30.0)
    flattener = TextRegionFlattener(
        typical_long_side_ratio_min=3.0,
        text_region_polygon_dilate_ratio=0.2,
        image=image,
        text_region_polygons=[poly],
    )
    (region,) = flattener.flattened_text_regions
    assert region.is_typical
    assert abs(region.flattening_rotate_angle) > 1.0
    # After flattening the long side must be horizontal.
    assert region.width > region.height * 2


def test_flattener_keeps_flat_regions():
    image = np.full((100, 300, 3), 230, dtype=np.uint8)
    poly = _rotated_rect_polygon(150, 50, 200, 30, 0.0)
    flattener = TextRegionFlattener(3.0, 0.2, image, [poly])
    (region,) = flattener.flattened_text_regions
    assert region.flattening_rotate_angle == 0.0
    assert region.width > region.height
    assert region.flattened_core_mask is None  # gating off by default here


def test_flattener_core_mask_is_tighter_and_survives_transforms():
    """The ownership (core) mask must be a strict subset of the dilated
    crop mask, follow the flattening rotation, and resize alongside the
    region — it is what precise_build_grouped_polygons gates peaks to."""
    image = np.full((200, 200, 3), 230, dtype=np.uint8)
    for angle in (0.0, 30.0):
        poly = _rotated_rect_polygon(100, 100, 120, 20, angle)
        flattener = TextRegionFlattener(
            typical_long_side_ratio_min=3.0,
            text_region_polygon_dilate_ratio=0.8,
            image=image,
            text_region_polygons=[poly],
            core_gate_dilate_ratio=0.2,
        )
        (region,) = flattener.flattened_text_regions
        core, full = region.flattened_core_mask, region.flattened_mask
        assert core is not None and core.shape == full.shape
        # Subset (up to rasterization jitter) and strictly smaller.
        assert int((core & ~full.astype(bool)).sum()) <= int(core.sum()) * 0.02
        assert 0 < core.sum() < full.sum()
        resized = region.to_resized_flattened_text_region(
            region.height * 2, region.width * 2
        )
        assert resized.flattened_core_mask.shape == resized.flattened_mask.shape
        assert resized.flattened_core_mask.sum() > 0


def test_stacking_packer():
    rng = np.random.default_rng(1)
    regions = []
    from adascale.inference.flatten import FlattenedTextRegion

    for i in range(7):
        h = int(rng.integers(10, 40))
        w = int(rng.integers(30, 160))
        img = np.full((h, w, 3), 100 + i, dtype=np.uint8)
        mask = np.ones((h, w), dtype=np.uint8)
        regions.append(
            FlattenedTextRegion(
                text_region_polygon=Polygon(np.zeros((3, 2))),
                bounding_extended_box=Box(0, h - 1, 0, w - 1),
                flattening_rotate_angle=0.0,
                rotated_trimmed_box=Box(0, h - 1, 0, w - 1),
                shape_before_resize=(h, w),
                flattened_image=img,
                flattened_mask=mask,
                is_typical=True,
            )
        )
    stacked, boxes = stack_flattened_text_regions(10, 2, regions)
    assert len(boxes) == 7
    for region, box in zip(regions, boxes):
        assert box.shape == region.shape
        assert box.valid_in(stacked.shape[:2])
        patch = box.extract(stacked)
        np.testing.assert_array_equal(patch, region.flattened_image)
    # Pairwise disjoint.
    occupancy = np.zeros(stacked.shape[:2], dtype=np.int32)
    for box in boxes:
        occupancy[box.up : box.down + 1, box.left : box.right + 1] += 1
    assert occupancy.max() == 1


def _micro_engine():
    model_config = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    config = AdaptiveScalingInferenceConfig(model=model_config, shape_bucket=64)
    import jax
    from adascale.models import AdaptiveScaling

    model = AdaptiveScaling(config=model_config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    return AdaptiveScalingInference(config, params=params)


def test_end_to_end_detect_smoke():
    engine = _micro_engine()
    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=256, page_width=256, num_lines_min=3, num_lines_max=5),
        np.random.default_rng(0),
    )
    result = engine.detect(page.image)
    rough = result["rough"]
    assert rough.rough_char_mask.shape == (128, 128)  # 256/2 (bucketed 256)
    assert rough.rough_char_height_score_map.dtype == np.float32
    assert isinstance(result["char_polygons"], list)


def test_rough_infer_zeroes_padding():
    engine = _micro_engine()
    image = np.full((200, 230, 3), 255, dtype=np.uint8)
    rough = engine.rough_infer(image)
    # Bucket 64 -> padded 256x256, features 128x128, valid ceil(200/2)=100 x 115.
    assert rough.padded_image_shape == (256, 256)
    assert rough.resized_shape == (100, 115)
    mask = rough.rough_char_mask
    assert mask[100:, :].sum() == 0
    assert mask[:, 115:].sum() == 0
    assert rough.rough_char_height_score_map[100:, :].sum() == 0


def test_merge_band_polygons_single_claim():
    """Band candidates are added once: near-duplicates of kept detections
    (and of earlier-accepted band candidates) are suppressed by center
    distance, distinct chars are kept."""
    import dataclasses

    import numpy as np

    from adascale.data.geometry import Polygon
    from adascale.inference.engine import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )

    eng = AdaptiveScalingInference.__new__(AdaptiveScalingInference)
    eng.config = dataclasses.replace(
        AdaptiveScalingInferenceConfig(),
        precise_band_recall_center_dist_ratio=0.7,
    )

    def quad(x0, y0, s=10.0, score=0.9):
        return Polygon(
            np.asarray(
                [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]],
                np.float32,
            ),
            score=score,
        )

    kept = [quad(0, 0)]
    band = [
        quad(2, 1, score=0.95),    # same char, slightly shifted -> suppressed
        quad(40, 0, score=0.9),    # distinct char -> added
        quad(41, 2, score=0.85),   # copy of the one just added -> suppressed
        quad(0, 40, score=0.8),    # distinct char -> added
    ]
    out = eng.merge_band_polygons(kept, band)
    assert len(out) == 3
    centers = sorted(tuple(np.round(p.points.mean(axis=0))) for p in out)
    assert centers == [(5.0, 5.0), (5.0, 45.0), (45.0, 5.0)]


def test_chunk_regions_by_area():
    """Stacked-area bound (engine._chunk_regions_by_area): consecutive
    grouping under the cap, oversize singletons allowed, None = one group."""
    import dataclasses as dc

    class FakeRegion:
        def __init__(self, h, w):
            self.height, self.width = h, w

    engine = _micro_engine()
    regions = [FakeRegion(100, 100)] * 10  # 1.5*10k = 15k est each

    eng_cap = dc.replace(engine.config, precise_stacked_image_max_area=40_000)
    engine.config = eng_cap
    chunks = engine._chunk_regions_by_area(regions)
    assert sum(len(c) for c in chunks) == 10
    assert all(len(c) <= 2 for c in chunks)  # 2*15k <= 40k < 3*15k

    # A single region above the cap still forms its own chunk.
    big = [FakeRegion(1000, 1000)]
    assert [len(c) for c in engine._chunk_regions_by_area(big)] == [1]

    engine.config = dc.replace(engine.config, precise_stacked_image_max_area=None)
    assert [len(c) for c in engine._chunk_regions_by_area(regions)] == [10]


def test_detect_multi_chunk_matches_single_stack():
    """Forcing a tiny stack cap must yield the same char polygons as the
    unbounded single-stack path (up to NMS order ties)."""
    import dataclasses as dc

    engine = _micro_engine()
    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=256, page_width=256, num_lines_min=3, num_lines_max=5),
        np.random.default_rng(3),
    )
    engine.config = dc.replace(engine.config, precise_stacked_image_max_area=None)
    single = engine.detect(page.image)
    assert single["num_precise_chunks"] == 1

    # Cap small enough to force >1 chunk whenever >=2 regions were found.
    engine.config = dc.replace(engine.config, precise_stacked_image_max_area=20_000)
    multi = engine.detect(page.image)
    if len(multi["regions"]) >= 2:
        assert multi["num_precise_chunks"] >= 2
    assert len(multi["char_polygons"]) == len(single["char_polygons"])
