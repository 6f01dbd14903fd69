"""Data subsystem tests: geometry primitives, synth-page determinism
(the role of reference tests/test_training.py:38-78's golden RNG test),
label/reconstruction inverse consistency, and the dataset/collate contract."""
import numpy as np

from adascale.data import (
    AdaptiveScalingDatasetConfig,
    AdaptiveScalingIterableDataset,
    Box,
    Polygon,
    affine_polygons,
    collate_samples,
    generate_page,
    mask_to_disconnected_polygons,
    rotate_trans_mat,
)
from adascale.data.dataset import SynthPipelineConfig, run_pipeline
from adascale.data.synth import SynthPageConfig, char_regression_label, CharInstance


def _small_pipeline(**kw):
    defaults = dict(
        page=SynthPageConfig(
            page_height=256, page_width=256, num_lines_min=3, num_lines_max=6,
            char_height_min=10, char_height_max=28,
        ),
        rough_crop_size=128,
        rough_core_margin=8,
        precise_crop_size=96,
        precise_core_margin=4,
        rough_samples_per_page=2,
        precise_samples_per_page=3,
    )
    defaults.update(kw)
    return SynthPipelineConfig(**defaults)


def test_box_and_polygon_basics():
    box = Box(2, 5, 3, 7)
    assert box.shape == (4, 5)
    mat = np.arange(100).reshape(10, 10)
    assert box.extract(mat).shape == (4, 5)
    assert box.extract(mat)[0, 0] == 23

    poly = Polygon(np.asarray([[2, 2], [8, 2], [8, 6], [2, 6]], dtype=np.float32))
    assert poly.area() == 24
    mask = poly.fill_mask((10, 10))
    assert mask.sum() > 0
    bb = poly.bounding_box()
    assert (bb.up, bb.down, bb.left, bb.right) == (2, 6, 2, 8)

    resized = poly.to_conducted_resized_polygon((10, 10), (20, 40))
    np.testing.assert_allclose(resized.points[1], [32, 4])


def test_mask_to_disconnected_polygons():
    mask = np.zeros((40, 40), dtype=np.uint8)
    mask[5:15, 5:15] = 1
    mask[25:35, 20:38] = 1
    polys = mask_to_disconnected_polygons(mask)
    assert len(polys) == 2
    reconstructed = np.zeros((40, 40), dtype=np.uint8)
    for p in polys:
        reconstructed |= p.fill_mask((40, 40))
    # Contours should cover most of the original components.
    assert (reconstructed & mask).sum() / mask.sum() > 0.8


def test_affine_rotate_roundtrip():
    shape = (30, 50)
    mat = rotate_trans_mat(33.0, shape)
    poly = Polygon(np.asarray([[4, 5], [40, 6], [41, 25], [3, 24]], dtype=np.float32))
    full = np.vstack([mat, [0, 0, 1]]).astype(np.float32)
    rotated = affine_polygons(full, [poly])[0]
    inv = np.linalg.inv(full)
    restored = affine_polygons(inv, [rotated])[0]
    np.testing.assert_allclose(restored.points, poly.points, atol=1e-3)


def test_synth_page_determinism():
    cfg = _small_pipeline()
    r1 = run_pipeline(cfg, rng_seed=7, run_idx=3)
    r2 = run_pipeline(cfg, rng_seed=7, run_idx=3)
    r3 = run_pipeline(cfg, rng_seed=7, run_idx=4)

    np.testing.assert_array_equal(r1[0][0].image, r2[0][0].image)
    np.testing.assert_array_equal(r1[0][0].downsampled_mask, r2[0][0].downsampled_mask)
    assert not np.array_equal(r1[0][0].image, r3[0][0].image)
    # rng_state regenerates the sample (provenance parity).
    assert r1[0][0].rng_state == {"rng_seed": 7, "run_idx": 3}


def test_char_regression_label_polar_inverse():
    """The label must invert exactly under the inference-side polar
    reconstruction (reference inferencing/adaptive_scaling.py:398-465)."""
    rng = np.random.default_rng(0)
    f = 2
    for _ in range(50):
        # Random convex-ish quad around a center.
        cy, cx = rng.uniform(20, 40, size=2)
        h = rng.uniform(6, 20)
        w = rng.uniform(4, 16)
        angle = rng.uniform(-0.6, 0.6)
        rot = np.asarray(
            [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
        )
        base = np.asarray(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        corners = (base @ rot.T + np.asarray([cx, cy])).astype(np.float32)
        char = CharInstance(corners=corners, height=h)

        label = char_regression_label(char, f, (40, 40))
        assert label is not None
        py, px, ul_off, angles, distances = label

        # Polar reconstruction.
        point = np.asarray([px * f, py * f], dtype=np.float64)
        up_left = point + np.asarray([ul_off[1], ul_off[0]])
        np.testing.assert_allclose(up_left, corners[0], atol=1e-3)

        theta = np.arctan2(ul_off[0], ul_off[1]) % (2 * np.pi)
        rec = [up_left]
        for i in range(3):
            theta = (theta + angles[i] * 2 * np.pi) % (2 * np.pi)
            rec.append(
                point + distances[i + 1] * np.asarray([np.cos(theta), np.sin(theta)])
            )
        np.testing.assert_allclose(np.asarray(rec), corners, atol=1e-2)


def _steps_json(tmp_path):
    from adascale.utils.config import dump_config

    path = tmp_path / "steps.json"
    dump_config(_small_pipeline(), path)
    return str(path)


def test_dataset_dev_mode_and_collate(tmp_path):
    cfg = AdaptiveScalingDatasetConfig(
        steps_json=_steps_json(tmp_path),
        num_samples=4,
        num_page_char_regression_labels=16,
        rng_seed=11,
        is_dev=True,
    )
    ds = AdaptiveScalingIterableDataset(cfg)
    pairs = list(ds)
    assert len(pairs) == 4

    batch = collate_samples(pairs)
    rough, precise = batch["rough"], batch["precise"]
    assert rough["image"].shape == (4, 128, 128, 3)
    assert rough["downsampled_mask"].shape == (4, 48, 48)  # 64 - 2*8 margin
    assert rough["downsampled_score_map"].dtype == np.float32
    assert rough["downsampled_shape"] == (64, 64)

    assert precise["image"].shape == (4, 96, 96, 3)
    assert precise["downsampled_mask"].shape == (4, 40, 40)  # 48 - 2*4
    assert precise["downsampled_label_point_y"].shape == (4, 16)
    assert precise["up_left_offsets"].shape == (4, 16, 2)
    assert precise["corner_angles"].shape == (4, 16, 4)
    np.testing.assert_allclose(precise["corner_angles"].sum(-1), 1.0, atol=1e-4)
    assert precise["corner_distances"].shape == (4, 16, 3)
    cb = precise["downsampled_core_box"]
    assert (cb.up, cb.down, cb.left, cb.right) == (4, 43, 4, 43)


def test_precise_to_rough_rebalancing():
    """enable_transform_precise_to_rough moves (n_p+n_r)//2 - n_r shuffled
    text-region crops into the rough stream with the char-HEIGHT map as
    score map (reference dataset/adaptive_scaling.py:106-128)."""
    base = dict(
        rough_crop_size=96,
        rough_core_margin=4,
        precise_crop_size=96,
        precise_core_margin=4,
        rough_samples_per_page=1,
        precise_samples_per_page=5,
    )
    off = _small_pipeline(**base)
    on = _small_pipeline(**base, enable_transform_precise_to_rough=True)

    rough_off, precise_off = run_pipeline(off, rng_seed=21, run_idx=0)
    rough_on, precise_on = run_pipeline(on, rng_seed=21, run_idx=0)

    n_move = max(
        0, (len(precise_off) + len(rough_off)) // 2 - len(rough_off)
    )
    assert n_move > 0  # this seed must actually exercise the transform
    assert len(rough_on) == len(rough_off) + n_move
    assert len(precise_on) == len(precise_off) - n_move
    # Total sample count is conserved.
    assert len(rough_on) + len(precise_on) == len(rough_off) + len(precise_off)
    # Streams end up balanced (within 1 for odd totals).
    assert abs(len(rough_on) - len(precise_on)) <= 1

    for moved in rough_on[len(rough_off):]:
        # A height map, not the precise gaussian (gaussian peaks at 1.0).
        assert moved.downsampled_score_map.max() > 1.01
        assert moved.image.shape == rough_on[0].image.shape
        assert moved.downsampled_mask.shape == rough_on[0].downsampled_mask.shape


def test_num_samples_reset_rng_fixed_set(tmp_path):
    """num_samples_reset_rng counts SAMPLES: the stream must cycle a fixed
    set of exactly that many pairs (overfit mode, reference
    train.py:263-275 + dataset/adaptive_scaling.py:168-226)."""
    reset = 4
    cfg = AdaptiveScalingDatasetConfig(
        steps_json=_steps_json(tmp_path),
        num_samples=3 * reset,
        num_page_char_regression_labels=8,
        rng_seed=5,
        num_samples_reset_rng=reset,
    )
    ds = AdaptiveScalingIterableDataset(cfg)
    pairs = list(ds)
    assert len(pairs) == 3 * reset
    for i in range(2 * reset):
        np.testing.assert_array_equal(pairs[i][0].image, pairs[i + reset][0].image)
        np.testing.assert_array_equal(pairs[i][1].image, pairs[i + reset][1].image)
        assert pairs[i][0].rng_state == pairs[i + reset][0].rng_state
    # The fixed set has the configured cardinality: period is exactly
    # `reset`, not shorter.
    assert any(
        not np.array_equal(pairs[0][0].image, pairs[j][0].image)
        for j in range(1, reset)
    )


def test_dataset_train_streaming(tmp_path):
    cfg = AdaptiveScalingDatasetConfig(
        steps_json=_steps_json(tmp_path),
        num_samples=5,
        num_page_char_regression_labels=8,
        rng_seed=3,
        num_cached_runs=2,
    )
    ds = AdaptiveScalingIterableDataset(cfg)
    pairs = list(ds)
    assert len(pairs) == 5
    for rough, precise in pairs:
        assert rough.image.shape == (128, 128, 3)
        assert len(precise.char_labels) == 8


def test_sample_reuse_interleaves_repeats(tmp_path):
    """sample_reuse=2: each generated pair is served ~twice via the shuffled
    replay buffer (halving generation CPU per consumed pair), with the
    precise P-label subset re-drawn independently per yield."""
    from collections import Counter

    cfg = AdaptiveScalingDatasetConfig(
        steps_json=_steps_json(tmp_path),
        num_samples=32,
        num_page_char_regression_labels=8,
        rng_seed=7,
        num_cached_runs=2,
        sample_reuse=2,
    )
    ds = AdaptiveScalingIterableDataset(cfg)
    pairs = list(ds)
    assert len(pairs) == 32

    rough_counts = Counter(id(r.image) for r, _ in pairs)
    # Roughly half the stream should be replays (allow scheduling noise and
    # replays dropped at stream end).
    num_replayed = sum(v - 1 for v in rough_counts.values())
    assert 8 <= num_replayed <= 16, dict(rough_counts)
    # Unique generation work is substantially below the reuse=1 stream.
    assert len(rough_counts) <= 24

    # A replayed precise sample re-draws its label subset: find a repeat and
    # check the label lists are independent objects (and almost surely
    # different draws when the page has more chars than P).
    by_image = {}
    for _, p in pairs:
        by_image.setdefault(id(p.image), []).append(p)
    repeats = [v for v in by_image.values() if len(v) >= 2]
    assert repeats
    a, b = repeats[0][0], repeats[0][1]
    assert a.char_labels is not b.char_labels


def test_sample_reuse_off_stream_unchanged(tmp_path):
    """reuse=1 must be bit-identical to the historical stream (no extra rng
    draws) — pinned by comparing against an explicitly-default config."""
    kwargs = dict(
        steps_json=_steps_json(tmp_path),
        num_samples=6,
        num_page_char_regression_labels=8,
        rng_seed=19,
        num_cached_runs=2,
    )
    base = list(AdaptiveScalingIterableDataset(AdaptiveScalingDatasetConfig(**kwargs)))
    off = list(
        AdaptiveScalingIterableDataset(
            AdaptiveScalingDatasetConfig(**kwargs, sample_reuse=1)
        )
    )
    for (r0, p0), (r1, p1) in zip(base, off):
        np.testing.assert_array_equal(r0.image, r1.image)
        np.testing.assert_array_equal(p0.image, p1.image)
        for l0, l1 in zip(p0.char_labels, p1.char_labels):
            assert l0[0] == l1[0] and l0[1] == l1[1]
