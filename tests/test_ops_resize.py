"""Parity tests for resize/pool primitives vs torch/cv2 semantics.

These pin the interpolation conventions that the 1e-3 model-parity bar
depends on (SURVEY.md §7 "hard parts": F.interpolate nearest vs bilinear
pixel-grid conventions, cv2 INTER_AREA, AdaptiveAvgPool2d).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from adascale.ops import (
    adaptive_avg_pool,
    area_downsample,
    pad_length_to_make_divisible,
    pad_to_divisible,
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_nhwc(rng, b, h, w, c):
    return rng.standard_normal((b, h, w, c)).astype(np.float32)


def _to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _from_nchw(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),
    ((8, 8), (32, 32)),
    ((5, 7), (13, 11)),
    ((16, 16), (5, 9)),
])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = _rand_nhwc(rng, 2, *in_hw, 3)
    expected = _from_nchw(F.interpolate(_to_nchw(x), size=out_hw, mode="nearest"))
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, expected)


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(1)
    x = _rand_nhwc(rng, 1, 6, 5, 4)
    expected = _from_nchw(F.interpolate(_to_nchw(x), scale_factor=2, mode="nearest"))
    got = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),
    ((1, 1), (7, 5)),
    ((5, 7), (13, 11)),
    ((4, 4), (8, 8)),
])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(2)
    x = _rand_nhwc(rng, 2, *in_hw, 3)
    expected = _from_nchw(
        F.interpolate(_to_nchw(x), size=out_hw, mode="bilinear", align_corners=False)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_size", [
    ((12, 12), 1),
    ((12, 12), 2),
    ((13, 17), 3),
    ((13, 17), 6),
])
def test_adaptive_avg_pool_matches_torch(in_hw, out_size):
    rng = np.random.default_rng(3)
    x = _rand_nhwc(rng, 2, *in_hw, 3)
    expected = _from_nchw(torch.nn.AdaptiveAvgPool2d(out_size)(_to_nchw(x)))
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_size))
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (32, 32)),
    ((100, 70), (72, 50)),
    ((97, 53), (72, 39)),
])
def test_area_downsample_matches_cv2(in_hw, out_hw):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, size=(*in_hw, 3)).astype(np.float32)
    expected = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(area_downsample(jnp.asarray(img[None]), out_hw))[0]
    np.testing.assert_allclose(got, expected, atol=1e-2)


def test_pad_length():
    # Mirrors reference tests/test_evaluation.py:15-22 semantics.
    assert pad_length_to_make_divisible(64, 32) == (64, 0)
    assert pad_length_to_make_divisible(65, 32) == (96, 31)
    assert pad_length_to_make_divisible(1, 32) == (32, 31)


def test_pad_to_divisible():
    x = jnp.ones((1, 65, 33, 3))
    y = pad_to_divisible(x, 32)
    assert y.shape == (1, 96, 64, 3)
    assert float(y[0, 64, 0, 0]) == 1.0
    assert float(y[0, 65, 0, 0]) == 0.0
    assert float(y[0, 0, 33, 0]) == 0.0


def test_compute_rough_shapes_edges():
    """Shape-bucket policy edges (reference short-side-720 rule,
    inferencing/adaptive_scaling.py:96-107)."""
    from adascale.inference.preprocess import compute_rough_shapes

    # Small page: no downsample, snapped up to the bucket.
    (rh, rw), (ph, pw) = compute_rough_shapes(100, 130)
    assert (rh, rw) == (100, 130) and ph % 64 == 0 and pw % 64 == 0
    # Exactly 720 short side: not downsampled (rule is strict >).
    (rh, rw), _ = compute_rough_shapes(720, 2000)
    assert (rh, rw) == (720, 2000)
    # Large page: short side scaled to 720, aspect preserved.
    (rh, rw), (ph, pw) = compute_rough_shapes(1440, 2880)
    assert rh == 720 and rw == 1440
    assert ph >= rh and pw >= rw and ph % 32 == 0 and pw % 32 == 0


def test_dynamic_weight_builders_match_static():
    """The symbolic-dim-safe weight builders (used only under polymorphic
    export tracing) must produce the exact static matrices for every size
    pair the PPM/ladder uses — plus awkward non-divisible pairs."""
    from adascale.ops.resize import (
        _adaptive_pool_weights,
        _adaptive_pool_weights_dynamic,
        _linear_weights,
        _linear_weights_dynamic,
    )

    for ins, outs in [(1, 7), (7, 1), (2, 6), (6, 2), (20, 40), (40, 20),
                      (13, 29), (64, 6), (6, 64), (1, 1), (5, 5)]:
        np.testing.assert_allclose(
            _linear_weights(ins, outs),
            np.asarray(_linear_weights_dynamic(ins, outs)),
            atol=1e-6, err_msg=f"linear {ins}->{outs}",
        )
    for ins, outs in [(2, 6), (3, 6), (40, 6), (13, 3), (7, 1), (6, 6), (100, 2)]:
        np.testing.assert_allclose(
            _adaptive_pool_weights(ins, outs),
            np.asarray(_adaptive_pool_weights_dynamic(ins, outs)),
            atol=1e-6, err_msg=f"pool {ins}->{outs}",
        )
