"""Loss tests: torch-formula parity for primitives + gradient-flow and
structure tests for the composite losses (mirrors reference
tests/test_loss_function.py:17-33 and test_adaptive_scaling.py:91-100,119-176)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.losses import (
    AdaptiveScalingPreciseLossConfig,
    AdaptiveScalingRoughLossConfig,
    CoreBox,
    cross_entropy_with_logits_loss,
    dice_loss,
    focal_with_logits_loss,
    get_label_point_feature,
    l1_loss,
    l2_loss,
    precise_loss,
    rough_loss,
    wahr_loss,
    weighted_bce_with_logits_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_weighted_bce_matches_torch_ohem():
    rng = np.random.default_rng(0)
    pred = _rand(rng, 2, 16, 16)
    gt = (rng.uniform(size=(2, 16, 16)) > 0.7).astype(np.float32)

    # Replicate reference weighted_bce_with_logits.py:24-54 semantics in torch.
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    pos_count = int(tg.sum())
    neg_count = min(round(pos_count * 3.0), int((1 - tg).sum()))
    loss = F.binary_cross_entropy_with_logits(tp, tg, reduction="none")
    pos_sum = float((loss * tg).sum())
    neg_loss = (loss * (1 - tg)).view(-1)
    neg_sum = float(torch.topk(neg_loss, neg_count).values.sum())
    expected = (pos_sum + neg_sum) / (pos_count + neg_count + 1e-6)

    got = float(weighted_bce_with_logits_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_matches_torchvision_formula():
    rng = np.random.default_rng(1)
    pred = _rand(rng, 2, 8, 8)
    gt = (rng.uniform(size=(2, 8, 8)) > 0.5).astype(np.float32)

    # torchvision.ops.sigmoid_focal_loss formula, alpha=0.25, gamma=2.
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    p = torch.sigmoid(tp)
    ce = F.binary_cross_entropy_with_logits(tp, tg, reduction="none")
    p_t = p * tg + (1 - p) * (1 - tg)
    loss = ce * (1 - p_t) ** 2
    alpha_t = 0.25 * tg + 0.75 * (1 - tg)
    expected = float((alpha_t * loss).mean())

    got = float(focal_with_logits_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # Masked variant.
    mask = (rng.uniform(size=(2, 8, 8)) > 0.5).astype(np.float32)
    masked = alpha_t * loss * torch.from_numpy(mask)
    expected_m = float(masked.sum() / (mask.sum() + 1e-6))
    got_m = float(
        focal_with_logits_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got_m, expected_m, rtol=1e-5)


def test_l1_smooth_matches_torch():
    rng = np.random.default_rng(2)
    pred, gt = _rand(rng, 4, 7), _rand(rng, 4, 7)
    for beta in (1.0, 2.5, 0.25):
        expected = float(
            F.smooth_l1_loss(torch.from_numpy(pred), torch.from_numpy(gt), beta=beta)
        )
        got = float(l1_loss(jnp.asarray(pred), jnp.asarray(gt), smooth=True, smooth_beta=beta))
        np.testing.assert_allclose(got, expected, rtol=1e-5)
    expected = float(F.l1_loss(torch.from_numpy(pred), torch.from_numpy(gt)))
    got = float(l1_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_l2_dice_wahr_match_torch():
    rng = np.random.default_rng(3)
    pred = rng.uniform(size=(3, 9)).astype(np.float32)
    gt = rng.uniform(size=(3, 9)).astype(np.float32)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)

    np.testing.assert_allclose(
        float(l2_loss(jnp.asarray(pred), jnp.asarray(gt))),
        float(F.mse_loss(tp, tg)),
        rtol=1e-5,
    )
    inter = float((tp * tg).sum())
    union = float(tp.sum() + tg.sum()) + 1e-6
    np.testing.assert_allclose(
        float(dice_loss(jnp.asarray(pred), jnp.asarray(gt))),
        1 - 2 * inter / union,
        rtol=1e-5,
    )
    soft = tg**0.01
    weight = soft * (1 - tp) + (1 - soft) * tp
    expected_wahr = float((weight * F.mse_loss(tp, tg, reduction="none")).mean())
    np.testing.assert_allclose(
        float(wahr_loss(jnp.asarray(pred), jnp.asarray(gt))), expected_wahr, rtol=1e-5
    )


def test_cross_entropy_soft_targets_matches_torch():
    rng = np.random.default_rng(4)
    pred = _rand(rng, 2, 4, 10)  # (B, C, P)
    gt = rng.dirichlet(np.ones(4), size=(2, 10)).transpose(0, 2, 1).astype(np.float32)
    expected = float(F.cross_entropy(torch.from_numpy(pred), torch.from_numpy(gt)))
    got = float(
        cross_entropy_with_logits_loss(jnp.asarray(pred), jnp.asarray(gt), class_axis=1)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_get_label_point_feature():
    # Mirrors reference tests/test_adaptive_scaling.py:91-100 in NHWC.
    rng = np.random.default_rng(5)
    feature = _rand(rng, 2, 64, 32, 4)
    y = rng.integers(0, 64, size=(2, 20))
    x = rng.integers(0, 32, size=(2, 20))
    out = get_label_point_feature(jnp.asarray(feature), jnp.asarray(y), jnp.asarray(x))
    assert out.shape == (2, 20, 4)
    for b in range(2):
        for p in range(20):
            np.testing.assert_array_equal(np.asarray(out[b, p]), feature[b, y[b, p], x[b, p]])


def _rough_inputs(rng, b=2, h=32, w=32, core=CoreBox(2, 29, 3, 28)):
    mask_logits = _rand(rng, b, h, w, 1)
    height = np.abs(_rand(rng, b, h, w, 1)) * 5 + 0.5
    gt_mask = (rng.uniform(size=(b, core.height, core.width)) > 0.5).astype(np.float32)
    gt_score = (rng.uniform(size=(b, core.height, core.width)) * 10).astype(np.float32)
    return mask_logits, height, gt_mask, gt_score, core


def test_rough_loss_gradient_flow():
    rng = np.random.default_rng(6)
    mask_logits, height, gt_mask, gt_score, core = _rough_inputs(rng)

    def fn(ml, h):
        return rough_loss(ml, h, jnp.asarray(gt_mask), jnp.asarray(gt_score), core)

    loss, grads = jax.value_and_grad(fn, argnums=(0, 1))(
        jnp.asarray(mask_logits), jnp.asarray(height)
    )
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)


def test_rough_loss_bce_branch():
    rng = np.random.default_rng(7)
    mask_logits, height, gt_mask, gt_score, core = _rough_inputs(rng)
    cfg = AdaptiveScalingRoughLossConfig(bce_factor=1.0)
    loss = rough_loss(
        jnp.asarray(mask_logits), jnp.asarray(height),
        jnp.asarray(gt_mask), jnp.asarray(gt_score), core, cfg,
    )
    assert np.isfinite(float(loss))


def test_precise_loss_gradient_flow():
    rng = np.random.default_rng(8)
    b, h, w, p = 2, 32, 32, 16
    core = CoreBox(2, 29, 3, 28)
    prob = _rand(rng, b, h, w, 1)
    offset = _rand(rng, b, h, w, 2)
    angle = _rand(rng, b, h, w, 4)
    distance = np.abs(_rand(rng, b, h, w, 4))
    gt_score = rng.uniform(size=(b, core.height, core.width)).astype(np.float32)
    gt_mask = (rng.uniform(size=(b, core.height, core.width)) > 0.5).astype(np.float32)
    y = rng.integers(0, h, size=(b, p))
    x = rng.integers(0, w, size=(b, p))
    gt_offsets = _rand(rng, b, p, 2)
    gt_angles = rng.dirichlet(np.ones(4), size=(b, p)).astype(np.float32)
    gt_distances = np.abs(_rand(rng, b, p, 3)) * 10

    def fn(prob, offset, angle, distance):
        return precise_loss(
            prob, offset, angle, distance,
            jnp.asarray(gt_score), jnp.asarray(gt_mask), core,
            jnp.asarray(y), jnp.asarray(x),
            jnp.asarray(gt_offsets), jnp.asarray(gt_angles), jnp.asarray(gt_distances),
        )

    args = tuple(jnp.asarray(a) for a in (prob, offset, angle, distance))
    loss, grads = jax.value_and_grad(fn, argnums=(0, 1, 2, 3))(*args)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    # loss_factor scales the whole loss (reference :343-344).
    cfg2 = AdaptiveScalingPreciseLossConfig(loss_factor=0.30)
    loss2 = precise_loss(
        *args,
        jnp.asarray(gt_score), jnp.asarray(gt_mask), core,
        jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(gt_offsets), jnp.asarray(gt_angles), jnp.asarray(gt_distances),
        config=cfg2,
    )
    np.testing.assert_allclose(float(loss2), 2 * float(loss), rtol=1e-5)
