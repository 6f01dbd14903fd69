"""AdaptiveScaling model: shapes for both entry points + end-to-end parity vs
the PyTorch reference (mirrors reference tests/test_adaptive_scaling.py:40-63;
note the reference's own corner-distance assert there is stale — the head
emits 4 channels, model/adaptive_scaling.py:133-141, which we preserve)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models import (
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)
from adascale.utils.torch_port import adaptive_scaling_params_from_torch

REFERENCE_PATH = "/root/reference"


def _tiny_config(neck_head_type=AdaptiveScalingNeckHeadType.UPERNEXT):
    return AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=neck_head_type,
    )


def test_forward_rough_and_precise_shapes():
    model = AdaptiveScaling(config=_tiny_config())
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)

    mask, height = model.apply(params, x, method=model.forward_rough)
    # 2x E2E downsampling with default rough_upsampling_factor=2.
    assert mask.shape == (1, 32, 32, 1)
    assert height.shape == (1, 32, 32, 1)
    assert float(np.asarray(height).min()) >= 0.0  # Softplus positivity

    prob, offset, angle, distance = model.apply(params, x, method=model.forward_precise)
    assert prob.shape == (1, 32, 32, 1)
    assert offset.shape == (1, 32, 32, 2)
    assert angle.shape == (1, 32, 32, 4)
    assert distance.shape == (1, 32, 32, 4)  # 4-channel head kept intentionally
    assert float(np.asarray(distance).min()) >= 0.0


def test_param_counts_match_reference_measurements():
    # SURVEY.md §6: tiny-fpn 35.6M, tiny-upernext 35.0M.
    for nh, expected_millions in [
        (AdaptiveScalingNeckHeadType.FPN, 35.6),
        (AdaptiveScalingNeckHeadType.UPERNEXT, 35.0),
    ]:
        model = AdaptiveScaling(config=_tiny_config(nh))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert abs(n / 1e6 - expected_millions) < 0.1, (nh, n)


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE_PATH), reason="no reference")
@pytest.mark.parametrize("neck_head", ["fpn", "upernext"])
def test_adaptive_scaling_parity_vs_torch_reference(neck_head):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    from vkit_open_model.model.adaptive_scaling import (
        AdaptiveScaling as TorchModel,
        AdaptiveScalingConfig as TorchConfig,
        AdaptiveScalingSize as TorchSize,
        AdaptiveScalingNeckHeadType as TorchNeckHead,
    )

    torch.manual_seed(0)
    tmodel = TorchModel(
        TorchConfig(
            size=TorchSize.TINY,
            neck_head_type=(
                TorchNeckHead.FPN if neck_head == "fpn" else TorchNeckHead.UPERNEXT
            ),
        )
    ).eval()

    x = np.random.default_rng(7).uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_mask, t_height = tmodel.forward_rough(torch.from_numpy(x))
        t_prob, t_offset, t_angle, t_distance = tmodel.forward_precise(torch.from_numpy(x))

    model = AdaptiveScaling(
        config=_tiny_config(
            AdaptiveScalingNeckHeadType.FPN
            if neck_head == "fpn"
            else AdaptiveScalingNeckHeadType.UPERNEXT
        )
    )
    params = {"params": adaptive_scaling_params_from_torch(tmodel.state_dict(), neck_head)}

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    j_mask, j_height = model.apply(params, xj, method=model.forward_rough)
    j_prob, j_offset, j_angle, j_distance = model.apply(
        params, xj, method=model.forward_precise
    )

    def check(jarr, tarr, atol):
        np.testing.assert_allclose(
            np.asarray(jarr),
            np.transpose(tarr.numpy(), (0, 2, 3, 1)),
            atol=atol,
        )

    # BASELINE.json parity bar: mask & scale maps within 1e-3.
    check(j_mask, t_mask, 1e-3)
    check(j_height, t_height, 1e-3)
    check(j_prob, t_prob, 1e-3)
    check(j_offset, t_offset, 1e-3)
    check(j_angle, t_angle, 1e-3)
    check(j_distance, t_distance, 1e-3)
