"""FpnNeck/FpnHead shape + parity tests (mirrors reference tests/test_fpn.py:16-50)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models import FpnHead, FpnNeck
from adascale.utils.torch_port import fpn_head_params_from_torch, fpn_neck_params_from_torch

REFERENCE_PATH = "/root/reference"


def _pyramid(b=1, hw=40, channels=(96, 192, 384, 768)):
    rng = np.random.default_rng(0)
    feats = []
    for i, c in enumerate(channels):
        s = hw // (2**i)
        feats.append(rng.standard_normal((b, s, s, c)).astype(np.float32))
    return feats


def test_fpn_neck_shapes():
    feats = [jnp.asarray(f) for f in _pyramid(hw=16)]
    neck = FpnNeck(in_channels_group=(96, 192, 384, 768), out_channels=400)
    params = neck.init(jax.random.PRNGKey(0), feats)
    out = neck.apply(params, feats)
    assert out.shape == (1, 16, 16, 400)


@pytest.mark.parametrize("factor,expected_hw", [(1, 16), (2, 32), (4, 64)])
def test_fpn_head_shapes(factor, expected_hw):
    x = jnp.zeros((1, 16, 16, 384))
    head = FpnHead(out_channels=1, upsampling_factor=factor)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (1, expected_hw, expected_hw, 1)


def test_fpn_head_bias_init():
    head = FpnHead(out_channels=1, upsampling_factor=1, init_output_bias=8.0)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))
    assert float(params["params"]["step2"]["bias"][0]) == 8.0


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE_PATH), reason="no reference")
def test_fpn_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    from vkit_open_model.model.fpn import FpnNeck as TorchFpnNeck
    from vkit_open_model.model.fpn import FpnHead as TorchFpnHead

    torch.manual_seed(0)
    tneck = TorchFpnNeck(in_channels_group=(96, 192, 384, 768), out_channels=384).eval()
    thead = TorchFpnHead(in_channels=384, out_channels=1, upsampling_factor=2).eval()

    feats = _pyramid(hw=32)
    tfeats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats]
    with torch.no_grad():
        tneck_out = tneck(tfeats)
        thead_out = thead(tneck_out)

    neck = FpnNeck(in_channels_group=(96, 192, 384, 768), out_channels=384)
    head = FpnHead(out_channels=1, upsampling_factor=2)
    neck_params = {"params": fpn_neck_params_from_torch(tneck.state_dict(), "")}
    head_params = {"params": fpn_head_params_from_torch(thead.state_dict(), "")}

    jneck_out = neck.apply(neck_params, [jnp.asarray(f) for f in feats])
    jhead_out = head.apply(head_params, jneck_out)

    np.testing.assert_allclose(
        np.asarray(jneck_out),
        np.transpose(tneck_out.numpy(), (0, 2, 3, 1)),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jhead_out),
        np.transpose(thead_out.numpy(), (0, 2, 3, 1)),
        atol=2e-4, rtol=1e-4,
    )


def test_fpn_head_fused_upsample_parity():
    """The phase-fused x2 head must match the naive upsample->conv path
    exactly (same param tree, same numerics up to float assoc)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adascale.models.fpn import FpnHead

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 20, 32), jnp.float32)
    fused = FpnHead(out_channels=3, upsampling_factor=2, init_output_bias=0.5)
    naive = FpnHead(
        out_channels=3, upsampling_factor=2, init_output_bias=0.5, fuse_upsample=False
    )
    params = fused.init(jax.random.PRNGKey(1), x)["params"]
    # One param tree drives both paths.
    y_fused = fused.apply({"params": params}, x)
    y_naive = naive.apply({"params": params}, x)
    assert y_fused.shape == (2, 48, 40, 3)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_naive), atol=2e-5, rtol=2e-5
    )
