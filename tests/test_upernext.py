"""UperNextNeck/Head shape + parity tests (mirrors reference tests/test_upernext.py:16-31)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models import UperNextHead, UperNextNeck
from adascale.utils.torch_port import (
    upernext_head_params_from_torch,
    upernext_neck_params_from_torch,
)

REFERENCE_PATH = "/root/reference"


def _pyramid(b=1, hw=40, channels=(96, 192, 384, 768)):
    rng = np.random.default_rng(0)
    feats = []
    for i, c in enumerate(channels):
        s = hw // (2**i)
        feats.append(rng.standard_normal((b, s, s, c)).astype(np.float32))
    return feats


def test_upernext_neck_shapes():
    feats = [jnp.asarray(f) for f in _pyramid(hw=16)]
    neck = UperNextNeck(in_channels_group=(96, 192, 384, 768), out_channels=384)
    params = neck.init(jax.random.PRNGKey(0), feats)
    out = neck.apply(params, feats)
    assert out.shape == (1, 16, 16, 384)


def test_upernext_head_shapes():
    x = jnp.zeros((1, 16, 16, 384))
    head = UperNextHead(out_channels=2, upsampling_factor=2)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (1, 32, 32, 2)


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE_PATH), reason="no reference")
def test_upernext_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    from vkit_open_model.model.upernext import UperNextNeck as TorchNeck
    from vkit_open_model.model.upernext import UperNextHead as TorchHead

    torch.manual_seed(0)
    tneck = TorchNeck(in_channels_group=(96, 192, 384, 768), out_channels=384).eval()
    thead = TorchHead(in_channels=384, out_channels=4, upsampling_factor=2).eval()

    feats = _pyramid(hw=32)
    tfeats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats]
    with torch.no_grad():
        tneck_out = tneck(tfeats)
        thead_out = thead(tneck_out)

    neck = UperNextNeck(in_channels_group=(96, 192, 384, 768), out_channels=384)
    head = UperNextHead(out_channels=4, upsampling_factor=2)
    neck_params = {"params": upernext_neck_params_from_torch(tneck.state_dict(), "")}
    head_params = {"params": upernext_head_params_from_torch(thead.state_dict(), "")}

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
