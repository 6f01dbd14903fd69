"""ConvNeXt backbone: shape tests (mirroring reference tests/test_convnext.py:41-76)
plus numerical parity vs the PyTorch reference with ported weights."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models import ConvNeXt
from adascale.models.convnext import ConvNeXtConfig
from adascale.utils.torch_port import convnext_params_from_torch

REFERENCE_PATH = "/root/reference"


def test_convnext_tiny_shapes():
    model = ConvNeXt.create("tiny")
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 96),
        (1, 8, 8, 192),
        (1, 4, 4, 384),
        (1, 2, 2, 768),
    ]


def test_convnext_param_count_tiny():
    model = ConvNeXt.create("tiny")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Reference measured value (SURVEY.md §6): 27.8M.
    assert n == 27_820_128


def test_convnext_stem_pconv2x2_shapes():
    model = ConvNeXt(
        config=ConvNeXtConfig(
            block_channels_and_num_layers=((96, 3), (192, 3), (384, 9), (768, 3)),
            stem_use_pconv2x2=True,
        )
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape for f in feats] == [
        (1, 32, 32, 96),
        (1, 16, 16, 192),
        (1, 8, 8, 384),
        (1, 4, 4, 768),
    ]


def test_drop_path_train_mode_runs():
    model = ConvNeXt.create("tiny")
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(
        params, x, deterministic=False, rngs={"drop_path": jax.random.PRNGKey(1)}
    )
    assert feats[0].shape == (2, 8, 8, 96)


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE_PATH), reason="no reference")
def test_convnext_parity_vs_torch_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    from vkit_open_model.model.convnext import ConvNext as TorchConvNext

    torch.manual_seed(0)
    tmodel = TorchConvNext.create_tiny().eval()
    x = np.random.default_rng(0).standard_normal((1, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x))

    model = ConvNeXt.create("tiny")
    params = {"params": convnext_params_from_torch(tmodel.state_dict())}
    jfeats = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))

    for tf, jf in zip(tfeats, jfeats):
        expected = np.transpose(tf.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(jf), expected, atol=2e-4, rtol=1e-4)
