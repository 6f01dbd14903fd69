"""Pallas kernel parity: every fused kernel must match its XLA twin
(SURVEY.md §7 — Pallas is an optimization, never a semantic). Runs in
interpreter mode on CPU; real-hardware numerics are covered by the TPU
bench path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models.convnext import ConvNeXt, ConvNeXtBlockLayer, ConvNeXtConfig
from adascale.ops.pallas import convnext_forward_pallas, fused_convnext_block


def _block_params(key, c):
    layer = ConvNeXtBlockLayer(channels=c)
    x = jnp.zeros((1, 8, 8, c))
    return layer, layer.init(key, x)["params"]


@pytest.mark.parametrize("c", [8, 96])
@pytest.mark.parametrize("hw", [(16, 16), (13, 19)])
def test_fused_block_matches_flax(c, hw):
    key = jax.random.PRNGKey(0)
    layer, params = _block_params(key, c)
    h, w = hw
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c), jnp.float32)

    want = layer.apply({"params": params}, x, True)
    got = fused_convnext_block(
        x,
        params["dwconv"]["kernel"],
        params["dwconv"]["bias"],
        params["ln"]["scale"],
        params["ln"]["bias"],
        params["mlp_up"]["kernel"],
        params["mlp_up"]["bias"],
        params["mlp_down"]["kernel"],
        params["mlp_down"]["bias"],
        params["block_scale"],
        tile_h=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_pallas_backbone_matches_flax():
    spec = ((8, 2), (16, 1), (24, 1), (32, 1))
    model = ConvNeXt(config=ConvNeXtConfig(block_channels_and_num_layers=spec))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    want = model.apply({"params": params}, x, True)
    got = convnext_forward_pallas(params, x, spec, interpret=True)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5)
