"""Pallas kernel parity: every fused kernel must match its XLA twin
(SURVEY.md §7 — Pallas is an optimization, never a semantic). Runs in
interpreter mode on CPU; real-hardware numerics are covered by the TPU
bench path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.models.convnext import ConvNeXt, ConvNeXtBlockLayer, ConvNeXtConfig
from adascale.ops.pallas import (
    block_xla,
    convnext_forward_pallas,
    convnext_forward_pallas_train,
    fused_convnext_block,
    make_trainable_block,
)


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


def test_fused_block_kx_major_matches_flax():
    """The kx-major dwconv loop order (7 shifts + 7 casts instead of 49,
    kernel_sweep's fast candidate) must be numerically identical to the
    tap-major default — both are f32 accumulation over the same taps."""
    key = jax.random.PRNGKey(0)
    layer, params = _block_params(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 19, 8), jnp.float32)
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
        dw_tap_major=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_block_xla_matches_flax():
    """The recompute target of the trainable block's backward must be
    numerically identical to the Flax layer."""
    key = jax.random.PRNGKey(0)
    layer, params = _block_params(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 8), jnp.float32)
    want = layer.apply({"params": params}, x, True)
    got = block_xla(
        x,
        params["dwconv"]["kernel"], params["dwconv"]["bias"],
        params["ln"]["scale"], params["ln"]["bias"],
        params["mlp_up"]["kernel"], params["mlp_up"]["bias"],
        params["mlp_down"]["kernel"], params["mlp_down"]["bias"],
        params["block_scale"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


def test_trainable_block_grads_match_flax():
    """custom-VJP fused block: gradients (input + every param) must match
    the Flax composition's autodiff."""
    key = jax.random.PRNGKey(0)
    layer, params = _block_params(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 10, 8), jnp.float32)
    block = make_trainable_block(tile_h=8, interpret=True)

    arg_names = [
        ("dwconv", "kernel"), ("dwconv", "bias"),
        ("ln", "scale"), ("ln", "bias"),
        ("mlp_up", "kernel"), ("mlp_up", "bias"),
        ("mlp_down", "kernel"), ("mlp_down", "bias"),
        ("block_scale",),
    ]

    def get(p, path):
        for k in path:
            p = p[k]
        return p

    def loss_fused(x, p):
        out = block(x, *(get(p, path) for path in arg_names))
        return jnp.sum(out * out)

    def loss_flax(x, p):
        out = layer.apply({"params": p}, x, True)
        return jnp.sum(out * out)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_w, gp_w = jax.grad(loss_flax, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_w), atol=1e-4, rtol=1e-4)
    for path in arg_names:
        np.testing.assert_allclose(
            np.asarray(get(gp_f, path)),
            np.asarray(get(gp_w, path)),
            atol=1e-4, rtol=1e-4,
            err_msg=str(path),
        )


def test_pallas_train_backbone_grads_match_flax():
    """Deterministic-mode gradient parity of the trainable Pallas backbone
    vs the Flax backbone (shared param tree)."""
    spec = ((8, 2), (16, 1), (24, 1), (32, 1))
    model = ConvNeXt(config=ConvNeXtConfig(block_channels_and_num_layers=spec))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss_flax(p):
        feats = model.apply({"params": p}, x, True)
        return sum(jnp.sum(f * f) for f in feats)

    def loss_pallas(p):
        feats = convnext_forward_pallas_train(
            p, x, spec, deterministic=True, interpret=True
        )
        return sum(jnp.sum(f * f) for f in feats)

    g_w = jax.grad(loss_flax)(params)
    g_f = jax.grad(loss_pallas)(params)
    flat_w = jax.tree.leaves(g_w)
    flat_f = jax.tree.leaves(g_f)
    assert len(flat_w) == len(flat_f)
    for a, b in zip(flat_f, flat_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


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


@pytest.mark.parametrize("hw", [(16, 16), (25, 19), (7, 9)])
def test_fused_block_halo_thin_matches_flax(hw):
    """halo_thin fetches the vertical 7x7 halo as two HALO-row blocks
    instead of full neighbor bands (input HBM reads 3x -> ~1.5x). Must be
    bit-for-bit the same math: same taps, same f32 accumulation — only
    the BlockSpec staging changes. Odd H exercises the tile-padding path;
    7x9 forces single-tile pages where both halos clamp + zero."""
    key = jax.random.PRNGKey(0)
    layer, params = _block_params(key, 8)
    h, w = hw
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 8), jnp.float32)
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
        tile_h=12,
        interpret=True,
        dw_tap_major=False,
        halo_thin=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
