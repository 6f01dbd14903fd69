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


@pytest.mark.parametrize("hw", [(16, 16), (13, 19)])
def test_fused_rough_heads_matches_flax(hw):
    """The dual-head kernel (both FPN rough heads packed into one Pallas
    pass — upsample-x2/conv3x3/LN/GELU/1x1 per head) must match the Flax
    FpnHead applied twice. Odd shapes exercise the W lane padding and the
    H tile padding paths."""
    from adascale.models.fpn import FpnHead
    from adascale.ops.pallas.fpn_heads import _head_leaves, fused_rough_heads

    key = jax.random.PRNGKey(0)
    c = 128  # kernel requires a lane-multiple input width (neck out is 384)
    h, w = hw
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c), jnp.float32)
    head0 = FpnHead(out_channels=1, upsampling_factor=2)
    head1 = FpnHead(out_channels=1, upsampling_factor=2, init_output_bias=8.0)
    p0 = head0.init(key, x)["params"]
    p1 = head1.init(jax.random.PRNGKey(2), x)["params"]
    want0 = head0.apply({"params": p0}, x)
    want1 = head1.apply({"params": p1}, x)
    got0, got1 = fused_rough_heads(
        x, *_head_leaves(p0), *_head_leaves(p1), tile_h=8, interpret=True
    )
    assert got0.shape == want0.shape == (2, 2 * h, 2 * w, 1)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hw0", [(16, 16), (13, 19)])
def test_fpn_neck_fused_l0_matches_flax(hw0):
    """The fused level-0 neck chain (step1 lateral + top-down add + step2
    3x3, one Pallas pass) composed with the XLA levels 1..3 must equal the
    Flax FpnNeck exactly. Odd shapes exercise halo masking at the real
    page border inside a padded tile."""
    from adascale.models.fpn import FpnNeck
    from adascale.ops.pallas.fpn_neck import fpn_neck_forward_fused

    key = jax.random.PRNGKey(0)
    chans = (8, 16, 32, 64)
    h0, w0 = hw0
    feats = [
        jax.random.normal(
            jax.random.fold_in(key, i),
            (2, max(1, h0 // 2**i), max(1, w0 // 2**i), c),
            jnp.float32,
        )
        for i, c in enumerate(chans)
    ]
    neck = FpnNeck(in_channels_group=chans, out_channels=32)
    params = neck.init(jax.random.PRNGKey(1), feats)["params"]
    want = neck.apply({"params": params}, feats)
    got = fpn_neck_forward_fused(
        params, feats, dtype=jnp.float32, tile_h=6, interpret=True
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_forward_rough_fused_composition_matches_model():
    """Full fused serving composition (fused FPN neck L0 + fused dual
    heads) vs AdaptiveScaling.forward_rough_from_features on a micro
    model — the exact path the inference engine and bench run on TPU."""
    from adascale.models import AdaptiveScaling, AdaptiveScalingConfig
    from adascale.ops.pallas import forward_rough_from_features_fused

    cfg = AdaptiveScalingConfig(
        size="tiny",
        neck_head_type="fpn",
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    feats = [
        jax.random.normal(jax.random.fold_in(key, i), (1, 16 // 2**i, 16 // 2**i, c))
        for i, c in enumerate((8, 16, 32, 64))
    ]
    want_mask, want_height = model.apply(
        {"params": params}, tuple(feats), method=model.forward_rough_from_features
    )
    got_mask, got_height = forward_rough_from_features_fused(
        model, params, feats, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_mask), np.asarray(want_mask), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_height), np.asarray(want_height), atol=2e-5, rtol=2e-5
    )


def test_forward_precise_fused_matches_model():
    """Fused quad-head precise pass (prob/offset/angle/distance packed
    into one Pallas kernel) vs AdaptiveScaling.forward_precise_from_features
    on a micro model — exercises per-segment LayerNorm with four different
    inner widths and multi-channel phase interleave."""
    from adascale.models import AdaptiveScaling, AdaptiveScalingConfig
    from adascale.ops.pallas.precise_heads import forward_precise_from_features_fused

    cfg = AdaptiveScalingConfig(
        size="tiny",
        neck_head_type="fpn",
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    feats = [
        jax.random.normal(jax.random.fold_in(key, i), (1, 12 // 2**i or 1, 20 // 2**i or 1, c))
        for i, c in enumerate((8, 16, 32, 64))
    ]
    want = model.apply(
        {"params": params}, tuple(feats), method=model.forward_precise_from_features
    )
    got = forward_precise_from_features_fused(model, params, feats, interpret=True)
    assert len(got) == len(want) == 4
    for g, w_ in zip(got, want):
        assert g.shape == w_.shape, (g.shape, w_.shape)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=2e-5, rtol=2e-5)
