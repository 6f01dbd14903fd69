"""StableHLO export roundtrip (the TPU-native analogue of the reference's
ONNX export with dynamic axes, demo.py:223-243)."""
import numpy as np

import jax
import jax.numpy as jnp

from adascale.inference.export import export_stablehlo, load_stablehlo
from adascale.models import (
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)


def test_export_and_roundtrip(tmp_path):
    cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    manifest = export_stablehlo(params, cfg, str(tmp_path), example_hw=(64, 64))
    assert set(manifest) == {"forward_rough", "forward_precise"}
    assert (tmp_path / "forward_rough.stablehlo").exists()
    assert (tmp_path / "manifest.json").exists()

    # FPN must export FULLY polymorphic (batch + H + W symbolic) — the
    # analogue of the reference ONNX dynamic axes (demo.py:233-242).
    assert manifest["forward_rough"]["polymorphic"] is True
    assert manifest["forward_rough"]["symbolic_axes"] == "b,h,w"
    assert manifest["forward_precise"]["symbolic_axes"] == "b,h,w"

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    )
    want_mask, want_height = model.apply({"params": params}, x, method=model.forward_rough)

    loaded = load_stablehlo(str(tmp_path / "forward_rough.stablehlo"))
    got_mask, got_height = loaded.call(params, x)
    np.testing.assert_allclose(np.asarray(got_mask), np.asarray(want_mask), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_height), np.asarray(want_height), atol=1e-5)

    # Dynamic shapes: a different batch AND H/W must run through the same
    # serialized artifact.
    x2 = jnp.zeros((2, 128, 64, 3), jnp.float32)
    m2, h2 = loaded.call(params, x2)
    assert m2.shape == (2, 64, 32, 1)


def test_export_upernext_fully_polymorphic(tmp_path):
    """UPerNeXt must export with symbolic batch AND H/W: the PPM's
    adaptive-avg-pool / bilinear weights switch to symbolic-dim-safe
    on-device builders (ops/resize.py::_*_dynamic) under polymorphic
    tracing. Roundtrip output must match the eager model and accept a
    different batch + H/W through the same artifact."""
    cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.UPERNEXT,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    manifest = export_stablehlo(params, cfg, str(tmp_path), example_hw=(64, 64))
    assert manifest["forward_rough"]["symbolic_axes"] == "b,h,w"
    assert manifest["forward_precise"]["symbolic_axes"] == "b,h,w"

    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    )
    want_mask, want_height = model.apply(
        {"params": params}, x, method=model.forward_rough
    )
    loaded = load_stablehlo(str(tmp_path / "forward_rough.stablehlo"))
    got_mask, got_height = loaded.call(params, x)
    np.testing.assert_allclose(np.asarray(got_mask), np.asarray(want_mask), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_height), np.asarray(want_height), atol=1e-4
    )

    m2, _ = loaded.call(params, jnp.zeros((3, 128, 64, 3), jnp.float32))
    assert m2.shape == (3, 64, 32, 1)
