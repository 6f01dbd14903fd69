"""Tiled whole-page rough inference (BASELINE config 3): tile math,
stitching agreement with the untiled forward, and E2E detect(tiled=True)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.inference.tiled import (
    compute_tile_origins,
    tiled_rough_forward,
)


def test_tile_origins_cover():
    for length, tile, stride in [(512, 256, 192), (700, 256, 192), (256, 256, 100)]:
        origins = compute_tile_origins(length, tile, stride)
        covered = np.zeros(length, bool)
        for o in origins:
            assert 0 <= o <= length - tile
            covered[o : o + tile] = True
        assert covered.all()


def test_tiled_stitch_identity_function():
    """With forward = identity-downsample, stitching must reproduce the
    whole map exactly (ownership spans are a partition)."""
    fdf = 2
    h, w, tile, overlap = 192, 256, 128, 32
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (h, w, 3)).astype(np.float32))

    def forward(t):
        # (N, tile, tile, 3) -> take channel 0, stride-2 subsample.
        m = t[:, ::fdf, ::fdf, :1]
        return m, m * 2.0

    mask, height = tiled_rough_forward(forward, img, tile=tile, overlap=overlap, fdf=fdf)
    want = np.asarray(img[::fdf, ::fdf, 0])
    np.testing.assert_allclose(np.asarray(mask), want, atol=0)
    np.testing.assert_allclose(np.asarray(height), want * 2.0, atol=0)


def test_tiled_matches_untiled_model():
    """Micro model: tiled rough maps must agree with the untiled forward
    away from tile seams (and mostly at them, given the overlap margin)."""
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )

    cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (256, 256, 3)).astype(np.float32)
    )

    def forward(t):
        return model.apply({"params": params}, t, method=model.forward_rough)

    mask_t, height_t = tiled_rough_forward(forward, img, tile=128, overlap=64, fdf=2)
    mask_u, height_u = forward(img[None])
    mask_u, height_u = mask_u[0, :, :, 0], height_u[0, :, :, 0]

    # Tiling is an approximation at seams (receptive field truncated to the
    # overlap margin); with an untrained random model logits sit near zero,
    # the worst case for agreement. Bound both overall logit agreement and
    # the effect on the thresholded mask the pipeline actually consumes.
    diff = np.abs(np.asarray(mask_t) - np.asarray(mask_u))
    agree = float((diff < 1e-3).mean())
    assert agree > 0.9, agree
    bin_t = np.asarray(jax.nn.sigmoid(mask_t)) >= 0.5
    bin_u = np.asarray(jax.nn.sigmoid(mask_u)) >= 0.5
    assert float((bin_t == bin_u).mean()) > 0.95


def test_detect_tiled_end_to_end():
    from adascale.data.synth import SynthPageConfig, generate_page
    from adascale.inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from adascale.models import (
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )

    model_cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    from adascale.models import AdaptiveScaling

    model = AdaptiveScaling(config=model_cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            model=model_cfg,
            tiled_rough_tile_size=128,
            tiled_rough_tile_overlap=32,
        ),
        params=params,
    )
    page = generate_page(
        SynthPageConfig(page_height=320, page_width=256, num_lines_min=2, num_lines_max=3),
        np.random.default_rng(2),
    )
    result = engine.detect(page.image, tiled=True)
    assert "char_polygons" in result
    rough = result["rough"]
    # No downsample in tiled mode.
    assert rough.resized_image_shape == (320, 256)
    assert rough.rough_char_mask.shape[0] >= rough.resized_shape[0]
