"""Batched multi-page serving (detect_many): agreement with the per-page
engine and mesh-sharded execution."""
import numpy as np

import jax
import jax.numpy as jnp

from adascale.inference import AdaptiveScalingInference, AdaptiveScalingInferenceConfig
from adascale.inference.batch import BatchedAdaptiveScalingInference
from adascale.models import (
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)


def _engine():
    cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    return AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(model=cfg), params=params
    )


def _pages():
    from adascale.data.synth import SynthPageConfig, generate_page

    rng = np.random.default_rng(0)
    return [
        generate_page(
            SynthPageConfig(page_height=h, page_width=w, num_lines_min=2, num_lines_max=3),
            rng,
        ).image
        for h, w in [(192, 192), (256, 160)]
    ]


def test_detect_many_matches_per_page():
    engine = _engine()
    pages = _pages()
    batched = BatchedAdaptiveScalingInference(engine)
    many = batched.detect_many(pages)
    assert len(many) == len(pages)
    for im, res in zip(pages, many):
        single = engine.detect(im)
        r_b, r_s = res["rough"], single["rough"]
        vh, vw = r_s.resized_shape
        # Pages are grouped by their OWN padded bucket (exactly the shape
        # single-page mode pads to), so the two serving modes must agree
        # everywhere — masks bit-exact, polygons one-to-one (round 2's
        # shared max-bucket had a 0.81 polygon-agreement F1; the grouped
        # path measured 1.0 across mixed page sizes).
        np.testing.assert_array_equal(
            r_b.rough_char_mask[:vh, :vw], r_s.rough_char_mask[:vh, :vw]
        )
        sp, bp = single["char_polygons"], res["char_polygons"]
        assert len(sp) == len(bp)
        for a, b in zip(sp, bp):
            np.testing.assert_allclose(a.points, b.points, atol=1e-3)


def test_detect_many_with_blank_page():
    """A page with no text (and hence no regions / empty stacked image)
    must not break the batch path."""
    from adascale.data.synth import SynthPageConfig, generate_page

    engine = _engine()
    blank = generate_page(
        SynthPageConfig(page_height=192, page_width=192, num_lines_min=0, num_lines_max=0),
        np.random.default_rng(9),
    ).image
    pages = [_pages()[0], blank]
    results = BatchedAdaptiveScalingInference(engine).detect_many(pages)
    assert len(results) == 2
    assert isinstance(results[1]["char_polygons"], list)


def test_detect_many_on_mesh():
    from adascale.parallel import create_mesh

    cpus = jax.devices("cpu")
    mesh = create_mesh(cpus[:4])
    engine = _engine()
    batched = BatchedAdaptiveScalingInference(engine, mesh=mesh)
    pages = _pages()  # 2 pages -> padded to 4 for the mesh
    many = batched.detect_many(pages)
    assert len(many) == 2
    for res in many:
        assert "char_polygons" in res
