"""CLI surface smoke test: detect subcommand end-to-end from an orbax
params dir, producing char-polygon JSON."""
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def test_cli_detect(tmp_path):
    import cv2
    import orbax.checkpoint as ocp

    from adascale.cli import main
    from adascale.data.synth import SynthPageConfig, generate_page
    from adascale.models import AdaptiveScaling, AdaptiveScalingConfig
    from adascale.utils.config import config_to_dict

    cfg = AdaptiveScalingConfig(
        size="tiny",
        neck_head_type="fpn",
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params_dir = os.path.join(str(tmp_path), "params")
    ocp.PyTreeCheckpointer().save(params_dir, params)

    model_json = tmp_path / "model.json"
    model_json.write_text(json.dumps(config_to_dict(cfg)))

    page = generate_page(
        SynthPageConfig(page_height=192, page_width=192, num_lines_min=2, num_lines_max=3),
        np.random.default_rng(0),
    )
    image_path = str(tmp_path / "page.png")
    cv2.imwrite(image_path, page.image[:, :, ::-1])

    out_json = str(tmp_path / "result.json")
    main(
        [
            "detect",
            "--checkpoint", params_dir,
            "--image", image_path,
            "--model-config", str(model_json),
            "--output", out_json,
        ]
    )
    result = json.loads(open(out_json).read())
    assert "char_polygons" in result and "num_chars" in result
