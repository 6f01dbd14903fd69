"""Manual-helper smoke tests (tools/inspect.py — the uncollected-helper
equivalents of reference tests/test_adaptive_scaling.py:103-377)."""
import os

from adascale.data.dataset import SynthPipelineConfig
from adascale.data.synth import SynthPageConfig
from adascale.tools import profile_dataset, sample_dataset
from adascale.utils.config import dump_config


def _steps(tmp_path):
    pipeline = SynthPipelineConfig(
        page=SynthPageConfig(
            page_height=192, page_width=192, num_lines_min=3, num_lines_max=5,
            char_height_min=10, char_height_max=24,
        ),
        rough_crop_size=96, rough_core_margin=4,
        precise_crop_size=64, precise_core_margin=2,
        rough_samples_per_page=2, precise_samples_per_page=2,
    )
    path = tmp_path / "steps.json"
    dump_config(pipeline, path)
    return str(path)


def test_sample_dataset_renders(tmp_path):
    out = tmp_path / "viz"
    sample_dataset(_steps(tmp_path), str(out), num_batches=1, batch_size=1)
    files = sorted(os.listdir(out))
    assert "0_rough_mask.jpg" in files
    assert "0_precise_labels.jpg" in files


def test_profile_dataset_stats(tmp_path):
    stats = profile_dataset(_steps(tmp_path), num_batches=3, batch_size=2)
    assert stats["mean_s"] > 0 and stats["batches_per_s"] > 0


def test_export_params_roundtrip(tmp_path):
    """tools/export_params f16 npz -> engine.load_params nested tree."""
    import numpy as np

    from adascale.inference.engine import load_params
    from adascale.models import AdaptiveScalingConfig
    from adascale.tools.export_params import flatten_params

    params = {
        "backbone": {"stem": {"kernel": np.ones((2, 2, 3, 8), np.float32)}},
        "head": {"bias": np.full((4,), 8.0, np.float32)},
    }
    flat = flatten_params(params)
    assert set(flat) == {"backbone/stem/kernel", "head/bias"}
    out = tmp_path / "p.npz"
    np.savez_compressed(
        out, **{k: v.astype(np.float16) for k, v in flat.items()}
    )
    loaded = load_params(str(out), AdaptiveScalingConfig())
    assert loaded["backbone"]["stem"]["kernel"].dtype == np.float32
    np.testing.assert_allclose(
        loaded["head"]["bias"], params["head"]["bias"], rtol=1e-3
    )


def test_shift_page_config_outside_training_ranges():
    """--shift knobs must actually leave the training ranges."""
    from adascale.data.synth import SynthPageConfig
    from adascale.tools.eval_checkpoint import shift_page_config

    base = SynthPageConfig()
    shifted = shift_page_config(base)
    assert shifted.char_height_min < base.char_height_min
    assert shifted.char_height_max > base.char_height_max
    assert shifted.line_rotate_max_deg > base.line_rotate_max_deg
    assert shifted.perspective_max_ratio > base.perspective_max_ratio
    assert shifted.noise_sigma > base.noise_sigma


def test_shift_fixture_pages_committed():
    """The real-font fixture pages exist with the documented contract."""
    import numpy as np

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "shift_pages")
    files = sorted(f for f in os.listdir(fdir) if f.endswith(".npz"))
    assert len(files) >= 3
    data = np.load(os.path.join(fdir, files[0]))
    image, corners, heights = data["image"], data["corners"], data["heights"]
    assert image.ndim == 3 and image.shape[2] == 3 and image.dtype == np.uint8
    assert corners.ndim == 3 and corners.shape[1:] == (4, 2)
    assert len(heights) == len(corners) >= 200
