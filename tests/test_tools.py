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
