"""End-to-end train() driver smoke test (micro model, tiny dataset) plus the
demo visualization driver — the integration coverage the reference keeps
manual (SURVEY.md §4)."""
import json
import os

import numpy as np

from adascale.training.loop import export_inference_artifact, train
from adascale.utils.config import dump_config


def _write_configs(tmp_path):
    from adascale.data.dataset import SynthPipelineConfig
    from adascale.data.synth import SynthPageConfig

    pipeline = SynthPipelineConfig(
        page=SynthPageConfig(
            page_height=192, page_width=192, num_lines_min=3, num_lines_max=5,
            char_height_min=10, char_height_max=24,
        ),
        rough_crop_size=96,
        rough_core_margin=4,
        precise_crop_size=64,
        precise_core_margin=2,
        rough_samples_per_page=2,
        precise_samples_per_page=2,
    )
    steps = tmp_path / "steps.json"
    dump_config(pipeline, steps)

    dataset_config = {
        "train_adaptive_scaling_dataset_steps_jsons": [str(steps)],
        "train_rng_seeds": [7],
        "epoch_indices": [0],
        "dev_adaptive_scaling_dataset_steps_json": str(steps),
    }
    dataset_json = tmp_path / "dataset.json"
    dataset_json.write_text(json.dumps(dataset_config))

    epoch_config = {
        "num_epochs": 1,
        "train_num_batches": 2,
        "train_batch_size": 2,
        "train_num_processes": 0,
        "dev_num_batches": 1,
        "dev_batch_size": 2,
        "dev_num_processes": 0,
        "num_page_char_regression_labels": 8,
        "avg_num_batches": 4,
    }
    epoch_json = tmp_path / "epoch.json"
    epoch_json.write_text(json.dumps(epoch_config))

    model_config = {
        "size": "tiny",
        "neck_head_type": "fpn",
        "custom_block_channels_and_num_layers": [[8, 1], [16, 1], [32, 1], [64, 1]],
    }
    model_json = tmp_path / "model.json"
    model_json.write_text(json.dumps(model_config))
    return dataset_json, epoch_json, model_json


def test_train_loop_end_to_end(tmp_path):
    dataset_json, epoch_json, model_json = _write_configs(tmp_path)
    out = tmp_path / "run"
    metrics = train(
        dataset_config_json=str(dataset_json),
        output_folder=str(out),
        epoch_config_json=str(epoch_json),
        model_config_json=str(model_json),
    )
    assert np.isfinite(metrics["dev_loss"])
    # Provenance echo (train.py:140-194 behavior).
    for name in [
        "dataset_config", "epoch_config", "model_config",
        "optimizer_config", "rough_loss_config", "precise_loss_config",
    ]:
        assert (out / f"{name}.json").exists()
    assert (out / "log.txt").exists()
    # Final-epoch checkpoint must exist (train.py:586-603).
    ckpts = [d for d in os.listdir(out) if d.startswith("state_0")]
    assert ckpts

    # Checkpoint -> artifact -> inference engine roundtrip.
    artifact = export_inference_artifact(
        str(out / ckpts[0]), str(tmp_path / "artifact"), str(model_json)
    )
    assert os.path.isdir(os.path.join(artifact, "params"))

    from adascale.inference import AdaptiveScalingInference, AdaptiveScalingInferenceConfig
    from adascale.models import AdaptiveScalingConfig
    from adascale.utils.config import load_config

    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            checkpoint=os.path.join(artifact, "params"),
            model=load_config(str(model_json), AdaptiveScalingConfig),
        )
    )
    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=192, page_width=192, num_lines_min=2, num_lines_max=3),
        np.random.default_rng(0),
    )
    result = engine.detect(page.image)
    assert "char_polygons" in result


def test_train_loop_overfit_mode(tmp_path):
    """Overfit testing (reference train.py:263-275): trains on the dev
    pipeline with rng reset every dev_num_samples, no dev eval."""
    dataset_json, epoch_json, model_json = _write_configs(tmp_path)
    epoch = json.loads((tmp_path / "epoch.json").read_text())
    epoch.update({"enable_overfit_testing": True, "train_num_batches": 2})
    (tmp_path / "epoch_overfit.json").write_text(json.dumps(epoch))
    out = tmp_path / "run_overfit"
    metrics = train(
        dataset_config_json=str(dataset_json),
        output_folder=str(out),
        epoch_config_json=str(tmp_path / "epoch_overfit.json"),
        model_config_json=str(model_json),
    )
    # No dev eval in overfit mode -> no dev metrics.
    assert "dev_loss" not in metrics
    assert (out / "log.txt").exists()


def test_train_loop_bf16_compute(tmp_path):
    """compute_dtype='bfloat16': activations run in bf16 (MXU fast path)
    while params and loss math stay float32 — dev loss must be finite and
    the saved checkpoint must hold f32 params."""
    dataset_json, epoch_json, model_json = _write_configs(tmp_path)
    epoch = json.loads((tmp_path / "epoch.json").read_text())
    epoch.update({"compute_dtype": "bfloat16", "train_num_batches": 2})
    (tmp_path / "epoch_bf16.json").write_text(json.dumps(epoch))
    out = tmp_path / "run_bf16"
    metrics = train(
        dataset_config_json=str(dataset_json),
        output_folder=str(out),
        epoch_config_json=str(tmp_path / "epoch_bf16.json"),
        model_config_json=str(model_json),
    )
    assert np.isfinite(metrics["dev_loss"])
    ckpts = [d for d in os.listdir(out) if d.startswith("state_0")]
    assert ckpts
    import jax

    from adascale.inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from adascale.models import AdaptiveScalingConfig
    from adascale.utils.config import load_config

    artifact = export_inference_artifact(
        str(out / ckpts[0]), str(tmp_path / "artifact_bf16"), str(model_json)
    )
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            checkpoint=os.path.join(artifact, "params"),
            model=load_config(str(model_json), AdaptiveScalingConfig),
        )
    )
    leaves = jax.tree.leaves(engine.params)
    assert all(leaf.dtype == np.float32 for leaf in leaves)


def test_demo_writes_visualizations(tmp_path):
    import jax
    import jax.numpy as jnp

    from adascale.inference import AdaptiveScalingInference, AdaptiveScalingInferenceConfig
    from adascale.inference.demo import infer
    from adascale.models import (
        AdaptiveScaling,
        AdaptiveScalingConfig,
        AdaptiveScalingNeckHeadType,
        AdaptiveScalingSize,
    )

    model_config = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=model_config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(model=model_config), params=params
    )

    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=192, page_width=192, num_lines_min=2, num_lines_max=3),
        np.random.default_rng(1),
    )
    out = tmp_path / "viz"
    infer(None, "", str(out), engine=engine, image=page.image)
    for name in [
        "rough_mask.jpg",
        "rough_score_map.jpg",
        "text_region_polygons.jpg",
        "stacked_image.jpg",
        "precise_char_prob_score_map.jpg",
        "remapped_char_polygons.jpg",
        "remapped_char_polygons_border.jpg",
    ]:
        assert (out / name).exists(), name


def test_train_loop_params_only_continuation(tmp_path):
    """Params-only continuation (``init_params_path``): resume the schedule
    at a later epoch from exported ``.npz`` weights with FRESH optimizer
    moments — the reference's restore-time scheduler surgery
    (train.py:316-335) applied to the committed-artifact case where only
    the exported weights survive (REPRODUCE.md Path A)."""
    from adascale.tools.export_params import flatten_params
    from adascale.training.checkpoint import restore_pytree_numpy

    dataset_json, epoch_json, model_json = _write_configs(tmp_path)
    out = tmp_path / "run"
    train(
        dataset_config_json=str(dataset_json),
        output_folder=str(out),
        epoch_config_json=str(epoch_json),
        model_config_json=str(model_json),
    )
    ckpt = next(d for d in os.listdir(out) if d.startswith("state_0"))
    params = restore_pytree_numpy(str(out / ckpt))["params"]
    flat = flatten_params(params)
    npz = tmp_path / "weights.f16.npz"
    np.savez_compressed(
        str(npz),
        **{
            k: (v.astype(np.float16) if v.dtype == np.float32 else v)
            for k, v in flat.items()
        },
    )

    # Continue: start the schedule at epoch 1 of a 2-epoch plan.
    epoch2 = json.loads(epoch_json.read_text())
    epoch2["num_epochs"] = 2
    epoch2_json = tmp_path / "epoch2.json"
    epoch2_json.write_text(json.dumps(epoch2))
    out2 = tmp_path / "run2"
    metrics = train(
        dataset_config_json=str(dataset_json),
        output_folder=str(out2),
        epoch_config_json=str(epoch2_json),
        model_config_json=str(model_json),
        init_params_path=str(npz),
        reset_epoch_idx_to_value=1,
    )
    assert np.isfinite(metrics["dev_loss"])
    # Only epoch 1 ran (epoch 0 was skipped by the reset).
    names = os.listdir(out2)
    assert any(n.startswith("state_1") for n in names)
    assert not any(n.startswith("state_0") for n in names)
    # The optax step count resumed at epoch*batches, then advanced one
    # epoch: 1*2 + 2 = 4 — proves the schedule-position surgery happened.
    ckpt2 = next(n for n in names if n.startswith("state_1"))
    restored = restore_pytree_numpy(str(out2 / ckpt2))

    def find_counts(node):  # orbax restores tuples as lists, dicts as dicts
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "count" and np.ndim(v) == 0:
                    yield int(v)
                else:
                    yield from find_counts(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                yield from find_counts(v)

    counts = list(find_counts(restored["opt_state"]))
    assert counts and all(c == 4 for c in counts), counts
