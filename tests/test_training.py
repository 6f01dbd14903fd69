"""Training subsystem tests: metrics golden values (mirrors reference
tests/test_training.py:29-35), torch scheduler parity, data-parallel train
step over an 8-device CPU mesh, and checkpoint roundtrip with step surgery."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adascale.losses import CoreBox
from adascale.models import (
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)
from adascale.parallel import create_mesh, replicate, shard_batch
from adascale.training import (
    Metrics,
    OptimizerConfig,
    TrainStepConfig,
    build_optimizer,
    cosine_annealing_warm_restarts,
    make_eval_step,
    make_train_step,
    setup_seeds,
)
from adascale.training.train_step import TrainState, make_grad_inspection_fn


def test_metrics_sliding_window():
    metrics = Metrics(["foo", "bar"], 3)
    assert np.isclose(metrics.update("foo", 1), 1)
    assert np.isclose(metrics.update("foo", 2), 1.5)
    assert np.isclose(metrics.update("foo", 3), 2)
    assert np.isclose(metrics.update("foo", 4), 3)
    metrics.reset(["foo"])
    assert np.isclose(metrics.update("foo", 10), 10)


def test_schedule_matches_torch_cosine_warm_restarts():
    torch = pytest.importorskip("torch")
    t0, tmult, eta_min, base_lr = 10, 10, 8e-6, 8e-4
    steps_per_epoch = 50

    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=tmult, eta_min=eta_min
    )
    schedule = cosine_annealing_warm_restarts(base_lr, t0, tmult, eta_min, steps_per_epoch)

    # The reference steps with fractional epoch epoch + (b-1)/B (train.py:475-477).
    for epoch in range(0, 130, 7):
        for batch_idx in (1, 17, 50):
            frac = epoch + (batch_idx - 1) / steps_per_epoch
            sched.step(frac)
            expected = opt.param_groups[0]["lr"]
            got = float(schedule(epoch * steps_per_epoch + (batch_idx - 1)))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-9)


def _micro_model():
    config = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    return AdaptiveScaling(config=config)


def _micro_batches(rng, b=8, hw=32, p=8):
    fdf = 2  # rough/precise upsampling factor 2 -> H/2 features
    fh = hw // fdf
    rough = {
        "image": rng.uniform(0, 255, (b, hw, hw, 3)).astype(np.float32),
        "downsampled_mask": (rng.uniform(size=(b, fh, fh)) > 0.5).astype(np.float32),
        "downsampled_score_map": rng.uniform(0, 10, (b, fh, fh)).astype(np.float32),
    }
    precise = {
        "image": rng.uniform(0, 255, (b, hw, hw, 3)).astype(np.float32),
        "downsampled_mask": (rng.uniform(size=(b, fh, fh)) > 0.5).astype(np.float32),
        "downsampled_score_map": rng.uniform(0, 1, (b, fh, fh)).astype(np.float32),
        "downsampled_label_point_y": rng.integers(0, fh, (b, p)),
        "downsampled_label_point_x": rng.integers(0, fh, (b, p)),
        "up_left_offsets": rng.uniform(-4, 4, (b, p, 2)).astype(np.float32),
        "corner_angles": rng.dirichlet(np.ones(4), size=(b, p)).astype(np.float32),
        "corner_distances": rng.uniform(0, 10, (b, p, 3)).astype(np.float32),
    }
    return rough, precise


def _step_config(hw=32):
    fh = hw // 2
    box = CoreBox(0, fh - 1, 0, fh - 1)
    return TrainStepConfig(rough_core_box=box, precise_core_box=box)


def test_train_step_with_precise_char_mask_head():
    """Optional precise char-mask head + its focal loss term
    (model config :46-48, loss config :136, both default-off)."""
    from adascale.losses import AdaptiveScalingPreciseLossConfig

    config = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
        precise_enable_char_mask_head=True,
    )
    model = AdaptiveScaling(config=config)
    rough, precise = _micro_batches(np.random.default_rng(1), b=2)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    assert "precise_char_mask_head" in params
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params))

    fh = 16
    box = CoreBox(0, fh - 1, 0, fh - 1)
    step_config = TrainStepConfig(
        precise_loss=AdaptiveScalingPreciseLossConfig(char_mask_focal_factor=1.0),
        rough_core_box=box,
        precise_core_box=box,
    )
    step = make_train_step(model, tx, step_config, donate=False)
    state2, metrics = step(state, key, rough, precise)
    assert np.isfinite(float(metrics["precise_loss"]))
    # The mask head's params must receive gradient (they changed).
    a = state.params["precise_char_mask_head"]
    b = state2.params["precise_char_mask_head"]
    diff = max(
        float(jnp.abs(x - y).max()) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
    assert diff > 0


def test_train_step_remat_matches():
    """remat=True (jax.checkpoint) must produce identical metrics and
    updates — it changes memory/FLOPs, never semantics."""
    model = _micro_model()
    rough, precise = _micro_batches(np.random.default_rng(2), b=2)
    key = jax.random.PRNGKey(3)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)

    results = []
    for remat in (False, True):
        import dataclasses as dc

        cfg = dc.replace(_step_config(), remat=remat)
        state = TrainState(params=params, opt_state=tx.init(params))
        step = make_train_step(model, tx, cfg, donate=False)
        state2, metrics = step(state, key, rough, precise)
        results.append((state2, metrics))
    (s_a, m_a), (s_b, m_b) = results
    np.testing.assert_allclose(
        float(m_a["rough_loss"]), float(m_b["rough_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_a["precise_loss"]), float(m_b["precise_loss"]), rtol=1e-6
    )
    # Recompute may reorder reductions -> tiny float drift through AdamW.
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_upernext():
    """The UPerNeXt product config must train end-to-end exactly like FPN
    (the flagship_upernext recipe runs it unattended for hours — this
    pins the grad path at micro scale, bf16 like the recipe)."""
    config = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.UPERNEXT,
        custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
    )
    model = AdaptiveScaling(config=config, dtype=jnp.bfloat16)
    rough, precise = _micro_batches(np.random.default_rng(4), b=2)
    key = jax.random.PRNGKey(5)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params))
    step = make_train_step(model, tx, _step_config(), donate=False)
    state2, metrics = step(state, key, rough, precise)
    assert np.isfinite(float(metrics["rough_loss"]))
    assert np.isfinite(float(metrics["precise_loss"]))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_single_device():
    model = _micro_model()
    rng_np = np.random.default_rng(0)
    rough, precise = _micro_batches(rng_np)
    key = setup_seeds()
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params))

    step = make_train_step(model, tx, _step_config(), donate=False)
    state2, metrics = step(state, key, rough, precise)
    assert np.isfinite(float(metrics["rough_loss"]))
    assert np.isfinite(float(metrics["precise_loss"]))
    # Params changed.
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0

    eval_step = make_eval_step(model, _step_config())
    em = eval_step(state2.params, rough, precise)
    assert np.isfinite(float(em["rough_loss"]))


def test_bf16_backbone_receives_gradient_signal():
    """Regression: under bf16 compute the residual stream must stay f32 —
    with layer-scale init 1e-6 a bf16 residual add rounds the block
    contribution away, the forward stops depending on the block params,
    and backbone MLP grads vanish (observed as a hardware training
    flatline). Pin: one step must move the deepest block's mlp weights by
    an amount comparable to the f32 step."""
    rng_np = np.random.default_rng(0)
    rough, precise = _micro_batches(rng_np, b=2)
    key = setup_seeds()

    def mlp_delta(dtype):
        config = AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,
            custom_block_channels_and_num_layers=((8, 1), (16, 1), (32, 1), (64, 1)),
        )
        model = AdaptiveScaling(config=config, dtype=dtype)
        params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
        tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
        state = TrainState(params=params, opt_state=tx.init(params))
        step = make_train_step(model, tx, _step_config(), donate=False)
        state2, _ = step(state, key, rough, precise)

        def pick(tree):
            node = tree["backbone"]
            # deepest stage's first layer's mlp_up kernel
            stage = node[sorted(k for k in node if k.startswith("stage"))[-1]]
            layer = stage[sorted(k for k in stage if k.startswith("layer"))[0]]
            return layer["mlp_up"]["kernel"]

        return float(jnp.abs(pick(state2.params) - pick(state.params)).mean())

    d32 = mlp_delta(jnp.float32)
    d16 = mlp_delta(jnp.bfloat16)
    assert d32 > 0
    assert d16 > 0.2 * d32, (d16, d32)


def test_train_step_hybrid_mesh_2x4():
    """Multi-slice layout: (dcn=2, data=4) hybrid mesh — grad reduction
    decomposes hierarchically; losses must match the plain single-device
    step bit-for-bit-ish."""
    from adascale.parallel import create_hybrid_mesh

    cpus = jax.devices("cpu")
    mesh = create_hybrid_mesh(2, cpus[:8])
    assert mesh.axis_names == ("dcn", "data")

    model = _micro_model()
    rough, precise = _micro_batches(np.random.default_rng(3), b=8)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = replicate(TrainState(params=params, opt_state=tx.init(params)), mesh)

    step = make_train_step(model, tx, _step_config(), mesh=mesh, donate=False)
    _, metrics = step(state, key, shard_batch(rough, mesh), shard_batch(precise, mesh))

    plain = make_train_step(model, tx, _step_config(), donate=False)
    _, metrics_plain = plain(
        TrainState(params=params, opt_state=tx.init(params)), key, rough, precise
    )
    np.testing.assert_allclose(
        float(metrics["rough_loss"]), float(metrics_plain["rough_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["precise_loss"]), float(metrics_plain["precise_loss"]), rtol=1e-5
    )


def test_train_step_data_parallel_8_devices():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, "conftest should force 8 virtual CPU devices"
    mesh = create_mesh(cpus[:8])

    model = _micro_model()
    rng_np = np.random.default_rng(1)
    rough, precise = _micro_batches(rng_np, b=8)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params))

    state = replicate(state, mesh)
    rough_s = shard_batch(rough, mesh)
    precise_s = shard_batch(precise, mesh)

    step = make_train_step(model, tx, _step_config(), mesh=mesh, donate=False)
    state2, metrics = step(state, key, rough_s, precise_s)
    assert np.isfinite(float(metrics["rough_loss"]))

    # DP must equal single-device (same batch, same params): run the plain
    # step on the unsharded batch and compare losses.
    plain = make_train_step(model, tx, _step_config(), donate=False)
    state_plain = TrainState(params=params, opt_state=tx.init(params))
    _, metrics_plain = plain(state_plain, key, rough, precise)
    np.testing.assert_allclose(
        float(metrics["rough_loss"]), float(metrics_plain["rough_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["precise_loss"]), float(metrics_plain["precise_loss"]), rtol=1e-4
    )


def test_grad_inspection():
    model = _micro_model()
    rng_np = np.random.default_rng(2)
    rough, precise = _micro_batches(rng_np, b=2)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    inspect = make_grad_inspection_fn(model, _step_config())
    stats = inspect(params, key, rough, precise)
    for v in stats.values():
        assert np.isfinite(float(v))

    # Per-parameter mode: one rough + one precise abs-mean per shared
    # (backbone) leaf, finite, and consistent with the aggregate keys.
    inspect_pp = make_grad_inspection_fn(model, _step_config(), per_parameter=True)
    stats_pp = inspect_pp(params, key, rough, precise)
    pp_rough = [k for k in stats_pp if k.endswith(":rough_abs_mean")]
    pp_precise = [k for k in stats_pp if k.endswith(":precise_abs_mean")]
    n_backbone_leaves = len(jax.tree.leaves(params["backbone"]))
    assert len(pp_rough) == len(pp_precise) == n_backbone_leaves
    assert all(k.startswith("backbone/") for k in pp_rough)
    for k in pp_rough + pp_precise:
        assert np.isfinite(float(stats_pp[k])), k


def test_checkpoint_roundtrip(tmp_path):
    from adascale.training import restore_checkpoint, save_checkpoint, latest_checkpoint_path

    model = _micro_model()
    key = jax.random.PRNGKey(3)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params))

    rough, precise = _micro_batches(np.random.default_rng(4), b=2)
    step = make_train_step(model, tx, _step_config(), donate=False)
    state, _ = step(state, key, rough, precise)

    save_checkpoint(str(tmp_path), state, epoch_idx=5, best=False)
    path = latest_checkpoint_path(str(tmp_path))
    assert path and path.endswith("state_5_not_best")

    template = TrainState(params=params, opt_state=tx.init(params))
    restored = restore_checkpoint(path, template)
    assert restored["epoch_idx"] == 5
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored["state"].params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # Step surgery (reference reset_epoch_idx_to_value, train.py:332-338).
    restored2 = restore_checkpoint(path, template, reset_step=70)
    counts = [
        x for path_, x in jax.tree_util.tree_flatten_with_path(restored2["state"].opt_state)[0]
        if any(getattr(k, "name", None) == "count" for k in path_)
    ]
    assert counts and all(int(c) == 70 for c in counts)


def test_restore_with_new_optimizer(tmp_path):
    """Reference restore-time schedule surgery (train.py:316-335): restore
    saved moments + count into a tx rebuilt with new lr/eta_min."""
    import pytest

    from adascale.training import save_checkpoint
    from adascale.training.checkpoint import restore_with_new_optimizer

    model = _micro_model()
    key = jax.random.PRNGKey(5)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    tx1, _ = build_optimizer(OptimizerConfig(), steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx1.init(params))
    rough, precise = _micro_batches(np.random.default_rng(6), b=2)
    step = make_train_step(model, tx1, _step_config(), donate=False)
    state, _ = step(state, key, rough, precise)
    save_checkpoint(str(tmp_path), state, epoch_idx=2)
    path = f"{tmp_path}/state_2"

    # Same chain structure, new schedule hyperparameters: moments and the
    # step count must carry over.
    tx2, _ = build_optimizer(
        OptimizerConfig(
            adamw_lr=1e-4, cosine_annealing_warm_restarts_eta_min=1e-6
        ),
        steps_per_epoch=10,
    )
    restored = restore_with_new_optimizer(path, params, tx2)
    assert restored["epoch_idx"] == 2
    old_leaves = jax.tree.leaves(state.opt_state)
    new_leaves = jax.tree.leaves(restored["state"].opt_state)
    for x, y in zip(old_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # The restored state must actually train under the new tx.
    step2 = make_train_step(model, tx2, _step_config(), donate=False)
    state2, metrics = step2(restored["state"], key, rough, precise)
    assert np.isfinite(float(metrics["rough_loss"]))

    # reset_step rides through (the last_epoch analogue).
    restored3 = restore_with_new_optimizer(path, params, tx2, reset_step=30)
    counts = [
        x
        for p, x in jax.tree_util.tree_flatten_with_path(
            restored3["state"].opt_state
        )[0]
        if any(getattr(k, "name", None) == "count" for k in p)
    ]
    assert counts and all(int(c) == 30 for c in counts)

    # Structural change (clip removed) cannot host the saved state.
    tx3, _ = build_optimizer(
        OptimizerConfig(clip_grad_norm_max_norm=None), steps_per_epoch=10
    )
    with pytest.raises(ValueError, match="structure"):
        restore_with_new_optimizer(path, params, tx3)


def test_assemble_batch_matches_shard_batch():
    """Multi-host input path: assemble_batch
    (jax.make_array_from_process_local_data) must produce arrays identical
    to shard_batch single-process, with the same shardings."""
    from adascale.parallel import assemble_batch, create_mesh, shard_batch

    cpus = jax.devices("cpu")
    mesh = create_mesh(cpus[:8])
    batch = {
        "image": np.random.default_rng(0).uniform(0, 255, (8, 16, 16, 3)).astype(np.float32),
        "mask": (np.random.default_rng(1).uniform(size=(8, 8, 8)) > 0.5).astype(np.uint8),
    }
    a = shard_batch(batch, mesh)
    b = assemble_batch(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_local_batch_size_and_seed_helpers(monkeypatch):
    from adascale.parallel import local_batch_size, per_process_seed
    from adascale.parallel import mesh as mesh_mod

    # Single-process: identity / base seed.
    assert local_batch_size(6) == 6
    assert per_process_seed(13371) == 13371

    # Simulated 4-host topology: even split, divisibility enforced, and
    # distinct per-process generator seeds.
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 4)
    assert local_batch_size(8) == 2
    with pytest.raises(ValueError, match="not divisible"):
        local_batch_size(6)
    monkeypatch.setattr(mesh_mod.jax, "process_index", lambda: 3)
    assert per_process_seed(13371) == 13371 + 3 * 7919
