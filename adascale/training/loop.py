"""End-to-end training driver.

Mirrors the reference experiment driver (/root/reference/experiment/
adaptive_scaling/train.py:54-605): config hydration + echo-to-run-folder
provenance, dev-set pre-generation, per-epoch-index dataset curriculum,
alternating-task gradient accumulation (one optimizer step per rough+precise
pair, each loss / 2), sliding-window metrics logged every 4 batches,
dev evaluation each epoch, and best/curriculum/final checkpointing.

TPU-native differences: the step is one jitted function (grads of
rough/2 + precise/2 in a single backward); data parallelism is a mesh
argument away; checkpoints are orbax pytrees of {epoch_idx, params,
opt_state} (scheduler state is implied by the optax step count).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import shutil
import statistics
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import (
    AdaptiveScalingDatasetConfig,
    AdaptiveScalingIterableDataset,
    SynthPipelineConfig,
    collate_samples,
)
from ..data.prefetch import BatchPrefetcher
from ..losses import (
    AdaptiveScalingPreciseLossConfig,
    AdaptiveScalingRoughLossConfig,
    CoreBox,
)
from ..models import AdaptiveScaling, AdaptiveScalingConfig
from ..parallel import create_mesh, replicate, shard_batch
from ..utils.config import config_to_dict, dump_config, load_config
from .checkpoint import TrainState, restore_checkpoint, save_checkpoint
from .metrics import Metrics
from .optimizer import OptimizerConfig, build_optimizer
from .opt import calculate_iterable_dataset_num_samples, setup_seeds
from .train_step import TrainStepConfig, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class EpochConfig:
    """Reference train.py:54-69."""

    jax_seed: int = 133
    num_epochs: int = 110
    num_page_char_regression_labels: int = 200
    train_num_batches: int = 1000
    train_batch_size: int = 6
    train_rng_seed: int = 13371
    train_num_processes: int = 10
    dev_num_batches: int = 70
    dev_batch_size: int = 22
    dev_rng_seed: int = 13
    dev_num_processes: int = 32
    avg_num_batches: int = 50
    enable_overfit_testing: bool = False
    enable_multitask_gradiant_inspection: bool = False
    # With inspection on, also log each shared (backbone) parameter's
    # per-task gradient abs-mean — the reference's named-intersection
    # granularity (adaptive_scaling.py:189-212).
    multitask_gradiant_inspection_per_parameter: bool = False
    # Tracing/profiling (SURVEY.md §5: the reference only has manual
    # torch.autograd profiling in tests; here the main path is hookable):
    # >0 traces that many leading batches of epoch 0 into
    # <output_folder>/profile with jax.profiler (view in TensorBoard /
    # xprof), and every batch gets a StepTraceAnnotation.
    profile_num_batches: int = 0
    # jax.checkpoint rematerialization in the train step (more FLOPs,
    # much less activation memory -> larger per-chip batches).
    remat: bool = False
    # Background-thread batch prefetching: collate + device_put of batch
    # N+1 overlapped with step N (the role of the reference's DataLoader
    # workers, train.py:341-352). 0 disables; >=1 sets the queue depth.
    prefetch_depth: int = 2
    # Activation/compute dtype for the model ('bfloat16' on TPU doubles
    # MXU throughput). Params, optimizer state and all loss math stay
    # float32 (the train step casts head outputs up before the losses).
    compute_dtype: str = "float32"
    # Yield each generated train pair this many times (shuffled replay,
    # independent P-label re-draws; data/dataset.py sample_reuse). Lifts
    # the steps/s ceiling on generation-CPU-bound hosts at the cost of
    # fewer unique pages per epoch. 1 = off.
    train_sample_reuse: int = 1


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Reference train.py:99-104: per-epoch-index curriculum."""

    train_adaptive_scaling_dataset_steps_jsons: Sequence[str] = ()
    train_rng_seeds: Sequence[int] = ()
    epoch_indices: Sequence[int] = (0,)
    dev_adaptive_scaling_dataset_steps_json: Optional[str] = None


def _clean_batch(batch: Dict) -> Dict:
    """Keep only array leaves for the jitted step (shape/core-box/rng-state
    metadata are static or host-side), compacted for transfer: images as
    uint8 (integral 0-255 by construction), 0/1 masks as uint8, dense
    score maps as float16 (heights ~1e-3 relative rounding, far below the
    label noise). The train/eval steps up-cast everything to f32 on
    device. Besides the 4x bandwidth saving, small transfers matter here
    because the experimental tunnel client leaks every H2D staging buffer
    (~bytes-per-step of host RSS per step; see launch.py auto-restart)."""
    drop = {"downsampled_shape", "downsampled_core_box", "rng_states"}
    out = {}
    for k, v in batch.items():
        if k in drop:
            continue
        if k == "image" or k == "downsampled_mask":
            # Already uint8 straight out of collate_samples; the cast is a
            # no-op guard for hand-built f32 batches (copy only if needed).
            out[k] = v if v.dtype == np.uint8 else v.astype(np.uint8)
        elif k == "downsampled_score_map":
            out[k] = v.astype(np.float16)
        else:
            out[k] = v
    return out


def _core_boxes_from_pipeline(pipeline: SynthPipelineConfig) -> Tuple[CoreBox, CoreBox]:
    f = pipeline.downsample_factor
    rd = pipeline.rough_crop_size // f
    rm = pipeline.rough_core_margin
    pd = pipeline.precise_crop_size // f
    pm = pipeline.precise_core_margin
    return (
        CoreBox(rm, rd - 1 - rm, rm, rd - 1 - rm),
        CoreBox(pm, pd - 1 - pm, pm, pd - 1 - pm),
    )


def train(
    dataset_config_json: Optional[str],
    output_folder: str,
    reset_output_folder: bool = False,
    epoch_config_json: Optional[str] = None,
    model_config_json: Optional[str] = None,
    optimizer_config_json: Optional[str] = None,
    rough_loss_config_json: Optional[str] = None,
    precise_loss_config_json: Optional[str] = None,
    restore_state_path: Optional[str] = None,
    restore_epoch_idx: bool = True,
    reset_epoch_idx_to_value: Optional[int] = None,
    init_params_path: Optional[str] = None,
    use_mesh: bool = False,
) -> Dict[str, float]:
    if reset_output_folder and os.path.isdir(output_folder):
        shutil.rmtree(output_folder)
    os.makedirs(output_folder, exist_ok=True)
    out_fd = output_folder

    handler = logging.FileHandler(os.path.join(out_fd, "log.txt"))
    handler.setFormatter(logging.Formatter("%(message)s   [%(asctime)s]"))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)

    # Config hydration + echo (train.py:132-194 provenance behavior).
    dataset_config = load_config(dataset_config_json, DatasetConfig)
    epoch_config = load_config(epoch_config_json, EpochConfig)
    model_config = load_config(model_config_json, AdaptiveScalingConfig)
    optimizer_config = load_config(optimizer_config_json, OptimizerConfig)
    rough_loss_config = load_config(rough_loss_config_json, AdaptiveScalingRoughLossConfig)
    precise_loss_config = load_config(
        precise_loss_config_json, AdaptiveScalingPreciseLossConfig
    )
    for name, cfg in [
        ("dataset_config", dataset_config),
        ("epoch_config", epoch_config),
        ("model_config", model_config),
        ("optimizer_config", optimizer_config),
        ("rough_loss_config", rough_loss_config),
        ("precise_loss_config", precise_loss_config),
    ]:
        logger.info("%s: %s", name, config_to_dict(cfg))
        dump_config(cfg, os.path.join(out_fd, f"{name}.json"))

    # NOTE: setup_seeds creates the root PRNGKey (further down) which
    # initializes the JAX backend and its threads; the dataset pools must
    # FORK BEFORE that happens (os.fork of a multithreaded process risks
    # deadlock in the children), so datasets are constructed first.
    #
    # Multi-host (use_mesh + >1 process): each host generates only its own
    # local_batch_size rows from a per-process-decorrelated stream, and
    # shard_batch assembles the global arrays without any host gathering
    # the full batch. Consulting jax here initializes the backend before
    # the pools fork — on multi-host jax.distributed.initialize() must run
    # first anyway, so that ordering already holds by construction.
    if use_mesh:
        from ..parallel import local_batch_size, per_process_seed

        local_train_bs = local_batch_size(epoch_config.train_batch_size)
        local_dev_bs = local_batch_size(epoch_config.dev_batch_size)
        seed_of = per_process_seed
    else:
        local_train_bs = epoch_config.train_batch_size
        local_dev_bs = epoch_config.dev_batch_size
        seed_of = lambda s: s  # noqa: E731

    train_num_samples = calculate_iterable_dataset_num_samples(
        local_train_bs, epoch_config.train_num_batches
    )
    dev_num_samples = calculate_iterable_dataset_num_samples(
        local_dev_bs, epoch_config.dev_num_batches
    )

    # Dev dataset (pre-generated + cached, train.py:221-233).
    dev_dataset = None
    if not epoch_config.enable_overfit_testing and not (
        epoch_config.enable_multitask_gradiant_inspection
    ):
        dev_dataset = AdaptiveScalingIterableDataset(
            AdaptiveScalingDatasetConfig(
                steps_json=dataset_config.dev_adaptive_scaling_dataset_steps_json,
                num_page_char_regression_labels=(
                    epoch_config.num_page_char_regression_labels
                ),
                num_samples=dev_num_samples,
                rng_seed=seed_of(epoch_config.dev_rng_seed),
                num_processes=epoch_config.dev_num_processes,
                is_dev=True,
            )
        )

    epoch_to_steps_json = dict(
        zip(
            dataset_config.epoch_indices,
            dataset_config.train_adaptive_scaling_dataset_steps_jsons
            or [dataset_config.dev_adaptive_scaling_dataset_steps_json]
            * len(dataset_config.epoch_indices),
        )
    )
    epoch_to_rng_seed = dict(
        zip(
            dataset_config.epoch_indices,
            dataset_config.train_rng_seeds
            or [epoch_config.train_rng_seed] * len(dataset_config.epoch_indices),
        )
    )

    def build_train_dataset(steps_json, rng_seed):
        if epoch_config.enable_overfit_testing:
            # Overfit testing (reference train.py:263-275): train on the DEV
            # pipeline with the rng resetting every dev_num_samples samples,
            # so the model sees the same small fixed set forever.
            return AdaptiveScalingIterableDataset(
                AdaptiveScalingDatasetConfig(
                    steps_json=dataset_config.dev_adaptive_scaling_dataset_steps_json,
                    num_page_char_regression_labels=(
                        epoch_config.num_page_char_regression_labels
                    ),
                    num_samples=train_num_samples,
                    num_samples_reset_rng=dev_num_samples,
                    rng_seed=seed_of(epoch_config.dev_rng_seed),
                    num_processes=epoch_config.train_num_processes,
                    num_cached_runs=max(1, epoch_config.train_num_processes) * 3,
                )
            )
        return AdaptiveScalingIterableDataset(
            AdaptiveScalingDatasetConfig(
                steps_json=steps_json,
                num_page_char_regression_labels=(
                    epoch_config.num_page_char_regression_labels
                ),
                num_samples=train_num_samples,
                rng_seed=seed_of(rng_seed),
                num_processes=epoch_config.train_num_processes,
                num_cached_runs=max(1, epoch_config.train_num_processes) * 3,
                sample_reuse=epoch_config.train_sample_reuse,
            )
        )

    train_dataset = build_train_dataset(
        epoch_to_steps_json.get(0), epoch_to_rng_seed.get(0, epoch_config.train_rng_seed)
    )

    key = setup_seeds(jax_seed=epoch_config.jax_seed)

    # Model + optimizer. compute_dtype only changes activation dtype;
    # params (init) and optimizer state are always float32.
    model = AdaptiveScaling(
        config=model_config, dtype=jnp.dtype(epoch_config.compute_dtype)
    )
    init_size = train_dataset.pipeline.rough_crop_size
    params = model.init(key, np.zeros((1, init_size, init_size, 3), np.float32))["params"]
    tx, schedule = build_optimizer(
        optimizer_config, steps_per_epoch=epoch_config.train_num_batches
    )
    state = TrainState(params=params, opt_state=tx.init(params))

    if init_params_path:
        # Params-only continuation: load weights from a compact ``.npz`` /
        # orbax dir / torch state dict (the committed-artifact formats,
        # inference/engine.py::load_params) into FRESH optimizer moments,
        # and put the schedule at ``reset_epoch_idx_to_value`` by setting
        # the optax step count — the reference's restore-time scheduler
        # surgery (train.py:316-335) for the case where only exported
        # weights survive. AdamW moments re-estimate within ~1k steps
        # (beta2=0.999); expect a small dev-loss transient in the first
        # resumed epoch.
        if restore_state_path:
            raise ValueError("init_params_path and restore_state_path are exclusive")
        from ..inference.engine import load_params

        loaded = load_params(init_params_path, model_config)
        new_params = jax.tree.map(
            lambda t, l: jnp.asarray(l, dtype=t.dtype), state.params, loaded
        )
        opt_state = state.opt_state
        if reset_epoch_idx_to_value:
            from .checkpoint import set_opt_step

            opt_state = set_opt_step(
                opt_state, reset_epoch_idx_to_value * epoch_config.train_num_batches
            )
        state = TrainState(params=new_params, opt_state=opt_state)

    rough_core, precise_core = _core_boxes_from_pipeline(train_dataset.pipeline)
    step_config = TrainStepConfig(
        rough_loss=rough_loss_config,
        precise_loss=precise_loss_config,
        rough_core_box=rough_core,
        precise_core_box=precise_core,
        remat=epoch_config.remat,
    )

    mesh = create_mesh() if use_mesh else None
    train_step = make_train_step(model, tx, step_config, mesh=mesh, donate=True)
    eval_step = make_eval_step(model, step_config, mesh=mesh)
    grad_inspect = None
    if epoch_config.enable_multitask_gradiant_inspection:
        from .train_step import make_grad_inspection_fn

        grad_inspect = make_grad_inspection_fn(
            model,
            step_config,
            per_parameter=epoch_config.multitask_gradiant_inspection_per_parameter,
        )
    if mesh is not None:
        state = replicate(state, mesh)

    metrics = Metrics(
        ["train_rough_loss", "train_precise_loss", "dev_rough_loss", "dev_precise_loss"],
        avg_num_batches=epoch_config.avg_num_batches,
    )

    epoch_idx = 0
    if restore_state_path:
        restored = restore_checkpoint(
            restore_state_path,
            state,
            reset_step=(
                reset_epoch_idx_to_value * epoch_config.train_num_batches
                if reset_epoch_idx_to_value
                else None
            ),
        )
        state = restored["state"]
        if restore_epoch_idx:
            epoch_idx = restored["epoch_idx"] + 1
    if reset_epoch_idx_to_value:
        epoch_idx = reset_epoch_idx_to_value

    best = {"dev_loss": float("inf"), "rough": float("inf"), "precise": float("inf")}
    last_metrics: Dict[str, float] = {}

    # Host-pipeline phase accounting (seconds spent in each stage of batch
    # production, reset per epoch): distinguishes generator starvation
    # ("pull") from collate cost from H2D transfer when diagnosing stalls.
    prefetch_phase = {"pull": 0.0, "collate": 0.0, "h2d": 0.0, "batches": 0}

    def make_batch_fn(dataset):
        """Closure pulling one collated, device-placed batch; runs on the
        prefetch thread so host work overlaps the device step."""
        batch_iter = iter(dataset)

        def make_batch():
            nonlocal batch_iter
            t0 = time.perf_counter()
            pairs = []
            for _ in range(local_train_bs):
                try:
                    pairs.append(next(batch_iter))
                except StopIteration:
                    batch_iter = iter(dataset)
                    pairs.append(next(batch_iter))
            t1 = time.perf_counter()
            batch = collate_samples(pairs)
            rough_b = _clean_batch(batch["rough"])
            precise_b = _clean_batch(batch["precise"])
            t2 = time.perf_counter()
            if mesh is not None:
                rough_b = shard_batch(rough_b, mesh)
                precise_b = shard_batch(precise_b, mesh)
            else:
                # H2D on the prefetch thread: over the sandbox's RPC tunnel
                # a transfer inside the main-thread dispatch serializes with
                # the device step (+~90 ms/step measured at flagship shapes,
                # tools/train_profile.py --loop-probe); device_put here
                # overlaps it with step N-1's compute instead.
                rough_b = jax.device_put(rough_b)
                precise_b = jax.device_put(precise_b)
            t3 = time.perf_counter()
            prefetch_phase["pull"] += t1 - t0
            prefetch_phase["collate"] += t2 - t1
            prefetch_phase["h2d"] += t3 - t2
            prefetch_phase["batches"] += 1
            return rough_b, precise_b

        return make_batch

    prefetcher = None
    if epoch_config.prefetch_depth > 0:
        prefetcher = BatchPrefetcher(
            make_batch_fn(train_dataset), depth=epoch_config.prefetch_depth
        )

    while epoch_idx < epoch_config.num_epochs:
        # Curriculum rebuild (train.py:359-391).
        if epoch_idx > 0 and epoch_idx in epoch_to_steps_json:
            logger.info("Curriculum reset at epoch %d", epoch_idx)
            if prefetcher is not None:
                prefetcher.stop()
            train_dataset.pool.cleanup()
            train_dataset = build_train_dataset(
                epoch_to_steps_json[epoch_idx], epoch_to_rng_seed[epoch_idx]
            )
            if prefetcher is not None:
                prefetcher = BatchPrefetcher(
                    make_batch_fn(train_dataset),
                    depth=epoch_config.prefetch_depth,
                )

        logger.info("Training epoch %d ...", epoch_idx)
        if prefetcher is not None:
            prefetcher.reset_stall_accounting()
        pending_metrics: List[Dict[str, jax.Array]] = []
        epoch_t0 = time.perf_counter()
        batch_iter = iter(train_dataset) if prefetcher is None else None
        for batch_idx in range(1, epoch_config.train_num_batches + 1):
            if prefetcher is not None:
                rough_b, precise_b = prefetcher.get()
            else:
                pairs = []
                for _ in range(local_train_bs):
                    try:
                        pairs.append(next(batch_iter))
                    except StopIteration:
                        batch_iter = iter(train_dataset)
                        pairs.append(next(batch_iter))
                batch = collate_samples(pairs)
                rough_b = _clean_batch(batch["rough"])
                precise_b = _clean_batch(batch["precise"])
                if mesh is not None:
                    rough_b = shard_batch(rough_b, mesh)
                    precise_b = shard_batch(precise_b, mesh)

            if (
                epoch_config.profile_num_batches > 0
                and epoch_idx == 0
                and batch_idx == 1
            ):
                jax.profiler.start_trace(os.path.join(out_fd, "profile"))
            key, step_key = jax.random.split(key)
            with jax.profiler.StepTraceAnnotation(
                "train", step_num=epoch_idx * epoch_config.train_num_batches + batch_idx
            ):
                state, step_metrics = train_step(state, step_key, rough_b, precise_b)
            if (
                epoch_config.profile_num_batches > 0
                and epoch_idx == 0
                and batch_idx
                == min(
                    epoch_config.profile_num_batches,
                    epoch_config.train_num_batches,
                )
            ):
                jax.tree.map(lambda x: x.block_until_ready(), state.params)
                jax.profiler.stop_trace()
                logger.info("profiler trace -> %s", os.path.join(out_fd, "profile"))
            if grad_inspect is not None:
                # Per-task gradient stats over shared params (reference
                # train.py:420-422,458-466 + model debug classmethods).
                gi = grad_inspect(state.params, step_key, rough_b, precise_b)
                logger.info(
                    "grad inspection: rough |g| mean=%.3e std=%.3e, "
                    "precise |g| mean=%.3e std=%.3e",
                    float(gi["rough_abs_grads_mean"]),
                    float(gi["rough_abs_grads_std"]),
                    float(gi["precise_abs_grads_mean"]),
                    float(gi["precise_abs_grads_std"]),
                )
                for k in sorted(gi):
                    if k.endswith(":rough_abs_mean"):
                        name = k[: -len(":rough_abs_mean")]
                        logger.info(
                            "grad inspection %s: rough=%.3e precise=%.3e",
                            name,
                            float(gi[k]),
                            float(gi[f"{name}:precise_abs_mean"]),
                        )
            # Defer the device->host metric fetch to the logging cadence:
            # float() blocks on step completion, and paying that sync every
            # step serializes the pipeline (the scalars themselves cost
            # ~2.5 ms once ready — train_profile.py --loop-probe). Losses
            # are tiny scalars, so holding 4 of them costs nothing.
            pending_metrics.append(step_metrics)
            if batch_idx % 4 == 0 or batch_idx >= epoch_config.train_num_batches:
                for m in pending_metrics:
                    rough_avg = metrics.update(
                        "train_rough_loss", float(m["rough_loss"])
                    )
                    precise_avg = metrics.update(
                        "train_precise_loss", float(m["precise_loss"])
                    )
                pending_metrics.clear()
                logger.info(
                    "E=%d, B=%d/%d, L_rough=%.5f, L_precise=%.5f, L_sum=%.5f",
                    epoch_idx,
                    batch_idx,
                    epoch_config.train_num_batches,
                    rough_avg,
                    precise_avg,
                    rough_avg + precise_avg,
                )

        if prefetcher is not None:
            # Data-stall fraction: wall time the loop spent blocked on
            # batches / epoch wall time. ~0 means the host pipeline keeps
            # the chip fed (the device-only steps/s is realized).
            epoch_wall = time.perf_counter() - epoch_t0
            stall_pct = 100.0 * prefetcher.stall_seconds / max(epoch_wall, 1e-9)
            logger.info(
                "E=%d, epoch_wall=%.1fs, data_stall=%.1f%% (%.1fs), "
                "prefetch pull=%.1fs collate=%.1fs h2d=%.1fs over %d batches",
                epoch_idx, epoch_wall, stall_pct, prefetcher.stall_seconds,
                prefetch_phase["pull"], prefetch_phase["collate"],
                prefetch_phase["h2d"], prefetch_phase["batches"],
            )
            prefetch_phase.update(pull=0.0, collate=0.0, h2d=0.0, batches=0)

        # Evaluation (train.py:490-576).
        dev_loss = None
        if dev_dataset is not None:
            metrics.reset(["dev_rough_loss", "dev_precise_loss"])
            dev_rough_losses: List[float] = []
            dev_precise_losses: List[float] = []
            dev_iter = iter(dev_dataset)
            for _ in range(epoch_config.dev_num_batches):
                pairs = []
                for _ in range(local_dev_bs):
                    try:
                        pairs.append(next(dev_iter))
                    except StopIteration:
                        dev_iter = iter(dev_dataset)
                        pairs.append(next(dev_iter))
                batch = collate_samples(pairs)
                rough_b = _clean_batch(batch["rough"])
                precise_b = _clean_batch(batch["precise"])
                if mesh is not None:
                    rough_b = shard_batch(rough_b, mesh)
                    precise_b = shard_batch(precise_b, mesh)
                em = eval_step(state.params, rough_b, precise_b)
                dev_rough_losses.append(float(em["rough_loss"]))
                dev_precise_losses.append(float(em["precise_loss"]))

            dev_rough = statistics.mean(dev_rough_losses)
            dev_precise = statistics.mean(dev_precise_losses)
            dev_loss = dev_rough + dev_precise
            logger.info(
                "E=%d, dev_rough_loss=%s, dev_precise_loss=%s, dev_loss=%s",
                epoch_idx, dev_rough, dev_precise, dev_loss,
            )
            if dev_rough < best["rough"]:
                best["rough"] = dev_rough
            if dev_precise < best["precise"]:
                best["precise"] = dev_precise
            last_metrics = {
                "dev_rough_loss": dev_rough,
                "dev_precise_loss": dev_precise,
                "dev_loss": dev_loss,
            }

        should_save = (
            (dev_loss is not None and dev_loss < best["dev_loss"])
            or (epoch_idx + 1) in epoch_to_steps_json
            or epoch_idx + 1 == epoch_config.num_epochs
        )
        if should_save:
            is_best = dev_loss is not None and dev_loss < best["dev_loss"]
            if is_best:
                best["dev_loss"] = dev_loss
            path = save_checkpoint(out_fd, state, epoch_idx, best=is_best)
            logger.info("E=%d, checkpoint -> %s", epoch_idx, path)

        epoch_idx += 1

    if prefetcher is not None:
        prefetcher.stop()
    train_dataset.pool.cleanup()
    return last_metrics


def export_inference_artifact(
    checkpoint_path: str,
    output_folder: str,
    model_config_json: Optional[str] = None,
) -> str:
    """Checkpoint -> deployable artifact {params (orbax), model_config.json}
    — the analogue of the reference's state_dict -> TorchScript chain
    (train.py:608-644)."""
    import orbax.checkpoint as ocp

    from .checkpoint import restore_pytree_numpy

    model_config = load_config(model_config_json, AdaptiveScalingConfig)
    os.makedirs(output_folder, exist_ok=True)

    restored = restore_pytree_numpy(checkpoint_path)
    params = restored["params"]
    target = os.path.abspath(os.path.join(output_folder, "params"))
    ocp.PyTreeCheckpointer().save(target, params)
    with open(os.path.join(output_folder, "model_config.json"), "w") as fout:
        json.dump(config_to_dict(model_config), fout, indent=2)
    return output_folder
