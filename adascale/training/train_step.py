"""Functional jitted train / eval steps.

The reference's hot loop (train.py:397-478) runs ``rough_loss.backward()``
then ``precise_loss.backward()`` so gradients *accumulate across both tasks*
before one clipped optimizer step (each loss pre-divided by 2,
train.py:413,451). The functional equivalent computes
``grad(rough_loss/2 + precise_loss/2)`` in a single backward — identical
math without mutable ``.grad`` state — then applies
clip_by_global_norm(2.5) + AdamW + cosine-warm-restarts inside one jitted,
mesh-sharded step.

Data parallelism: batches are sharded on their leading axis over the 'data'
mesh axis; params/opt-state are replicated; XLA's sharding propagation
inserts the psum grad all-reduce over ICI (SURVEY.md §2c).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..losses import (
    AdaptiveScalingPreciseLossConfig,
    AdaptiveScalingRoughLossConfig,
    CoreBox,
    precise_loss,
    rough_loss,
)
from ..parallel.mesh import batch_sharding, replicated_sharding


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    """Static loss configuration; the core boxes are per-dataset constants
    (collate contract, reference dataset/adaptive_scaling.py:353-363), so
    they are compile-time constants here."""

    rough_loss: AdaptiveScalingRoughLossConfig = AdaptiveScalingRoughLossConfig()
    precise_loss: AdaptiveScalingPreciseLossConfig = AdaptiveScalingPreciseLossConfig()
    rough_core_box: CoreBox = CoreBox(0, 0, 0, 0)
    precise_core_box: CoreBox = CoreBox(0, 0, 0, 0)
    # Rematerialization: recompute each forward during backward instead of
    # saving activations (jax.checkpoint) — trades ~1/3 more FLOPs for a
    # large activation-memory cut, enabling bigger per-chip batches.
    remat: bool = False
    # Run the backbone blocks through the fused Pallas kernel (custom-VJP,
    # recompute-based backward) instead of the Flax/XLA composition. TPU
    # only; grads are numerically the XLA ones (adascale/ops/pallas/
    # convnext_block.py::make_trainable_block).
    fused_backbone: bool = False


def _upcast_batch(batch):
    """Up-cast compact-transfer arrays (uint8 images/masks, f16 score
    maps) to f32 on device; integer label-point indices stay integer."""
    out = {}
    for k, v in batch.items():
        if jnp.issubdtype(v.dtype, jnp.integer) and k.startswith(
            "downsampled_label_point"
        ):
            out[k] = v
        elif v.dtype != jnp.float32:
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out


def _two_task_loss(
    model,
    params,
    rough_batch: Dict[str, jax.Array],
    precise_batch: Dict[str, jax.Array],
    rng: jax.Array,
    config: TrainStepConfig,
    deterministic: bool,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    rough_rng, precise_rng = jax.random.split(rng)

    # Accept compact-transfer batches (uint8 images/masks, f16 score maps
    # — see loop._clean_batch) by up-casting everything but the integer
    # label indices to f32 on device. No-op for f32 inputs.
    rough_batch = _upcast_batch(rough_batch)
    precise_batch = _upcast_batch(precise_batch)

    backbone_spec = None
    if config.fused_backbone:
        from ..models.convnext import CONVNEXT_PRESETS
        from ..ops.pallas import convnext_forward_pallas_train

        mc = model.config
        backbone_spec = (
            mc.custom_block_channels_and_num_layers
            if mc.custom_block_channels_and_num_layers is not None
            else CONVNEXT_PRESETS[
                mc.size.value if hasattr(mc.size, "value") else mc.size
            ]
        )

        def fused_features(p, image, fwd_rng):
            return tuple(
                convnext_forward_pallas_train(
                    p["backbone"],
                    image,
                    backbone_spec,
                    drop_path_rng=fwd_rng,
                    deterministic=deterministic,
                )
            )

    def rough_fwd(p, image, fwd_rng):
        if config.fused_backbone:
            return model.apply(
                {"params": p},
                fused_features(p, image, fwd_rng),
                method=model.forward_rough_from_features,
            )
        return model.apply(
            {"params": p},
            image,
            deterministic,
            rngs=None if deterministic else {"drop_path": fwd_rng},
            method=model.forward_rough,
        )

    if config.remat:
        rough_fwd = jax.checkpoint(rough_fwd)
    mask_feat, height_feat = rough_fwd(params, rough_batch["image"], rough_rng)
    # Losses always run in f32 — with a bf16 compute model the heads emit
    # bf16; log/exp-heavy loss math must not (no-op for f32 models).
    mask_feat = mask_feat.astype(jnp.float32)
    height_feat = height_feat.astype(jnp.float32)
    r_loss = (
        rough_loss(
            mask_feat,
            height_feat,
            rough_batch["downsampled_mask"],
            rough_batch["downsampled_score_map"],
            config.rough_core_box,
            config.rough_loss,
        )
        / 2.0
    )

    enable_mask_head = model.config.precise_enable_char_mask_head

    def precise_fwd(p, image, fwd_rng):
        if config.fused_backbone and not enable_mask_head:
            return model.apply(
                {"params": p},
                fused_features(p, image, fwd_rng),
                method=model.forward_precise_from_features,
            )
        return model.apply(
            {"params": p},
            image,
            deterministic,
            rngs=None if deterministic else {"drop_path": fwd_rng},
            method=(
                model.forward_precise_with_mask
                if enable_mask_head
                else model.forward_precise
            ),
        )

    if config.remat:
        precise_fwd = jax.checkpoint(precise_fwd)
    precise_out = precise_fwd(params, precise_batch["image"], precise_rng)
    precise_out = tuple(t.astype(jnp.float32) for t in precise_out)
    if enable_mask_head:
        precise_mask_logits, prob, offset, angle, distance = precise_out
    else:
        precise_mask_logits = None
        prob, offset, angle, distance = precise_out
    p_loss = (
        precise_loss(
            prob,
            offset,
            angle,
            distance,
            precise_batch["downsampled_score_map"],
            precise_batch["downsampled_mask"],
            config.precise_core_box,
            precise_batch["downsampled_label_point_y"],
            precise_batch["downsampled_label_point_x"],
            precise_batch["up_left_offsets"],
            precise_batch["corner_angles"],
            precise_batch["corner_distances"],
            config.precise_loss,
            precise_char_mask_feature=precise_mask_logits,
        )
        / 2.0
    )
    return r_loss + p_loss, (r_loss, p_loss)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config: TrainStepConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step:
    (state, rng, rough_batch, precise_batch) -> (state, metrics)."""

    def step(state: TrainState, rng, rough_batch, precise_batch):
        grad_fn = jax.value_and_grad(
            partial(_two_task_loss, model),
            has_aux=True,
        )
        (_, (r_loss, p_loss)), grads = grad_fn(
            state.params, rough_batch, precise_batch, rng, config, False
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"rough_loss": r_loss, "precise_loss": p_loss}
        return TrainState(params=params, opt_state=opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    model,
    config: TrainStepConfig,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build the jitted eval step: (params, rough_batch, precise_batch) ->
    {'rough_loss', 'precise_loss'} (losses pre-divided by 2, matching
    train.py:517,550)."""

    def step(params, rough_batch, precise_batch):
        _, (r_loss, p_loss) = _two_task_loss(
            model, params, rough_batch, precise_batch,
            jax.random.PRNGKey(0), config, True,
        )
        return {"rough_loss": r_loss, "precise_loss": p_loss}

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data, data), out_shardings=repl)


def make_grad_inspection_fn(
    model, config: TrainStepConfig, per_parameter: bool = False
) -> Callable:
    """Multitask gradient inspection (reference model debug classmethods,
    adaptive_scaling.py:179-237 + train.py:420-466): per-task gradient
    abs-mean/std over the *shared* parameters, computed functionally.

    ``per_parameter=True`` additionally reports each shared parameter's
    per-task abs-mean keyed by its tree path — the exact granularity of the
    reference's named-intersection inspection (it iterates the shared
    name set parameter by parameter, adaptive_scaling.py:189-212)."""

    def inspect(params, rng, rough_batch, precise_batch):
        rough_batch = _upcast_batch(rough_batch)
        precise_batch = _upcast_batch(precise_batch)

        def rough_only(p):
            mask_feat, height_feat = model.apply(
                {"params": p}, rough_batch["image"], True, method=model.forward_rough
            )
            return rough_loss(
                mask_feat, height_feat,
                rough_batch["downsampled_mask"], rough_batch["downsampled_score_map"],
                config.rough_core_box, config.rough_loss,
            ) / 2.0

        def precise_only(p):
            prob, offset, angle, distance = model.apply(
                {"params": p}, precise_batch["image"], True, method=model.forward_precise
            )
            return precise_loss(
                prob, offset, angle, distance,
                precise_batch["downsampled_score_map"],
                precise_batch["downsampled_mask"],
                config.precise_core_box,
                precise_batch["downsampled_label_point_y"],
                precise_batch["downsampled_label_point_x"],
                precise_batch["up_left_offsets"],
                precise_batch["corner_angles"],
                precise_batch["corner_distances"],
                config.precise_loss,
            ) / 2.0

        rough_grads = jax.grad(rough_only)(params)
        precise_grads = jax.grad(precise_only)(params)

        def flat_abs(tree):
            leaves = [jnp.abs(x).reshape(-1) for x in jax.tree.leaves(tree)]
            return jnp.concatenate(leaves)

        # The reference compares the two tasks' gradients over the *shared*
        # parameter set only (the name intersection of params touched by both
        # backwards, model/adaptive_scaling.py:189-212). Here the shared
        # subtree is exactly the backbone (each task has its own neck+heads);
        # restricting to it keeps task-specific head grads from polluting the
        # comparison this knob exists for.
        rough_abs = flat_abs(rough_grads["backbone"])
        precise_abs = flat_abs(precise_grads["backbone"])
        out = {
            "rough_abs_grads_mean": jnp.mean(rough_abs),
            "rough_abs_grads_std": jnp.std(rough_abs),
            "precise_abs_grads_mean": jnp.mean(precise_abs),
            "precise_abs_grads_std": jnp.std(precise_abs),
        }
        if per_parameter:
            flat_r = jax.tree_util.tree_flatten_with_path(rough_grads["backbone"])[0]
            flat_p = jax.tree_util.tree_flatten_with_path(precise_grads["backbone"])[0]
            for (path, gr), (_, gp) in zip(flat_r, flat_p):
                name = "backbone/" + "/".join(
                    str(getattr(k, "key", getattr(k, "name", k))) for k in path
                )
                out[f"{name}:rough_abs_mean"] = jnp.mean(jnp.abs(gr))
                out[f"{name}:precise_abs_mean"] = jnp.mean(jnp.abs(gp))
        return out

    return jax.jit(inspect)
