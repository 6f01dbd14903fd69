"""Checkpoint / resume via Orbax.

Reference semantics (train.py:91-97,307-338,586-603): a RestoreState of
{epoch_idx, model params, optimizer state, scheduler state} saved when dev
loss improves / at curriculum boundaries / at the last epoch, with
``_not_best`` suffixes for non-best saves; restore supports lr/schedule
surgery. Here the scheduler has no separate state — the lr is a pure
function of the optax step count — so "patching initial_lr / base_lrs /
eta_min" (train.py:316-335) amounts to rebuilding the optimizer with new
configs (done naturally at restore), and ``reset_epoch_idx_to_value``
maps to overriding the saved step count via ``reset_step``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_step import TrainState


def save_checkpoint(
    path: str,
    state: TrainState,
    epoch_idx: int,
    best: bool = True,
) -> str:
    """Save {epoch_idx, params, opt_state}; returns the directory written.
    Non-best checkpoints get a ``_not_best`` suffix (train.py:594-595)."""
    suffix = "" if best else "_not_best"
    target = os.path.abspath(f"{path}/state_{epoch_idx}{suffix}")
    checkpointer = ocp.PyTreeCheckpointer()
    payload = {
        "epoch_idx": np.asarray(epoch_idx),
        "params": state.params,
        "opt_state": state.opt_state,
    }
    checkpointer.save(target, payload)
    return target


def latest_checkpoint_path(folder: str) -> Optional[str]:
    if not os.path.isdir(folder):
        return None
    best_epoch, best_path = -1, None
    for name in os.listdir(folder):
        m = re.fullmatch(r"state_(\d+)(_not_best)?", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch, best_path = int(m.group(1)), os.path.join(folder, name)
    return best_path


def restore_checkpoint(
    path: str,
    template_state: TrainState,
    reset_step: Optional[int] = None,
) -> Dict[str, Any]:
    """Restore into the template's pytree structure/shardings.

    ``reset_step`` overrides the optimizer step count (the analogue of the
    reference's scheduler ``last_epoch`` surgery, train.py:332-334).
    Returns {'epoch_idx': int, 'state': TrainState}.
    """
    checkpointer = ocp.PyTreeCheckpointer()
    template = {
        "epoch_idx": np.asarray(0),
        "params": template_state.params,
        "opt_state": template_state.opt_state,
    }
    # Restore onto the template's devices/shardings (the checkpoint may have
    # been written from a different topology).
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = checkpointer.restore(
        os.path.abspath(path), item=template, restore_args=restore_args
    )
    opt_state = restored["opt_state"]
    if reset_step is not None:
        opt_state = set_opt_step(opt_state, reset_step)
    state = TrainState(params=restored["params"], opt_state=opt_state)
    return {"epoch_idx": int(restored["epoch_idx"]), "state": state}


def set_opt_step(opt_state: Any, step: int) -> Any:
    """Set every optax ``count`` leaf to ``step`` — the schedule position is
    a pure function of this count, so this IS the scheduler ``last_epoch``
    surgery of the reference (train.py:332-334). Used on restore and for
    params-only continuation (fresh moments, resumed schedule)."""
    return jax.tree.map(
        lambda t, x: (
            jax.numpy.asarray(step, dtype=x.dtype) if _is_count_leaf(t, x) else x
        ),
        _count_markers(opt_state),
        opt_state,
    )


def restore_with_new_optimizer(
    path: str,
    params_template: Any,
    new_tx: Any,
    reset_step: Optional[int] = None,
) -> Dict[str, Any]:
    """Restore a checkpoint into a *differently configured* optimizer.

    The explicit recipe for the reference's restore-time schedule surgery
    (train.py:316-335: patch ``initial_lr`` / ``base_lrs`` / ``eta_min`` /
    ``last_epoch`` on the live scheduler): in optax the schedule is a pure
    function baked into the transformation, not part of the state, so
    changing lr / eta_min / t0 / t_mult means rebuilding ``tx`` from a new
    ``OptimizerConfig`` and restoring the saved moments + step count into
    it. That works whenever the new chain has the same *structure* (same
    transforms, new hyperparameters); AdamW moments and the step count
    carry over, and ``reset_step`` optionally overrides the count (the
    ``last_epoch`` analogue).

    Raises ValueError when the saved opt-state cannot fit the new chain
    (e.g. grad-clip added/removed — that changes the chain structure; start
    from a fresh opt state in that case).
    """
    template_state = TrainState(
        params=params_template, opt_state=new_tx.init(params_template)
    )
    try:
        return restore_checkpoint(path, template_state, reset_step=reset_step)
    except Exception as exc:
        raise ValueError(
            "saved opt_state does not match the new optimizer's structure; "
            "lr/schedule hyperparameter changes are fine, but adding or "
            "removing transforms (e.g. clip_grad_norm) changes the chain — "
            "restore params only and init a fresh opt state instead"
        ) from exc


def restore_pytree_numpy(path: str) -> Any:
    """Restore an orbax pytree checkpoint as host numpy arrays, regardless of
    the topology it was written from (used for artifact export / inference
    param loading)."""
    checkpointer = ocp.PyTreeCheckpointer()
    target = os.path.abspath(path)
    meta = checkpointer.metadata(target).item_metadata.tree
    restore_args = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return checkpointer.restore(target, restore_args=restore_args)


def _count_markers(opt_state: Any) -> Any:
    """Pytree of booleans marking optax ``count`` leaves (scalar int32)."""
    flat, treedef = jax.tree.flatten_with_path(opt_state)
    markers = [
        any(getattr(k, "name", None) == "count" for k in path) for path, _ in flat
    ]
    return jax.tree.unflatten(treedef, markers)


def _is_count_leaf(marker: bool, leaf: Any) -> bool:
    return bool(marker) and np.ndim(leaf) == 0
