"""Functional ConvNeXt backbone forward with Pallas-fused blocks.

Consumes the *same* param pytree as ``adascale.models.ConvNeXt`` (param
names/shapes unchanged, so checkpoints are interchangeable) but runs every
residual block through the fused Pallas kernel
(adascale/ops/pallas/convnext_block.py). Stem / inter-stage downsample
patchify convs and stage LayerNorms stay XLA — they are stride-equal
matmuls the MXU already handles optimally.

``convnext_forward_pallas`` is the inference path (stochastic depth =
identity). ``convnext_forward_pallas_train`` is the differentiable variant:
fused Pallas forward per block via the custom-VJP trainable kernel, with
the linearly-scheduled stochastic depth (reference convnext.py:41-53,76)
applied *outside* the kernel as ``x + mask/keep * (block(x) - x)`` — the
same per-sample bernoulli semantics the Flax module has.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .convnext_block import fused_convnext_block, make_trainable_block


def _layer_norm(x: jax.Array, p: Any, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _patchify_conv(x: jax.Array, p: Any, stride: int) -> jax.Array:
    kernel = p["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def convnext_forward_pallas(
    params: Any,
    x: jax.Array,
    block_channels_and_num_layers: Sequence[Tuple[int, int]],
    stem_use_pconv2x2: bool = False,
    *,
    tile_h: int = 8,
    interpret: bool = False,
    dw_tap_major: bool = True,
    halo_thin: bool = False,
) -> List[jax.Array]:
    """(B, H, W, 3) -> 4 pyramid features; twin of ConvNeXt.__call__
    (adascale/models/convnext.py:168-202) with Pallas-fused blocks."""
    specs = tuple(block_channels_and_num_layers)
    stem_k = 2 if stem_use_pconv2x2 else 4
    x = _patchify_conv(x, params["stem_conv"], stem_k)
    x = _layer_norm(x, params["stem_ln"])

    features: List[jax.Array] = []
    for stage_idx, (_, num_layers) in enumerate(specs):
        stage = params[f"stage{stage_idx}"]
        for layer_idx in range(num_layers):
            lp = stage[f"layer{layer_idx}"]
            x = fused_convnext_block(
                x,
                lp["dwconv"]["kernel"],
                lp["dwconv"]["bias"],
                lp["ln"]["scale"],
                lp["ln"]["bias"],
                lp["mlp_up"]["kernel"],
                lp["mlp_up"]["bias"],
                lp["mlp_down"]["kernel"],
                lp["mlp_down"]["bias"],
                lp["block_scale"],
                tile_h=tile_h,
                interpret=interpret,
                dw_tap_major=dw_tap_major,
                halo_thin=halo_thin,
            )
        x = _layer_norm(x, stage["ln"])
        features.append(x)
        if stage_idx + 1 < len(specs):
            x = _patchify_conv(x, stage["downsample"], 2)
    return features


def convnext_forward_pallas_train(
    params: Any,
    x: jax.Array,
    block_channels_and_num_layers: Sequence[Tuple[int, int]],
    drop_path_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    stem_use_pconv2x2: bool = False,
    *,
    tile_h: int = 8,
    interpret: bool = False,
) -> List[jax.Array]:
    """Differentiable twin of ``convnext_forward_pallas``: fused Pallas
    block forwards with recompute-based XLA backwards, plus the Flax
    backbone's scheduled stochastic depth (adascale/models/convnext.py:
    99-106) applied around each fused block.

    Runs in f32 regardless of input dtype: the kernel's residual add at
    the layer-scale-1e-6 init underflows in bf16 (training flatlines —
    see the f32-residual-stream note in models/convnext.py), and measured
    on v5e the fused path only beats XLA at f32 anyway (BASELINE.md)."""
    x = x.astype(jnp.float32)
    specs = tuple(block_channels_and_num_layers)
    block = make_trainable_block(tile_h=tile_h, interpret=interpret)
    stem_k = 2 if stem_use_pconv2x2 else 4
    x = _patchify_conv(x, params["stem_conv"], stem_k)
    x = _layer_norm(x, params["stem_ln"])

    num_layers_sum = sum(n for _, n in specs)
    layer_idx_end = max(num_layers_sum - 1, 1)
    global_layer = 0

    features: List[jax.Array] = []
    for stage_idx, (_, num_layers) in enumerate(specs):
        stage = params[f"stage{stage_idx}"]
        for layer_idx in range(num_layers):
            lp = stage[f"layer{layer_idx}"]
            out = block(
                x,
                lp["dwconv"]["kernel"],
                lp["dwconv"]["bias"],
                lp["ln"]["scale"],
                lp["ln"]["bias"],
                lp["mlp_up"]["kernel"],
                lp["mlp_up"]["bias"],
                lp["mlp_down"]["kernel"],
                lp["mlp_down"]["bias"],
                lp["block_scale"],
            )
            prob_bypass = 0.1 * global_layer / layer_idx_end
            if not deterministic and prob_bypass > 0.0 and drop_path_rng is not None:
                keep_prob = 1.0 - prob_bypass
                layer_rng = jax.random.fold_in(drop_path_rng, global_layer)
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = jax.random.bernoulli(layer_rng, keep_prob, shape=shape)
                branch = out - x
                x = x + jnp.where(mask, branch / keep_prob, jnp.zeros_like(branch))
            else:
                x = out
            global_layer += 1
        x = _layer_norm(x, stage["ln"])
        features.append(x)
        if stage_idx + 1 < len(specs):
            x = _patchify_conv(x, stage["downsample"], 2)
    return features
