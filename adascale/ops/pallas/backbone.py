"""Functional ConvNeXt backbone forward with Pallas-fused blocks.

Consumes the *same* param pytree as ``adascale.models.ConvNeXt`` (param
names/shapes unchanged, so checkpoints are interchangeable) but runs every
residual block through the fused Pallas kernel
(adascale/ops/pallas/convnext_block.py). Stem / inter-stage downsample
patchify convs and stage LayerNorms stay XLA — they are stride-equal
matmuls the MXU already handles optimally.

Inference path only (stochastic depth = identity). Training uses the Flax
module, which autodiffs.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .convnext_block import fused_convnext_block


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
            )
        x = _layer_norm(x, stage["ln"])
        features.append(x)
        if stage_idx + 1 < len(specs):
            x = _patchify_conv(x, stage["downsample"], 2)
    return features
