"""Serialized deployment artifacts: StableHLO export.

The reference's deployment chain is state_dict -> TorchScript
(train.py:635-644) -> optional ONNX with dynamic batch/H/W axes
(demo.py:223-243). The TPU-native analogue: ``jax.export`` serializes the
jitted ``forward_rough`` / ``forward_precise`` entry points to StableHLO
bytes, with symbolic batch/height/width dimensions when the model traces
polymorphically (fallback: static example shapes, still portable across
any runtime that loads StableHLO).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import AdaptiveScaling, AdaptiveScalingConfig
from ..utils.config import config_to_dict


def export_stablehlo(
    params: Any,
    model_config: AdaptiveScalingConfig,
    output_folder: str,
    example_hw: Tuple[int, int] = (640, 640),
    try_polymorphic: bool = True,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> dict:
    """Serialize forward_rough/forward_precise to ``<out>/*.stablehlo``.

    Returns a manifest dict {name: {path, polymorphic, example_shape}} and
    writes it to ``<out>/manifest.json`` next to the model config.
    """
    model = AdaptiveScaling(config=model_config)
    os.makedirs(output_folder, exist_ok=True)

    manifest = {}
    for name, method in [
        ("forward_rough", model.forward_rough),
        ("forward_precise", model.forward_precise),
    ]:
        def fn(p, x, method=method):
            return model.apply({"params": p}, x, method=method)

        exported = None
        polymorphic = False
        if try_polymorphic:
            try:
                # Any batch; H/W any multiple of 64 (backbone /32 stride x
                # reference bucket granularity) — mirrors the ONNX dynamic
                # axes (demo.py:233-242).
                scope = jax.export.SymbolicScope()
                b, h, w = jax.export.symbolic_shape("b, h, w", scope=scope)
                x_spec = jax.ShapeDtypeStruct((b, 64 * h, 64 * w, 3), jnp.float32)
                p_spec = jax.tree.map(
                    lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params
                )
                exported = jax.export.export(
                    jax.jit(fn), platforms=platforms
                )(p_spec, x_spec)
                polymorphic = True
            except Exception:  # noqa: BLE001 — fall back to static shapes
                exported = None
        if exported is None:
            eh, ew = example_hw
            x_spec = jax.ShapeDtypeStruct((1, eh, ew, 3), jnp.float32)
            p_spec = jax.tree.map(
                lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params
            )
            exported = jax.export.export(jax.jit(fn), platforms=platforms)(
                p_spec, x_spec
            )

        path = os.path.join(output_folder, f"{name}.stablehlo")
        with open(path, "wb") as fout:
            fout.write(exported.serialize())
        manifest[name] = {
            "path": os.path.basename(path),
            "polymorphic": polymorphic,
            "example_hw": list(example_hw),
        }

    with open(os.path.join(output_folder, "manifest.json"), "w") as fout:
        json.dump(manifest, fout, indent=2)
    with open(os.path.join(output_folder, "model_config.json"), "w") as fout:
        json.dump(config_to_dict(model_config), fout, indent=2)
    return manifest


def load_stablehlo(path: str):
    """Deserialize an exported entry point; call via ``.call(params, x)``."""
    with open(path, "rb") as fin:
        return jax.export.deserialize(fin.read())
