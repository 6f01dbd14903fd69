"""Manual profiling & dataset-inspection helpers.

Mirrors the reference's uncollected manual helpers:
  * profile_forward  <- profile_adaptive_scaling_jit_forward
    (tests/test_adaptive_scaling.py:103-116) — per-entry-point device
    timing; on TPU it also writes a jax.profiler trace for xprof.
  * sample_dataset   <- sample_adaptive_scaling_dataset (:179-332) —
    renders collated batches to JPEGs for eyeballing labels.
  * profile_dataset  <- profile_adaptive_scaling_dataset (:335-377) —
    wall-clock batch-latency statistics of the host data pipeline.
"""
from __future__ import annotations

import os
import statistics
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def profile_forward(
    model_config=None,
    resolution: int = 640,
    batch: int = 1,
    iters: int = 10,
    trace_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Times forward_rough / forward_precise (seconds per batch). Uses the
    chained-scan methodology (see bench.py) so numbers are honest even when
    the runtime's block_until_ready is asynchronous."""
    from ..models import AdaptiveScaling, AdaptiveScalingConfig

    model = AdaptiveScaling(config=model_config or AdaptiveScalingConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, resolution, resolution, 3), jnp.float32)
    )(jax.random.PRNGKey(1))

    results = {}
    for name, method in [
        ("forward_rough", model.forward_rough),
        ("forward_precise", model.forward_precise),
    ]:
        @jax.jit
        def chained(p, x, method=method):
            def body(img, _):
                out = model.apply({"params": p}, img, True, method=method)
                lead = jax.tree.leaves(out)[0]
                fb = (lead.astype(jnp.float32).mean() * 0.0).astype(img.dtype)
                return img + fb, lead.astype(jnp.float32).mean()
            _, means = jax.lax.scan(body, x, None, length=iters)
            return means.mean()

        float(chained(params, x))  # compile
        if trace_dir:
            jax.profiler.start_trace(os.path.join(trace_dir, name))
        t0 = time.perf_counter()
        float(chained(params, x))
        dt = (time.perf_counter() - t0) / iters
        if trace_dir:
            jax.profiler.stop_trace()
        results[name] = dt
    return results


def sample_dataset(
    steps_json: str,
    output_folder: str,
    num_batches: int = 2,
    batch_size: int = 2,
    num_page_char_regression_labels: int = 50,
    rng_seed: int = 0,
) -> None:
    """Renders rough/precise samples (mask, score map, label points) to
    JPEGs under output_folder."""
    from ..data.dataset import (
        AdaptiveScalingDatasetConfig,
        AdaptiveScalingIterableDataset,
    )
    from ..utils.painter import Painter

    os.makedirs(output_folder, exist_ok=True)
    dataset = AdaptiveScalingIterableDataset(
        AdaptiveScalingDatasetConfig(
            steps_json=steps_json,
            num_page_char_regression_labels=num_page_char_regression_labels,
            num_samples=num_batches * batch_size,
            rng_seed=rng_seed,
            num_processes=0,
        )
    )
    import cv2

    def to_image_space(core_map, sample):
        """Core-sized downsampled map -> full image resolution overlay."""
        dh, dw = sample.downsampled_shape
        full = np.zeros((dh, dw), dtype=np.float32)
        cb = sample.downsampled_core_box
        full[cb.up : cb.down + 1, cb.left : cb.right + 1] = core_map
        ih, iw = sample.image.shape[:2]
        return cv2.resize(full, (iw, ih), interpolation=cv2.INTER_NEAREST)

    it = iter(dataset)
    for idx in range(num_batches * batch_size):
        rough, precise = next(it)

        painter = Painter(rough.image)
        painter.paint_mask(to_image_space(rough.downsampled_mask, rough) > 0)
        painter.to_file(os.path.join(output_folder, f"{idx}_rough_mask.jpg"))

        painter = Painter(rough.image)
        painter.paint_score_map(to_image_space(rough.downsampled_score_map, rough))
        painter.to_file(os.path.join(output_folder, f"{idx}_rough_score.jpg"))

        painter = Painter(precise.image)
        painter.paint_mask(to_image_space(precise.downsampled_mask, precise) > 0)
        factor = precise.image.shape[0] / precise.downsampled_shape[0]
        # CharLabel tuples: (point_y, point_x, offsets, angles, distances).
        pts = np.asarray(
            [(lbl[1], lbl[0]) for lbl in precise.char_labels], dtype=np.float64
        )
        if len(pts):
            painter.paint_points(pts * factor)
        painter.to_file(os.path.join(output_folder, f"{idx}_precise_labels.jpg"))
    dataset.pool.cleanup()


def profile_dataset(
    steps_json: str,
    num_batches: int = 10,
    batch_size: int = 4,
    num_processes: int = 0,
    rng_seed: int = 0,
) -> Dict[str, float]:
    """Wall-clock latency stats of the host synth-data pipeline + collate."""
    from ..data.dataset import (
        AdaptiveScalingDatasetConfig,
        AdaptiveScalingIterableDataset,
        collate_samples,
    )

    dataset = AdaptiveScalingIterableDataset(
        AdaptiveScalingDatasetConfig(
            steps_json=steps_json,
            num_page_char_regression_labels=50,
            num_samples=num_batches * batch_size,
            rng_seed=rng_seed,
            num_processes=num_processes,
        )
    )
    it = iter(dataset)
    latencies = []
    for _ in range(num_batches):
        t0 = time.perf_counter()
        pairs = [next(it) for _ in range(batch_size)]
        collate_samples(pairs)
        latencies.append(time.perf_counter() - t0)
    dataset.pool.cleanup()
    return {
        "mean_s": statistics.mean(latencies),
        "median_s": statistics.median(latencies),
        "max_s": max(latencies),
        "batches_per_s": 1.0 / statistics.mean(latencies),
    }
