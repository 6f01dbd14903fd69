"""Batched multi-page serving: ``detect_many`` — throughput mode.

The reference engine is strictly page-at-a-time, batch 1 (inferencing/
adaptive_scaling.py:117-121 unsqueeze). For production serving on TPU the
MXU wants batches: this mode

  * resizes/pads every page to ONE shared shape bucket on device,
  * runs the rough pass as a single batched forward (optionally sharded
    over a data mesh — params replicated, batch split over ICI),
  * does the per-page host geometry (flatten/rescale/stack),
  * pads the per-page stacked images to a shared bucket and runs the
    precise pass as a second single batched forward,
  * finishes the per-page polygon build on host.

Pad-region invalidation is done per page on host (numpy, trivially cheap)
because valid shapes differ across pages while the device program must be
shape-static.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .engine import AdaptiveScalingInference, PreciseInferResult, RoughInferResult
from .preprocess import compute_rough_shapes


class BatchedAdaptiveScalingInference:
    """Wraps an AdaptiveScalingInference for multi-page throughput.

    ``mesh``: optional jax.sharding.Mesh with a 'data' axis; the batched
    forwards shard pages across it. Batch is padded up to a multiple of the
    mesh size with zero pages (results dropped).
    """

    def __init__(self, engine: AdaptiveScalingInference, mesh: Optional[Any] = None):
        self.engine = engine
        self.mesh = mesh
        self._rough_cache: Dict = {}
        self._precise_cache: Dict = {}

    # ----------------------------------------------------------- jitted fns

    def _batched_rough_fn(self, batch_shape):
        if batch_shape in self._rough_cache:
            return self._rough_cache[batch_shape]
        cfg = self.engine.config
        engine = self.engine

        def fn(params, images):
            with jax.default_matmul_precision(cfg.matmul_precision):
                mask_logits, height = engine._forward(params, images, "rough")
            mask = jax.nn.sigmoid(mask_logits[..., 0].astype(jnp.float32))
            mask = (mask >= cfg.rough_char_mask_positive_thr).astype(jnp.uint8)
            height = height[..., 0].astype(jnp.float32)
            height = jnp.where(
                height < cfg.rough_valid_char_height_min, 0.0, height
            )
            return mask, height

        jitted = self._shard_jit(fn)
        self._rough_cache[batch_shape] = jitted
        return jitted

    def _batched_precise_fn(self, batch_shape):
        if batch_shape in self._precise_cache:
            return self._precise_cache[batch_shape]
        cfg = self.engine.config
        engine = self.engine

        def fn(params, images):
            with jax.default_matmul_precision(cfg.matmul_precision):
                prob_logits, offset, angle_logits, distance = engine._forward(
                    params, images, "precise"
                )
            prob = jax.nn.sigmoid(prob_logits[..., 0].astype(jnp.float32))
            angles = jax.nn.softmax(angle_logits.astype(jnp.float32), axis=-1)
            return prob, offset.astype(jnp.float32), angles, distance

        jitted = self._shard_jit(fn)
        self._precise_cache[batch_shape] = jitted
        return jitted

    def _shard_jit(self, fn):
        if self.mesh is None:
            return jax.jit(fn)
        from ..parallel.mesh import batch_sharding, replicated_sharding

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        return jax.jit(fn, in_shardings=(repl, data))

    # -------------------------------------------------------------- helpers

    def _pad_batch(self, n: int) -> int:
        if self.mesh is None:
            return n
        size = self.mesh.devices.size
        return math.ceil(n / size) * size

    # ------------------------------------------------------------------ API

    def detect_many(self, images: Sequence[np.ndarray]) -> List[Dict[str, Any]]:
        """Full two-stage pipeline over a list of pages; returns one detect()
        result dict per page.

        Boundary-band caveat: all pages share one padded shape bucket, and
        pad pixels are not conv-neutral after LayerNorm/bias, so rough/precise
        maps can differ from single-page ``detect()`` in a narrow band near
        each page's valid-region edge. Detections well inside the page are
        identical; detections hugging the page edge may differ slightly
        between the two serving modes (tests pin >=97% mask agreement).
        """
        engine = self.engine
        cfg = engine.config
        n = len(images)
        if n == 0:
            return []
        # Feature-downsample factors differ per head when the two head
        # upsampling knobs are configured independently (engine.py:176,376).
        fdf = 4 // cfg.rough_head_upsampling_factor
        pfdf = 4 // cfg.precise_head_upsampling_factor

        # ---- shared rough bucket over all pages.
        per_page = [
            compute_rough_shapes(
                im.shape[0],
                im.shape[1],
                short_side=cfg.rough_downsample_short_side_length,
                divisor=cfg.backbone_downsampling_factor,
                bucket=cfg.shape_bucket,
            )
            for im in images
        ]
        ph = max(p[1][0] for p in per_page)
        pw = max(p[1][1] for p in per_page)
        nb = self._pad_batch(n)

        # Host-side resize uses the same exact-area primitive the on-device
        # path uses; images land in one contiguous batch.
        from ..ops.resize import area_downsample

        batch = np.zeros((nb, ph, pw, 3), np.float32)
        for i, (im, ((rh, rw), _)) in enumerate(zip(images, per_page)):
            resized = np.asarray(
                area_downsample(
                    jnp.asarray(im, jnp.float32)[None], (rh, rw)
                )[0]
            )
            batch[i, :rh, :rw] = resized

        rough_fn = self._batched_rough_fn((nb, ph, pw))
        masks, heights = rough_fn(engine.params, jnp.asarray(batch))
        masks, heights = np.asarray(masks), np.asarray(heights)

        # Per-page pad invalidation + RoughInferResult (host).
        roughs: List[RoughInferResult] = []
        for i, ((rh, rw), _) in enumerate(per_page):
            vh, vw = math.ceil(rh / fdf), math.ceil(rw / fdf)
            mask = masks[i].copy()
            height = heights[i].copy()
            mask[vh:, :] = 0
            mask[:, vw:] = 0
            height[vh:, :] = 0.0
            height[:, vw:] = 0.0
            roughs.append(
                RoughInferResult(
                    resized_shape=(vh, vw),
                    resized_image_shape=(rh, rw),
                    padded_image_shape=(ph, pw),
                    rough_char_mask=mask,
                    rough_char_height_score_map=height,
                )
            )

        # ---- per-page host geometry.
        regions_per_page = [
            engine.build_flattened_text_regions(im, r)
            for im, r in zip(images, roughs)
        ]
        stacked_per_page = [
            engine.stack_flattened_text_regions(regions)
            for regions in regions_per_page
        ]

        # ---- shared precise bucket.
        sh = max(
            (s.shape[0] for s, _ in stacked_per_page if s.size), default=64
        )
        sw = max(
            (s.shape[1] for s, _ in stacked_per_page if s.size), default=64
        )
        bucket = cfg.shape_bucket
        sh = math.ceil(sh / bucket) * bucket
        sw = math.ceil(sw / bucket) * bucket
        pbatch = np.zeros((nb, sh, sw, 3), np.float32)
        for i, (stacked, _) in enumerate(stacked_per_page):
            if stacked.size:
                pbatch[i, : stacked.shape[0], : stacked.shape[1]] = stacked

        precise_fn = self._batched_precise_fn((nb, sh, sw))
        probs, offsets, angles, distances = precise_fn(
            engine.params, jnp.asarray(pbatch)
        )
        probs = np.asarray(probs)
        offsets, angles = np.asarray(offsets), np.asarray(angles)
        distances = np.asarray(distances)

        # Host peak picking per page — numpy max filter (shift-and-max, no
        # scipy dependency), equivalent to the engine's on-device
        # reduce_window path.
        def maximum_filter(x: np.ndarray, size: int) -> np.ndarray:
            r = size // 2
            padded = np.pad(x, r, mode="constant", constant_values=-np.inf)
            out = np.full_like(x, -np.inf)
            h, w = x.shape
            for dy in range(size):
                for dx in range(size):
                    np.maximum(out, padded[dy : dy + h, dx : dx + w], out=out)
            return out

        results = []
        for i, im in enumerate(images):
            stacked, boxes = stacked_per_page[i]
            vh = math.ceil(stacked.shape[0] / pfdf) if stacked.size else 0
            vw = math.ceil(stacked.shape[1] / pfdf) if stacked.size else 0
            prob = probs[i].copy()
            prob[vh:, :] = 0.0
            prob[:, vw:] = 0.0
            local_max = maximum_filter(
                prob, cfg.precise_build_polygons_maximum_filter_size
            )
            peaks = (
                (prob == local_max)
                & (prob >= cfg.precise_build_polygons_positive_char_prob_thr)
            ).astype(np.uint8)
            precise = PreciseInferResult(
                padded_image_shape=(sh, sw),
                stacked_image_shape=(
                    stacked.shape[:2] if stacked.size else (0, 0)
                ),
                precise_char_prob_score_map=prob,
                precise_peak_mask=peaks,
                precise_np_char_up_left_corner_offset=offsets[i],
                precise_np_char_corner_angle_distribution=angles[i],
                precise_np_char_corner_distance=distances[i],
            )
            regions = regions_per_page[i]
            grouped = engine.precise_build_grouped_polygons(precise, regions, boxes)
            remapped = engine.precise_build_remapped_polygons(regions, boxes, grouped)
            remapped = engine.dedup_char_polygons(remapped)
            results.append(
                {
                    "rough": roughs[i],
                    "regions": regions,
                    "stacked_image": stacked,
                    "boxes": boxes,
                    "precise": precise,
                    "grouped_polygons": grouped,
                    "char_polygons": remapped,
                }
            )
        return results
