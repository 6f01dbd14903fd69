"""Two-stage adaptive-scaling inference engine.

Re-designs the reference serving subsystem (/root/reference/vkit_open_model/
inferencing/adaptive_scaling.py:41-600) TPU-first:

  * Each stage is ONE jitted device program per shape bucket: preprocessing
    (area resize + /32 pad), the forward pass, sigmoid/threshold/softmax,
    padding invalidation, small-height clearing and peak picking all run
    on-chip; only final maps/peaks cross back to host (the reference does
    all pre/post on host with cv2/scipy, :96-121,145-175,341-387,480-491).
  * Peak picking = max-pool(5x5) equality + prob threshold — the jit
    equivalent of ``scipy.ndimage.maximum_filter`` (:485-491).
  * Host geometry (region flattening, packing, polar polygon build, inverse
    remap) uses adascale.data.geometry / adascale.inference.flatten.

The artifact contract mirrors the reference's TorchScript export (params +
model config instead of a scripted module, train.py:608-644): pass params
directly, an orbax checkpoint dir, or a PyTorch reference state_dict path.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.geometry import (
    Box,
    Polygon,
    affine_polygons,
    mask_to_disconnected_polygons,
    rotate_trans_mat,
)
from ..models import AdaptiveScaling, AdaptiveScalingConfig
from ..models.adaptive_scaling import AdaptiveScalingSize
from ..models.convnext import CONVNEXT_PRESETS
from .flatten import (
    FlattenedTextRegion,
    TextRegionFlattener,
    stack_flattened_text_regions,
)
from .preprocess import compute_padded_shape, compute_rough_shapes


@dataclasses.dataclass(frozen=True)
class AdaptiveScalingInferenceConfig:
    """Mirrors reference AdaptiveScalingInferencingConfig (:41-59)."""

    checkpoint: Optional[str] = None
    model: AdaptiveScalingConfig = AdaptiveScalingConfig()
    backbone_downsampling_factor: int = 32
    rough_head_upsampling_factor: int = 2
    rough_downsample_short_side_length: int = 720
    rough_char_mask_positive_thr: float = 0.5
    rough_valid_char_height_min: float = 3.0
    precise_head_upsampling_factor: int = 2
    precise_text_region_flattener_typical_long_side_ratio_min: float = 3.0
    precise_text_region_flattener_text_region_polygon_dilate_ratio: float = 0.8
    precise_flattened_text_region_resized_char_height_median: int = 35
    precise_flattened_text_region_resized_ratio_min: float = 0.25
    precise_stack_flattened_text_regions_page_pad: int = 10
    precise_stack_flattened_text_regions_pad: int = 2
    # Reference ships 0.7 (inferencing/adaptive_scaling.py:55). Measured on
    # the overfit fixture (4 pages, core gating on): 0.7 -> P .810 R .737;
    # 0.6 -> P .810 R .821 (F1 .772 -> .815) — the flattened/rescaled
    # rendering depresses peak confidence relative to raw pages, so the
    # reference threshold costs recall for zero precision. 0.5/0.55 start
    # trading precision. Our default is 0.6; set 0.7 for reference-exact.
    precise_build_polygons_positive_char_prob_thr: float = 0.6
    precise_build_polygons_maximum_filter_size: int = 5
    # Cross-region NMS on the remapped char polygons. Text regions are
    # dilated before flattening (dilate_ratio 0.8 above), so a char near a
    # region boundary appears in SEVERAL regions' flattened crops and gets
    # detected once per region; the reference ships these duplicates
    # (:467-524 has no dedup). Greedy IoU suppression ordered by peak char
    # prob removes them. None disables (reference-exact output). 0.3 keeps
    # imperfectly-remapped duplicates suppressed while never merging
    # genuinely adjacent chars (char quads are disjoint).
    dedup_char_polygons_iou_thr: Optional[float] = 0.3
    # Peak-to-region ownership gating (the stronger duplicate fix): gate
    # each region's peaks to its OWN polygon dilated by this small ratio
    # (carried through the flattening transform as flattened_core_mask)
    # instead of the full 0.8-dilated crop mask. Boundary chars then get
    # claimed exactly once — by the region whose rough polygon produced
    # them — instead of once per overlapping crop; chars cut by a
    # neighbouring crop's boundary stop emitting broken quads. None
    # restores the reference behavior (gate to the dilated mask,
    # :467-524, which ships the duplicates). Measured on the overfit
    # fixture (4 pages): chain F1 0.553 -> 0.757, precision 0.45 -> 0.80,
    # recall 0.73 -> 0.72 (sweep 0.1/0.2/0.4: 0.743/0.754/0.757).
    precise_peak_gate_core_dilate_ratio: Optional[float] = 0.4
    # Boundary-band recall recovery (pairs with core gating above): peaks
    # inside a region's full dilated crop mask but outside EVERY core gate
    # are chars cut by / straddling a crop boundary — round 3 dropped them
    # entirely (the residual chain-vs-direct recall gap). They are rebuilt
    # as candidate polygons and added after NMS unless their center lies
    # within this ratio x char-size of an already-kept detection:
    # imperfectly-remapped copies of the SAME char from different crops
    # land close in page coords even when their quad IoU is below the NMS
    # threshold, so center distance (scaled by the smaller quad's size) is
    # the right duplicate test here. None disables the recovery pass.
    #
    # Measured on the overfit fixture (round 4): the band is ~90% POISON —
    # confident (score 0.7-0.97) hallucinated peaks hugging the stacked-
    # region boundaries with near-zero GT overlap, not missed chars (fixture
    # page [42,0]: +38 candidates, 2 real; precision 0.85 -> 0.50). The
    # actual chain-vs-direct recall gap traces to OVERLAPPING TEXT LINES
    # (7px apart) merging in the rough mask, which no peak-ownership rule
    # recovers. Default None (off); the knob stays for diagnosis.
    precise_band_recall_center_dist_ratio: Optional[float] = None
    # Band candidates are ranked by "ownership depth" — distance from the
    # peak to its own region's core mask — and dropped beyond this ratio of
    # the canonical resized char height: a peak deep inside the band is a
    # NEIGHBOUR's char cut by this crop's boundary (a fragment with shifted
    # geometry), and its true owner claims it from its own crop.
    precise_band_recall_max_core_dist_ratio: float = 0.75
    # Bound on the stacked precise input's pixel area. Text-dense pages
    # (especially tiled full-res mode) can flatten enough regions that one
    # shelf-packed stack exceeds device memory at compile time (measured:
    # a 2048px tiled page OOMed HBM at 33.5G on v5e). Regions are packed
    # into as many capped stacks as needed, each run through precise_infer
    # separately, and the polygon sets merged + re-deduped. None = always a
    # single stack (reference-exact; inferencing/adaptive_scaling.py has no
    # bound either).
    precise_stacked_image_max_area: Optional[int] = 2048 * 2048
    # TPU-native knobs.
    shape_bucket: int = 64
    matmul_precision: str = "highest"  # 'highest' = fp32 parity; 'default' = fast bf16
    compute_dtype: str = "float32"  # 'bfloat16' for TPU serving
    use_pallas_backbone: bool = False  # fused ConvNeXt blocks (adascale.ops.pallas)
    # Fused FPN neck-L0 + dual-head kernels for the rough pass (requires
    # use_pallas_backbone; ops/pallas/fpn_neck.py + fpn_heads.py).
    use_pallas_neck_heads: bool = False
    # Tiled whole-page rough mode (adascale/inference/tiled.py): process
    # large scans at full resolution instead of short-side-720 downsampling.
    # Enabled per-call via detect(tiled=True) or automatically when the
    # page long side >= tiled_rough_long_side_min (None = never auto).
    tiled_rough_tile_size: int = 768
    tiled_rough_tile_overlap: int = 128
    tiled_rough_long_side_min: Optional[int] = None


@dataclasses.dataclass
class RoughInferResult:
    resized_shape: Tuple[int, int]  # valid region of the feature maps
    resized_image_shape: Tuple[int, int]
    padded_image_shape: Tuple[int, int]
    rough_char_mask: np.ndarray  # (FH, FW) uint8
    rough_char_height_score_map: np.ndarray  # (FH, FW) float32


@dataclasses.dataclass
class PreciseInferResult:
    padded_image_shape: Tuple[int, int]
    stacked_image_shape: Tuple[int, int]
    precise_char_prob_score_map: np.ndarray  # (FH, FW) float32
    precise_peak_mask: np.ndarray  # (FH, FW) uint8 (thresholded local maxima)
    precise_np_char_up_left_corner_offset: np.ndarray  # (FH, FW, 2)
    precise_np_char_corner_angle_distribution: np.ndarray  # (FH, FW, 4)
    precise_np_char_corner_distance: np.ndarray  # (FH, FW, 4)


def _max_filter_same(x: jax.Array, size: int) -> jax.Array:
    """5x5 (size x size) max filter, SAME padding — jit analogue of
    ``scipy.ndimage.maximum_filter`` as used at reference :485-491."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(size, size),
        window_strides=(1, 1),
        padding="SAME",
    )


class AdaptiveScalingInference:
    def __init__(
        self,
        config: AdaptiveScalingInferenceConfig,
        params: Optional[Any] = None,
        rng_seed: int = 0,
    ):
        self.config = config
        self.model = AdaptiveScaling(
            config=config.model, dtype=jnp.dtype(config.compute_dtype)
        )
        if params is None:
            if config.checkpoint is None:
                raise ValueError("need params or config.checkpoint")
            params = load_params(config.checkpoint, config.model)
        self.params = params
        self._rough_cache: Dict[Tuple[int, ...], Any] = {}
        self._precise_cache: Dict[Tuple[int, ...], Any] = {}
        self._rng_seed = rng_seed

    # ---------------------------------------------------------------- forward

    def _backbone_spec(self):
        mc = self.config.model
        if mc.custom_block_channels_and_num_layers is not None:
            return tuple(tuple(s) for s in mc.custom_block_channels_and_num_layers)
        size = (
            mc.size
            if isinstance(mc.size, AdaptiveScalingSize)
            else AdaptiveScalingSize(mc.size)
        )
        return CONVNEXT_PRESETS[size.value]

    def _forward(self, params, x, which: str):
        """Backbone + neck + heads; optionally routes the backbone through
        the fused Pallas kernels (same param tree, adascale.ops.pallas)."""
        model = self.model
        if self.config.use_pallas_backbone:
            from ..ops.pallas import convnext_forward_pallas

            feats = convnext_forward_pallas(
                params["backbone"],
                x.astype(jnp.dtype(self.config.compute_dtype)),
                self._backbone_spec(),
            )
            nh_type = str(
                getattr(
                    self.config.model.neck_head_type,
                    "value",
                    self.config.model.neck_head_type,
                )
            )
            # The fused neck/head kernels assume the FpnNeck/FpnHead param
            # structure; UPerNeXt configs fall through to the Flax path.
            if self.config.use_pallas_neck_heads and nh_type == "fpn":
                if which == "rough":
                    from ..ops.pallas import forward_rough_from_features_fused

                    return forward_rough_from_features_fused(model, params, feats)
                from ..ops.pallas import forward_precise_from_features_fused

                return forward_precise_from_features_fused(model, params, feats)
            method = (
                model.forward_rough_from_features
                if which == "rough"
                else model.forward_precise_from_features
            )
            return model.apply({"params": params}, tuple(feats), method=method)
        method = model.forward_rough if which == "rough" else model.forward_precise
        return model.apply({"params": params}, x, method=method)

    # ------------------------------------------------------------------ rough

    def _rough_fn(self, in_hw, resized_hw, padded_hw):
        key = (*in_hw, *resized_hw, *padded_hw)
        if key in self._rough_cache:
            return self._rough_cache[key]
        cfg = self.config
        fdf = 4 // cfg.rough_head_upsampling_factor
        valid_h = math.ceil(resized_hw[0] / fdf)
        valid_w = math.ceil(resized_hw[1] / fdf)
        model = self.model

        @jax.jit
        def fn(params, image):
            with jax.default_matmul_precision(cfg.matmul_precision):
                from .preprocess import preprocess_image

                x = preprocess_image(image, resized_hw, padded_hw)
                mask_logits, height = self._forward(params, x, "rough")
            mask = jax.nn.sigmoid(mask_logits[0, :, :, 0].astype(jnp.float32))
            mask = (mask >= cfg.rough_char_mask_positive_thr).astype(jnp.uint8)
            height = height[0, :, :, 0]
            # Invalidate the pad region (reference :154-165).
            fh, fw = mask.shape
            row_ok = (jnp.arange(fh) < valid_h)[:, None]
            col_ok = (jnp.arange(fw) < valid_w)[None, :]
            ok = row_ok & col_ok
            mask = jnp.where(ok, mask, 0)
            height = jnp.where(ok, height, 0.0)
            # Clear too-small char heights (reference :168-169).
            height = jnp.where(
                height < cfg.rough_valid_char_height_min, 0.0, height
            )
            return mask, height

        self._rough_cache[key] = fn
        return fn

    def rough_infer(self, image: np.ndarray) -> RoughInferResult:
        cfg = self.config
        h, w = image.shape[:2]
        resized_hw, padded_hw = compute_rough_shapes(
            h,
            w,
            short_side=cfg.rough_downsample_short_side_length,
            divisor=cfg.backbone_downsampling_factor,
            bucket=cfg.shape_bucket,
        )
        fn = self._rough_fn((h, w), resized_hw, padded_hw)
        mask, height = fn(self.params, jnp.asarray(image))
        fdf = 4 // cfg.rough_head_upsampling_factor
        resized_shape = (
            math.ceil(resized_hw[0] / fdf),
            math.ceil(resized_hw[1] / fdf),
        )
        return RoughInferResult(
            resized_shape=resized_shape,
            resized_image_shape=resized_hw,
            padded_image_shape=padded_hw,
            rough_char_mask=np.asarray(mask),
            rough_char_height_score_map=np.asarray(height),
        )

    # ------------------------------------------------------------ tiled rough

    def _tiled_rough_fn(self, in_hw, padded_hw):
        key = ("tiled", *in_hw, *padded_hw)
        if key in self._rough_cache:
            return self._rough_cache[key]
        cfg = self.config
        fdf = 4 // cfg.rough_head_upsampling_factor
        tile = cfg.tiled_rough_tile_size
        overlap = cfg.tiled_rough_tile_overlap
        valid_h = math.ceil(in_hw[0] / fdf)
        valid_w = math.ceil(in_hw[1] / fdf)

        @jax.jit
        def fn(params, image):
            from .tiled import tiled_rough_forward

            with jax.default_matmul_precision(cfg.matmul_precision):
                h, w = in_hw
                ph, pw = padded_hw
                x = image.astype(jnp.float32)
                if (ph, pw) != (h, w):
                    x = jnp.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
                mask_logits, height = tiled_rough_forward(
                    lambda t: self._forward(params, t, "rough"),
                    x,
                    tile=tile,
                    overlap=overlap,
                    fdf=fdf,
                )
            mask = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
            mask = (mask >= cfg.rough_char_mask_positive_thr).astype(jnp.uint8)
            height = height.astype(jnp.float32)
            fh, fw = mask.shape
            ok = ((jnp.arange(fh) < valid_h)[:, None]) & (
                (jnp.arange(fw) < valid_w)[None, :]
            )
            mask = jnp.where(ok, mask, 0)
            height = jnp.where(ok, height, 0.0)
            height = jnp.where(
                height < cfg.rough_valid_char_height_min, 0.0, height
            )
            return mask, height

        self._rough_cache[key] = fn
        return fn

    def rough_infer_tiled(self, image: np.ndarray) -> RoughInferResult:
        """Full-resolution tiled rough pass for large scans (BASELINE
        config 3) — no short-side-720 downsample; overlapping static tiles
        batched through forward_rough and stitched on-device."""
        cfg = self.config
        h, w = image.shape[:2]
        fdf = 4 // cfg.rough_head_upsampling_factor
        tile = cfg.tiled_rough_tile_size
        ph = max(tile, math.ceil(h / fdf) * fdf)
        pw = max(tile, math.ceil(w / fdf) * fdf)
        fn = self._tiled_rough_fn((h, w), (ph, pw))
        mask, height = fn(self.params, jnp.asarray(image))
        return RoughInferResult(
            resized_shape=(math.ceil(h / fdf), math.ceil(w / fdf)),
            resized_image_shape=(h, w),
            padded_image_shape=(ph, pw),
            rough_char_mask=np.asarray(mask),
            rough_char_height_score_map=np.asarray(height),
        )

    # ------------------------------------------------------- region flattening

    def build_flattened_text_regions(
        self, image: np.ndarray, rough: RoughInferResult
    ) -> List[FlattenedTextRegion]:
        """Reference :190-279 — including the adaptive scaling step."""
        cfg = self.config
        resized_shape = rough.resized_shape
        rough_polygons = mask_to_disconnected_polygons(rough.rough_char_mask)

        page_shape = image.shape[:2]
        text_region_polygons = [
            p.to_conducted_resized_polygon(resized_shape, page_shape)
            for p in rough_polygons
        ]

        flattener = TextRegionFlattener(
            typical_long_side_ratio_min=(
                cfg.precise_text_region_flattener_typical_long_side_ratio_min
            ),
            text_region_polygon_dilate_ratio=(
                cfg.precise_text_region_flattener_text_region_polygon_dilate_ratio
            ),
            image=image,
            text_region_polygons=text_region_polygons,
            core_gate_dilate_ratio=cfg.precise_peak_gate_core_dilate_ratio,
        )
        regions = flattener.flattened_text_regions

        # Char-height medians in original-page pixels (reference :236-248).
        inverse_resized_ratio = page_shape[0] / (resized_shape[0] * (
            4 // cfg.rough_head_upsampling_factor
        ))
        medians: List[float] = []
        for p in rough_polygons:
            values = p.extract_score_map_values(rough.rough_char_height_score_map)
            values = values[values > 0]
            medians.append(
                float(np.median(values)) * inverse_resized_ratio if len(values) else 0.0
            )

        # Adaptive scaling: normalize each region's median char height to the
        # canonical value (reference :250-279).
        target = cfg.precise_flattened_text_region_resized_char_height_median
        side_min = round(target * cfg.precise_flattened_text_region_resized_ratio_min)
        resized_regions: List[FlattenedTextRegion] = []
        for region, median in zip(regions, medians):
            if median <= 0.0:
                continue
            scale = target / median
            rh = round(region.height * scale)
            rw = round(region.width * scale)
            if rh < side_min and rw < side_min:
                continue
            if rh < 1 or rw < 1:
                continue
            resized_regions.append(
                region.to_resized_flattened_text_region(rh, rw)
            )
        return resized_regions

    def stack_flattened_text_regions(
        self, flattened_text_regions: Sequence[FlattenedTextRegion]
    ) -> Tuple[np.ndarray, List[Box]]:
        cfg = self.config
        return stack_flattened_text_regions(
            page_pad=cfg.precise_stack_flattened_text_regions_page_pad,
            flattened_text_regions_pad=cfg.precise_stack_flattened_text_regions_pad,
            flattened_text_regions=flattened_text_regions,
        )

    # ---------------------------------------------------------------- precise

    def _precise_fn(self, in_hw, padded_hw):
        key = (*in_hw, *padded_hw)
        if key in self._precise_cache:
            return self._precise_cache[key]
        cfg = self.config
        fdf = 4 // cfg.precise_head_upsampling_factor
        valid_h = math.ceil(in_hw[0] / fdf)
        valid_w = math.ceil(in_hw[1] / fdf)
        model = self.model

        @jax.jit
        def fn(params, image):
            with jax.default_matmul_precision(cfg.matmul_precision):
                x = image.astype(jnp.float32)[None]
                ph, pw = padded_hw
                h, w = in_hw
                if (ph, pw) != (h, w):
                    x = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
                prob_logits, offset, angle_logits, distance = self._forward(
                    params, x, "precise"
                )
            prob = jax.nn.sigmoid(prob_logits[0, :, :, 0].astype(jnp.float32))
            fh, fw = prob.shape
            row_ok = (jnp.arange(fh) < valid_h)[:, None]
            col_ok = (jnp.arange(fw) < valid_w)[None, :]
            ok = row_ok & col_ok
            prob = jnp.where(ok, prob, 0.0)
            angles = jax.nn.softmax(angle_logits[0].astype(jnp.float32), axis=-1)
            # On-device peak picking (reference host scipy :480-491).
            local_max = _max_filter_same(
                prob, cfg.precise_build_polygons_maximum_filter_size
            )
            peaks = (
                (prob == local_max)
                & (prob >= cfg.precise_build_polygons_positive_char_prob_thr)
            ).astype(jnp.uint8)
            return (
                prob,
                peaks,
                offset[0].astype(jnp.float32),
                angles,
                distance[0],
            )

        self._precise_cache[key] = fn
        return fn

    def precise_infer(self, stacked_image: np.ndarray) -> PreciseInferResult:
        cfg = self.config
        h, w = stacked_image.shape[:2]
        padded_hw = compute_padded_shape(
            h, w, divisor=cfg.backbone_downsampling_factor, bucket=cfg.shape_bucket
        )
        fn = self._precise_fn((h, w), padded_hw)
        prob, peaks, offset, angles, distance = fn(
            self.params, jnp.asarray(stacked_image)
        )
        return PreciseInferResult(
            padded_image_shape=padded_hw,
            stacked_image_shape=(h, w),
            precise_char_prob_score_map=np.asarray(prob),
            precise_peak_mask=np.asarray(peaks),
            precise_np_char_up_left_corner_offset=np.asarray(offset),
            precise_np_char_corner_angle_distribution=np.asarray(angles),
            precise_np_char_corner_distance=np.asarray(distance),
        )

    # ------------------------------------------------------- polygon building

    def precise_build_polygon(
        self, precise: PreciseInferResult, point_y: int, point_x: int
    ) -> Polygon:
        """Polar corner reconstruction (reference :398-465). The point is in
        the downsampled feature grid; its image-space position is
        ``point * fdf`` (the convention the training labels use,
        adascale.data.synth.char_regression_label)."""
        cfg = self.config
        fdf = 4 // cfg.precise_head_upsampling_factor
        py, px = float(point_y * fdf), float(point_x * fdf)

        off_y, off_x = precise.precise_np_char_up_left_corner_offset[point_y, point_x]
        up_left = np.asarray([px + off_x, py + off_y], dtype=np.float64)

        angle_distrib = precise.precise_np_char_corner_angle_distribution[point_y, point_x]
        distances = precise.precise_np_char_corner_distance[point_y, point_x]
        _, up_right_dis, down_right_dis, down_left_dis = distances

        two_pi = 2 * np.pi
        theta = float(np.arctan2(off_y, off_x)) % two_pi

        corners = [up_left]
        for frac, dis in zip(
            angle_distrib[:3], (up_right_dis, down_right_dis, down_left_dis)
        ):
            theta = (theta + float(frac) * two_pi) % two_pi
            corners.append(
                np.asarray(
                    [px + math.cos(theta) * dis, py + math.sin(theta) * dis],
                    dtype=np.float64,
                )
            )
        score = float(precise.precise_char_prob_score_map[point_y, point_x])
        return Polygon(np.stack(corners), score=score)

    def precise_build_grouped_polygons(
        self,
        precise: PreciseInferResult,
        flattened_text_regions: Sequence[FlattenedTextRegion],
        boxes: Sequence[Box],
        collect_band: bool = False,
    ) -> Any:
        """Reference :467-524: gate peaks to each region's box and flattened
        mask, then build one polygon per peak.

        With ``collect_band=True`` (and core gating active) returns
        ``(grouped, band_grouped)`` where ``band_grouped`` holds polygons for
        peaks inside the region's FULL dilated crop mask but outside its core
        gate — chars straddling/cut by the crop boundary that no region's
        core claims. They feed merge_band_polygons for a single-claim recall
        recovery pass."""
        import cv2

        assert len(flattened_text_regions) == len(boxes)
        peak_mask = precise.precise_peak_mask
        fh, fw = peak_mask.shape

        grouped: List[List[Polygon]] = []
        band_grouped: List[List[Polygon]] = []
        band_dist_grouped: List[List[float]] = []
        for region, box in zip(flattened_text_regions, boxes):
            dbox = box.to_resized_box(precise.padded_image_shape, (fh, fw))
            dbox = dbox.clamp_to((fh, fw))
            # Gate to the region's core (ownership) mask when available;
            # the full dilated mask deliberately overlaps neighbours.
            gate = (
                region.flattened_core_mask
                if region.flattened_core_mask is not None
                else region.flattened_mask
            )
            region_mask = cv2.resize(
                gate,
                (dbox.width, dbox.height),
                interpolation=cv2.INTER_NEAREST,
            )
            boxed = dbox.extract(peak_mask).copy()
            band_polygons: List[Polygon] = []
            band_dists: List[float] = []
            if collect_band and region.flattened_core_mask is not None:
                full_mask = cv2.resize(
                    region.flattened_mask,
                    (dbox.width, dbox.height),
                    interpolation=cv2.INTER_NEAREST,
                )
                band = boxed.copy()
                band[(full_mask == 0) | (region_mask != 0)] = 0
                # Ownership depth: distance (feature px) from the peak to
                # this region's own core. Small = a whole char of THIS
                # region that the coarse core polygon narrowly missed;
                # large = a neighbour's char cut by this crop's boundary
                # (its owner claims it better elsewhere) — capped below.
                fdf = 4 // self.config.precise_head_upsampling_factor
                cap = (
                    self.config.precise_band_recall_max_core_dist_ratio
                    * self.config.precise_flattened_text_region_resized_char_height_median
                    / fdf
                )
                inv_core_dist = cv2.distanceTransform(
                    (region_mask == 0).astype(np.uint8), cv2.DIST_L2, 3
                )
                for y, x in zip(*np.nonzero(band)):
                    d = float(inv_core_dist[y, x])
                    if d > cap:
                        continue
                    band_polygons.append(
                        self.precise_build_polygon(
                            precise, int(y) + dbox.up, int(x) + dbox.left
                        )
                    )
                    band_dists.append(d)
            boxed[region_mask == 0] = 0
            ys, xs = np.nonzero(boxed)
            polygons = [
                self.precise_build_polygon(precise, int(y) + dbox.up, int(x) + dbox.left)
                for y, x in zip(ys, xs)
            ]
            grouped.append(polygons)
            band_grouped.append(band_polygons)
            band_dist_grouped.append(band_dists)
        if collect_band:
            return grouped, band_grouped, band_dist_grouped
        return grouped

    def precise_build_remapped_polygons(
        self,
        flattened_text_regions: Sequence[FlattenedTextRegion],
        boxes: Sequence[Box],
        grouped_polygons: Sequence[Sequence[Polygon]],
    ) -> List[Polygon]:
        """Undo resize/trim/rotate/shift per region (reference :526-600)."""
        remapped: List[Polygon] = []
        assert len(flattened_text_regions) == len(boxes) == len(grouped_polygons)
        for region, box, polygons in zip(flattened_text_regions, boxes, grouped_polygons):
            if not polygons:
                continue
            assert region.post_rotate_angle == 0

            # 1. Undo stacking shift, adaptive resize, and trim.
            stage1: List[Polygon] = []
            for polygon in polygons:
                p = polygon.to_relative_polygon(origin_y=box.up, origin_x=box.left)
                p = p.to_conducted_resized_polygon(region.shape, region.shape_before_resize)
                p = p.to_shifted_polygon(
                    offset_y=region.rotated_trimmed_box.up,
                    offset_x=region.rotated_trimmed_box.left,
                )
                stage1.append(p)

            # 2. Undo the flattening rotation.
            if region.flattening_rotate_angle != 0.0:
                mat = rotate_trans_mat(
                    region.flattening_rotate_angle, region.bounding_extended_box.shape
                )
                full = np.vstack([mat, [0.0, 0.0, 1.0]]).astype(np.float64)
                stage1 = affine_polygons(np.linalg.inv(full), stage1)

            # 3. Shift back to page coords.
            for p in stage1:
                remapped.append(
                    p.to_shifted_polygon(
                        offset_y=region.bounding_extended_box.up,
                        offset_x=region.bounding_extended_box.left,
                    )
                )
        return remapped

    def dedup_char_polygons(self, polygons: Sequence[Polygon]) -> List[Polygon]:
        """Greedy NMS over remapped char polygons (highest peak prob wins);
        see config.dedup_char_polygons_iou_thr for why duplicates exist."""
        thr = self.config.dedup_char_polygons_iou_thr
        if thr is None or len(polygons) <= 1:
            return list(polygons)
        from .eval import polygon_iou

        order = sorted(
            range(len(polygons)),
            key=lambda i: -(polygons[i].score if polygons[i].score is not None else 0.0),
        )
        kept: List[Polygon] = []
        for i in order:
            p = polygons[i]
            if all(polygon_iou(p, k) < thr for k in kept):
                kept.append(p)
        return kept

    @staticmethod
    def _polygon_center_size(p: Polygon) -> Tuple[np.ndarray, float]:
        pts = np.asarray(p.points, dtype=np.float64)
        center = pts.mean(axis=0)
        x, y = pts[:, 0], pts[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
        return center, math.sqrt(max(area, 1.0))

    def merge_band_polygons(
        self, kept: Sequence[Polygon], band: Sequence[Polygon]
    ) -> List[Polygon]:
        """Add boundary-band detections not already covered by a kept one
        (see config.precise_band_recall_center_dist_ratio). ``band`` must
        already be ordered best-owner-first (build_char_polygons sorts by
        core distance, then score); each accepted candidate also suppresses
        later candidates (the same cut char surfaces in 2+ crops)."""
        ratio = self.config.precise_band_recall_center_dist_ratio
        if ratio is None or not band:
            return list(kept)
        out = list(kept)
        infos = [self._polygon_center_size(k) for k in out]
        centers = (
            np.stack([c for c, _ in infos])
            if infos
            else np.zeros((0, 2), dtype=np.float64)
        )
        sizes = np.asarray([s for _, s in infos], dtype=np.float64)
        for p in band:
            c, s = self._polygon_center_size(p)
            if centers.shape[0]:
                dist = np.linalg.norm(centers - c[None, :], axis=1)
                if bool(np.any(dist < ratio * np.minimum(sizes, s))):
                    continue
            out.append(p)
            centers = np.concatenate([centers, c[None, :]], axis=0)
            sizes = np.concatenate([sizes, [s]])
        return out

    def build_char_polygons(
        self,
        precise: PreciseInferResult,
        flattened_text_regions: Sequence[FlattenedTextRegion],
        boxes: Sequence[Box],
    ) -> Tuple[List[List[Polygon]], List[Polygon]]:
        """Shared tail of the chain: grouped peak->polygon build (core +
        boundary band), inverse remap, NMS, band recall recovery. Returns
        (grouped core polygons, final page-coordinate char polygons)."""
        collect = self.config.precise_band_recall_center_dist_ratio is not None
        if collect:
            grouped, band_grouped, band_dist_grouped = (
                self.precise_build_grouped_polygons(
                    precise, flattened_text_regions, boxes, collect_band=True
                )
            )
        else:
            grouped = self.precise_build_grouped_polygons(
                precise, flattened_text_regions, boxes
            )
            band_grouped = band_dist_grouped = []
        remapped = self.precise_build_remapped_polygons(
            flattened_text_regions, boxes, grouped
        )
        remapped = self.dedup_char_polygons(remapped)
        if any(band_grouped):
            # Remap region-by-region so each candidate keeps its ownership
            # depth, then order best-owner-first: smallest core distance,
            # score breaking ties. A whole char narrowly outside its own
            # region's coarse core polygon beats a neighbouring crop's cut
            # fragment of the same char.
            candidates: List[Tuple[float, float, Polygon]] = []
            for region, box, polys, dists in zip(
                flattened_text_regions, boxes, band_grouped, band_dist_grouped
            ):
                if not polys:
                    continue
                region_remapped = self.precise_build_remapped_polygons(
                    [region], [box], [polys]
                )
                for p, d in zip(region_remapped, dists):
                    candidates.append(
                        (d, -(p.score if p.score is not None else 0.0), p)
                    )
            candidates.sort(key=lambda t: (t[0], t[1]))
            remapped = self.merge_band_polygons(
                remapped, [p for _, _, p in candidates]
            )
        return grouped, remapped

    # -------------------------------------------------------------- end-to-end

    def detect(self, image: np.ndarray, tiled: Optional[bool] = None) -> Dict[str, Any]:
        """Full two-stage pipeline: page image -> char polygons in page
        coords (the reference demo chain, experiment/adaptive_scaling/
        demo.py:178-220). ``tiled=True`` (or auto via
        config.tiled_rough_long_side_min) runs the rough pass at full
        resolution over overlapping tiles instead of downsampling."""
        if tiled is None:
            tiled = (
                self.config.tiled_rough_long_side_min is not None
                and max(image.shape[:2]) >= self.config.tiled_rough_long_side_min
            )
        rough = self.rough_infer_tiled(image) if tiled else self.rough_infer(image)
        regions = self.build_flattened_text_regions(image, rough)

        grouped: List[List[Polygon]] = []
        remapped: List[Polygon] = []
        first_chunk: Optional[Tuple[np.ndarray, List[Box], PreciseInferResult]] = None
        chunks = self._chunk_regions_by_area(regions)
        for chunk in chunks:
            stacked, boxes = self.stack_flattened_text_regions(chunk)
            precise = self.precise_infer(stacked)
            g, r = self.build_char_polygons(precise, chunk, boxes)
            grouped.extend(g)
            remapped.extend(r)
            if first_chunk is None:
                first_chunk = (stacked, boxes, precise)
        if len(chunks) > 1:
            # Duplicate chars from overlapping crops can land in different
            # chunks; the within-chunk NMS cannot see those — repeat it on
            # the merged set.
            remapped = self.dedup_char_polygons(remapped)
        assert first_chunk is not None  # stacker handles empty region lists
        stacked, boxes, precise = first_chunk
        return {
            "rough": rough,
            "regions": regions,
            # For multi-chunk runs these expose the FIRST stack (primarily
            # a visualization/debug surface); num_precise_chunks says so.
            "stacked_image": stacked,
            "boxes": boxes,
            "precise": precise,
            "num_precise_chunks": len(chunks),
            "grouped_polygons": grouped,
            "char_polygons": remapped,
        }

    def _chunk_regions_by_area(
        self, regions: Sequence[FlattenedTextRegion]
    ) -> List[List[FlattenedTextRegion]]:
        """Split regions into consecutive groups whose estimated shelf-packed
        area stays under precise_stacked_image_max_area (None/small inputs:
        one group). Estimate = 1.5x the summed region areas — the shelf
        packer's observed overhead is ~1.2-1.4x."""
        cap = self.config.precise_stacked_image_max_area
        if cap is None or not regions:
            return [list(regions)]
        chunks: List[List[FlattenedTextRegion]] = []
        cur: List[FlattenedTextRegion] = []
        area = 0.0
        for region in regions:
            a = 1.5 * float(region.height) * float(region.width)
            if cur and area + a > cap:
                chunks.append(cur)
                cur, area = [], 0.0
            cur.append(region)
            area += a
        chunks.append(cur)
        return chunks


def load_params(checkpoint: str, model_config: AdaptiveScalingConfig) -> Any:
    """Load inference params from an orbax checkpoint dir or a PyTorch
    reference state-dict file (the migration path for reference-trained
    checkpoints, train.py:608-632)."""
    import os

    path = os.path.expandvars(os.path.expanduser(checkpoint))
    if os.path.isdir(path):
        from ..training.checkpoint import restore_pytree_numpy

        restored = restore_pytree_numpy(path)
        return restored["params"] if "params" in restored else restored
    if path.endswith(".npz"):
        # Compact committed artifact (tools/export_params.py): flat
        # "a/b/c" keys -> nested param dict; f16 leaves cast back to f32.
        flat = np.load(path)
        params: Dict[str, Any] = {}
        for key in flat.files:
            node = params
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            leaf = flat[key]
            if leaf.dtype == np.float16:
                leaf = leaf.astype(np.float32)
            node[parts[-1]] = leaf
        return params
    # Torch state dict (possibly wrapped in a RestoreState-like dict).
    import torch

    from ..utils.torch_port import adaptive_scaling_params_from_torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_jit_state_dict" in payload:
        payload = payload["model_jit_state_dict"]
    nh = model_config.neck_head_type
    nh_value = nh.value if hasattr(nh, "value") else str(nh)
    return adaptive_scaling_params_from_torch(
        payload,
        neck_head_type=nh_value,
        precise_enable_char_mask_head=model_config.precise_enable_char_mask_head,
    )
