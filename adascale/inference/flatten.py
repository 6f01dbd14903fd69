"""Text-region flattening + stacking.

Replaces the external vkit ``TextRegionFlattener`` /
``stack_flattened_text_regions`` surface consumed by the reference
(inferencing/adaptive_scaling.py:30-34,190-293; field semantics per
SURVEY.md §2b): each detected text-region polygon is dilated, cropped,
rotated so its long side is horizontal, trimmed to the rotated mask, and
later adaptively resized; all regions are then shelf-packed into a single
stacked page for one precise-pass forward.

Exposed per-region fields mirror the consumed vkit API:
``text_region_polygon``, ``bounding_extended_box`` (page coords),
``flattening_rotate_angle``, ``rotated_trimmed_box``,
``shape_before_resize``, ``flattened_image``, ``flattened_mask``,
``is_typical``, ``post_rotate_angle`` (always 0), and
``to_resized_flattened_text_region``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..data.geometry import Box, Polygon, rotate_trans_mat


@dataclasses.dataclass
class FlattenedTextRegion:
    text_region_polygon: Polygon  # original page coords
    bounding_extended_box: Box  # page coords of the extracted crop
    flattening_rotate_angle: float  # degrees fed to rotate_trans_mat
    rotated_trimmed_box: Box  # coords inside the rotated canvas
    shape_before_resize: Tuple[int, int]
    flattened_image: np.ndarray  # (h, w, 3) uint8
    flattened_mask: np.ndarray  # (h, w) uint8
    is_typical: bool
    post_rotate_angle: int = 0
    # Mask of the region's *own* (undilated, or mildly dilated) polygon in
    # flattened coords. Peaks are gated to this instead of flattened_mask:
    # the 0.8-dilated crop deliberately includes neighbouring regions' chars
    # for context, and gating peaks to the full dilated mask detects each
    # boundary char once per region (the reference ships those duplicates,
    # inferencing/adaptive_scaling.py:467-524). None = fall back to
    # flattened_mask.
    flattened_core_mask: Optional[np.ndarray] = None

    @property
    def height(self) -> int:
        return self.flattened_image.shape[0]

    @property
    def width(self) -> int:
        return self.flattened_image.shape[1]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.flattened_image.shape[:2]

    def to_resized_flattened_text_region(
        self, resized_height: int, resized_width: int
    ) -> "FlattenedTextRegion":
        image = cv2.resize(
            self.flattened_image,
            (resized_width, resized_height),
            interpolation=cv2.INTER_AREA
            if resized_height < self.height
            else cv2.INTER_LINEAR,
        )
        mask = cv2.resize(
            self.flattened_mask,
            (resized_width, resized_height),
            interpolation=cv2.INTER_NEAREST,
        )
        core = self.flattened_core_mask
        if core is not None:
            core = cv2.resize(
                core, (resized_width, resized_height), interpolation=cv2.INTER_NEAREST
            )
        return dataclasses.replace(
            self, flattened_image=image, flattened_mask=mask, flattened_core_mask=core
        )


def _long_side_angle(polygon: Polygon) -> Tuple[float, float]:
    """(rotate_angle_deg, long_side_ratio) from the polygon's min-area rect.

    rotate_angle is the angle to pass to ``rotate_trans_mat`` (cv2
    counter-clockwise convention) so the rect's long side lands horizontal.
    """
    rect = cv2.minAreaRect(polygon.points.astype(np.float32))
    (_, _), (w, h), angle = rect
    if w < 1e-6 or h < 1e-6:
        return 0.0, 1.0
    # This cv2 returns angle in (-90, 0]; the 'w' side makes `angle` degrees
    # with the horizontal. Rotating the image content by `edge_angle` via
    # getRotationMatrix2D maps the long edge to horizontal (verified against
    # cv2 5.0 empirically — see tests/test_inference.py).
    if w >= h:
        long_ratio = w / h
        edge_angle = angle
    else:
        long_ratio = h / w
        edge_angle = angle - 90.0
    # Normalize to (-90, 90].
    if edge_angle <= -90.0:
        edge_angle += 180.0
    return edge_angle, long_ratio


class TextRegionFlattener:
    def __init__(
        self,
        typical_long_side_ratio_min: float,
        text_region_polygon_dilate_ratio: float,
        image: np.ndarray,  # (H, W, 3) uint8, page
        text_region_polygons: Sequence[Polygon],
        core_gate_dilate_ratio: Optional[float] = None,
    ):
        """``core_gate_dilate_ratio``: when set, each region also carries a
        ``flattened_core_mask`` — its own polygon dilated by this (smaller)
        ratio, pushed through the same rotate/trim transform — so peak
        gating can claim only the region's own chars (duplicate fix,
        VERDICT r2 #4)."""
        self.flattened_text_regions: List[FlattenedTextRegion] = []
        page_shape = image.shape[:2]

        for polygon in text_region_polygons:
            dilated = polygon.to_dilated_polygon(text_region_polygon_dilate_ratio)
            box = dilated.bounding_box().clamp_to(page_shape)
            if box.height < 2 or box.width < 2:
                box = polygon.bounding_box().clamp_to(page_shape)

            crop = box.extract(image)
            rel_dilated = dilated.to_relative_polygon(box.up, box.left)
            mask = rel_dilated.fill_mask(box.shape)
            core_mask = None
            if core_gate_dilate_ratio is not None:
                core = polygon.to_dilated_polygon(core_gate_dilate_ratio)
                core_mask = core.to_relative_polygon(box.up, box.left).fill_mask(
                    box.shape
                )

            angle, long_ratio = _long_side_angle(polygon)
            is_typical = long_ratio >= typical_long_side_ratio_min
            # Only rotate regions whose long side is pronounced enough to
            # define an orientation; near-square regions stay as-is.
            if not is_typical or abs(angle) < 1e-3:
                angle = 0.0

            if angle != 0.0:
                mat = rotate_trans_mat(angle, box.shape)
                from ..data.geometry import rotated_shape

                new_h, new_w = rotated_shape(angle, box.shape)
                rotated = cv2.warpAffine(crop, mat, (new_w, new_h))
                rotated_mask = cv2.warpAffine(mask, mat, (new_w, new_h))
                rotated_core = (
                    cv2.warpAffine(core_mask, mat, (new_w, new_h))
                    if core_mask is not None
                    else None
                )
            else:
                rotated, rotated_mask, rotated_core = crop, mask, core_mask

            ys, xs = np.nonzero(rotated_mask)
            if len(ys) == 0:
                trimmed_box = Box.from_shape(rotated_mask.shape)
            else:
                trimmed_box = Box(
                    int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max())
                )

            flattened_image = trimmed_box.extract(rotated).copy()
            flattened_mask = trimmed_box.extract(rotated_mask).copy()
            flattened_core = (
                trimmed_box.extract(rotated_core).copy()
                if rotated_core is not None
                else None
            )

            self.flattened_text_regions.append(
                FlattenedTextRegion(
                    text_region_polygon=polygon,
                    bounding_extended_box=box,
                    flattening_rotate_angle=angle,
                    rotated_trimmed_box=trimmed_box,
                    shape_before_resize=flattened_image.shape[:2],
                    flattened_image=flattened_image,
                    flattened_mask=flattened_mask,
                    is_typical=is_typical,
                    flattened_core_mask=flattened_core,
                )
            )


def stack_flattened_text_regions(
    page_pad: int,
    flattened_text_regions_pad: int,
    flattened_text_regions: Sequence[FlattenedTextRegion],
) -> Tuple[np.ndarray, List[Box]]:
    """Shelf-pack regions into one image; returns (stacked_image, boxes)
    with boxes aligned to the input order (reference usage at
    inferencing/adaptive_scaling.py:281-293)."""
    pad = flattened_text_regions_pad
    if not flattened_text_regions:
        side = max(2 * page_pad, 32)
        return np.zeros((side, side, 3), dtype=np.uint8), []

    widths = [r.width for r in flattened_text_regions]
    total_area = sum(r.height * r.width for r in flattened_text_regions)
    target_width = max(max(widths), int(math.sqrt(total_area) * 1.2))

    # Shelf packing in input order.
    placements: List[Tuple[int, int]] = []  # (row_idx, x)
    rows: List[Tuple[int, int]] = []  # (row_width_cursor, row_height)
    for region in flattened_text_regions:
        if not rows or rows[-1][0] + region.width > target_width:
            rows.append((0, 0))
        cursor, row_h = rows[-1]
        placements.append((len(rows) - 1, cursor))
        rows[-1] = (cursor + region.width + pad, max(row_h, region.height))

    row_tops: List[int] = []
    y = page_pad
    for _, row_h in rows:
        row_tops.append(y)
        y += row_h + pad
    total_h = y - pad + page_pad
    total_w = page_pad * 2 + max(
        placements[i][1] + flattened_text_regions[i].width
        for i in range(len(flattened_text_regions))
    )

    stacked = np.zeros((total_h, total_w, 3), dtype=np.uint8)
    boxes: List[Box] = []
    for region, (row_idx, x) in zip(flattened_text_regions, placements):
        top = row_tops[row_idx]
        left = page_pad + x
        box = Box(top, top + region.height - 1, left, left + region.width - 1)
        patch = region.flattened_image
        # Paste only masked pixels to limit bleed between regions.
        m = region.flattened_mask > 0
        target = box.extract(stacked)
        target[m] = patch[m]
        boxes.append(box)
    return stacked, boxes
