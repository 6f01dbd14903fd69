"""Host-side geometry library (numpy + cv2).

Replaces the external ``vkit.element`` surface actually consumed by the
reference (SURVEY.md §2b): inclusive boxes, polygons with resize/shift/
relative transforms and score-map extraction, mask -> disconnected polygons,
and affine/rotation transforms for the region flattening round-trip
(reference inferencing/adaptive_scaling.py:190-279,526-600).

Conventions: images are (H, W, ...) numpy arrays; polygon points are float32
(N, 2) in (x, y) order (cv2-compatible); boxes are inclusive like vkit's
``Box`` (slice = up:down+1, left:right+1).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    up: int
    down: int
    left: int
    right: int

    @property
    def height(self) -> int:
        return self.down + 1 - self.up

    @property
    def width(self) -> int:
        return self.right + 1 - self.left

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @classmethod
    def from_shape(cls, shape: Tuple[int, int]) -> "Box":
        return cls(0, shape[0] - 1, 0, shape[1] - 1)

    def extract(self, mat: np.ndarray) -> np.ndarray:
        return mat[self.up : self.down + 1, self.left : self.right + 1]

    def put(self, mat: np.ndarray, patch: np.ndarray) -> None:
        mat[self.up : self.down + 1, self.left : self.right + 1] = patch

    def to_resized_box(
        self, from_shape: Tuple[int, int], to_shape: Tuple[int, int]
    ) -> "Box":
        """Conducted resize: scale box coords by to/from ratios (vkit
        ``to_conducted_resized_box`` semantics)."""
        ry = to_shape[0] / from_shape[0]
        rx = to_shape[1] / from_shape[1]
        return Box(
            up=int(round(self.up * ry)),
            down=int(round(self.down * ry)),
            left=int(round(self.left * rx)),
            right=int(round(self.right * rx)),
        )

    def to_shifted_box(self, offset_y: int, offset_x: int) -> "Box":
        return Box(
            self.up + offset_y, self.down + offset_y,
            self.left + offset_x, self.right + offset_x,
        )

    def valid_in(self, shape: Tuple[int, int]) -> bool:
        return 0 <= self.up <= self.down < shape[0] and 0 <= self.left <= self.right < shape[1]

    def clamp_to(self, shape: Tuple[int, int]) -> "Box":
        return Box(
            max(0, self.up),
            min(shape[0] - 1, self.down),
            max(0, self.left),
            min(shape[1] - 1, self.right),
        )


@dataclasses.dataclass
class Polygon:
    """Simple polygon; points float32 (N, 2) in (x, y) order. ``score`` is
    an optional detection confidence (peak char prob) used for NMS ordering
    in the inference engine."""

    points: np.ndarray
    score: Optional[float] = None

    def __post_init__(self):
        self.points = np.asarray(self.points, dtype=np.float32).reshape(-1, 2)

    @property
    def xs(self) -> np.ndarray:
        return self.points[:, 0]

    @property
    def ys(self) -> np.ndarray:
        return self.points[:, 1]

    def bounding_box(self) -> Box:
        return Box(
            up=int(math.floor(float(self.ys.min()))),
            down=int(math.ceil(float(self.ys.max()))),
            left=int(math.floor(float(self.xs.min()))),
            right=int(math.ceil(float(self.xs.max()))),
        )

    def to_conducted_resized_polygon(
        self, from_shape: Tuple[int, int], to_shape: Tuple[int, int]
    ) -> "Polygon":
        ry = to_shape[0] / from_shape[0]
        rx = to_shape[1] / from_shape[1]
        pts = self.points * np.asarray([rx, ry], dtype=np.float32)
        return Polygon(pts, score=self.score)

    def to_shifted_polygon(self, offset_y: float, offset_x: float) -> "Polygon":
        return Polygon(
            self.points + np.asarray([offset_x, offset_y], dtype=np.float32),
            score=self.score,
        )

    def to_relative_polygon(self, origin_y: float, origin_x: float) -> "Polygon":
        return self.to_shifted_polygon(-origin_y, -origin_x)

    def to_dilated_polygon(self, ratio: float) -> "Polygon":
        """Scale points away from the centroid by (1 + ratio)."""
        center = self.points.mean(axis=0, keepdims=True)
        return Polygon(center + (self.points - center) * (1.0 + ratio), score=self.score)

    def fill_mask(self, shape: Tuple[int, int]) -> np.ndarray:
        """Rasterize to a uint8 mask of ``shape``."""
        mask = np.zeros(shape, dtype=np.uint8)
        pts = np.round(self.points).astype(np.int32)
        cv2.fillPoly(mask, [pts], 1)
        return mask

    def extract_score_map_values(self, score_map: np.ndarray) -> np.ndarray:
        """Values of ``score_map`` inside the polygon (flat array)."""
        mask = self.fill_mask(score_map.shape[:2])
        return score_map[mask > 0]

    def area(self) -> float:
        x, y = self.xs, self.ys
        return float(abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))) / 2.0


def mask_to_disconnected_polygons(mask: np.ndarray, min_area: float = 1.0) -> List[Polygon]:
    """Connected components of a binary mask -> external contour polygons
    (vkit ``Mask.to_disconnected_polygons`` replacement)."""
    mask_u8 = (np.asarray(mask) > 0).astype(np.uint8)
    contours, _ = cv2.findContours(mask_u8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    polygons: List[Polygon] = []
    for contour in contours:
        if len(contour) < 3:
            continue
        poly = Polygon(contour.reshape(-1, 2).astype(np.float32))
        if poly.area() >= min_area:
            polygons.append(poly)
    return polygons


def rotate_trans_mat(angle_deg: float, shape: Tuple[int, int]) -> np.ndarray:
    """(2, 3) affine matrix rotating an image of ``shape`` by ``angle_deg``
    counter-clockwise about its center, with the output canvas expanded to
    the rotated bounds (vkit RotateState.trans_mat semantics used at
    reference inferencing/adaptive_scaling.py:575-584)."""
    h, w = shape
    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    mat = cv2.getRotationMatrix2D(center, angle_deg, 1.0)
    cos = abs(mat[0, 0])
    sin = abs(mat[0, 1])
    new_w = int(h * sin + w * cos + 0.5)
    new_h = int(h * cos + w * sin + 0.5)
    mat[0, 2] += (new_w - 1) / 2.0 - center[0]
    mat[1, 2] += (new_h - 1) / 2.0 - center[1]
    return mat.astype(np.float32)


def rotated_shape(angle_deg: float, shape: Tuple[int, int]) -> Tuple[int, int]:
    h, w = shape
    rad = math.radians(angle_deg)
    cos, sin = abs(math.cos(rad)), abs(math.sin(rad))
    return (int(h * cos + w * sin + 0.5), int(h * sin + w * cos + 0.5))


def affine_polygons(trans_mat: np.ndarray, polygons: Sequence[Polygon]) -> List[Polygon]:
    """Apply a (2, 3) or (3, 3) affine matrix to polygons (vkit
    ``affine_polygons`` replacement)."""
    mat = np.asarray(trans_mat, dtype=np.float32)
    if mat.shape == (2, 3):
        mat = np.vstack([mat, np.asarray([[0.0, 0.0, 1.0]], dtype=np.float32)])
    out: List[Polygon] = []
    for poly in polygons:
        pts = np.concatenate(
            [poly.points, np.ones((len(poly.points), 1), dtype=np.float32)], axis=1
        )
        transformed = pts @ mat.T
        out.append(Polygon(transformed[:, :2], score=poly.score))
    return out
