"""Visualization painter (cv2-based).

Replaces the external vkit ``Painter`` surface used by the reference demo
(/root/reference/experiment/adaptive_scaling/demo.py:32-175): mask/score-map
overlays, polygon/point/line painting, and JPEG output.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

Color = Union[str, Tuple[int, int, int]]

_COLORS = {
    "red": (255, 0, 0),
    "green": (0, 200, 0),
    "blue": (0, 0, 255),
    "yellow": (255, 210, 0),
    "cyan": (0, 200, 200),
    "magenta": (230, 0, 230),
    "white": (255, 255, 255),
    "black": (0, 0, 0),
}


def _rgb(color: Color) -> Tuple[int, int, int]:
    if isinstance(color, str):
        return _COLORS[color]
    return tuple(int(c) for c in color)  # type: ignore[return-value]


class Painter:
    def __init__(self, image: np.ndarray):
        self.image = np.ascontiguousarray(image.copy())

    def paint_mask(self, mask: np.ndarray, color: Color = "red", alpha: float = 0.5):
        m = np.asarray(mask) > 0
        overlay = self.image.astype(np.float32)
        overlay[m] = (1 - alpha) * overlay[m] + alpha * np.asarray(_rgb(color), np.float32)
        self.image = overlay.astype(np.uint8)
        return self

    def paint_score_map(self, score_map: np.ndarray, alpha: float = 0.5):
        sm = np.asarray(score_map, dtype=np.float32)
        denom = sm.max() if sm.max() > 0 else 1.0
        norm = np.clip(sm / denom * 255.0, 0, 255).astype(np.uint8)
        heat = cv2.applyColorMap(norm, cv2.COLORMAP_JET)[:, :, ::-1]  # BGR->RGB
        blend = (1 - alpha) * self.image.astype(np.float32) + alpha * heat.astype(np.float32)
        self.image = blend.astype(np.uint8)
        return self

    def paint_polygons(
        self,
        polygons: Iterable,
        color: Union[Color, Sequence[Color]] = "red",
        thickness: int = 1,
        enable_index: bool = False,
    ):
        polygons = list(polygons)
        colors = (
            [color] * len(polygons)
            if isinstance(color, (str, tuple))
            else list(color)
        )
        for idx, (poly, c) in enumerate(zip(polygons, colors)):
            pts = np.round(np.asarray(poly.points)).astype(np.int32)
            cv2.polylines(self.image, [pts], True, _rgb(c), thickness)
            if enable_index:
                origin = pts.min(axis=0)
                cv2.putText(
                    self.image,
                    str(idx),
                    (int(origin[0]), int(origin[1])),
                    cv2.FONT_HERSHEY_PLAIN,
                    1.0,
                    _rgb(c),
                )
        return self

    def paint_points(
        self, points_xy: np.ndarray, color: Color = "green", radius: int = 2
    ):
        for x, y in np.round(np.asarray(points_xy)).astype(int):
            cv2.circle(self.image, (int(x), int(y)), radius, _rgb(color), -1)
        return self

    def paint_lines(
        self,
        lines: Sequence[Tuple[Tuple[float, float], Tuple[float, float]]],
        color: Union[Color, Sequence[Color]] = "red",
        thickness: int = 1,
        alpha: float = 1.0,
    ):
        canvas = self.image.copy()
        colors = (
            [color] * len(lines) if isinstance(color, (str, tuple)) else list(color)
        )
        for ((x0, y0), (x1, y1)), c in zip(lines, colors):
            cv2.line(
                canvas,
                (int(round(x0)), int(round(y0))),
                (int(round(x1)), int(round(y1))),
                _rgb(c),
                thickness,
            )
        if alpha >= 1.0:
            self.image = canvas
        else:
            self.image = (
                (1 - alpha) * self.image.astype(np.float32)
                + alpha * canvas.astype(np.float32)
            ).astype(np.uint8)
        return self

    def to_file(self, path) -> None:
        cv2.imwrite(str(path), self.image[:, :, ::-1])
