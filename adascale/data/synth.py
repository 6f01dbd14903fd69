"""Synthetic OCR page generator.

Replaces the external ``vkit.pipeline`` synthetic-data system (the implicit
dependency of the reference dataset, /root/reference/vkit_open_model/dataset/
adaptive_scaling.py:22-32) with a self-contained generator that emits the
exact label contract the model trains on:

  * page image with glyph-textured character quadrilaterals laid out in
    (optionally rotated) text lines on a noisy paper background,
  * char mask, char-height score map (height in model-input pixels, the
    quantity the rough pass regresses — see reference inferencing/
    adaptive_scaling.py:236-248 for the unit convention),
  * per-char gaussian heatmap (precise-pass prob target),
  * per-char regression labels: downsampled label point, up-left corner
    offsets, clockwise corner-angle distribution (fractions of 2*pi), and
    clockwise corner distances — the same quantities
    ``PageCharRegressionLabel.generate_*`` provides to the collate fn
    (reference dataset/adaptive_scaling.py:308-337), defined so that the
    polar reconstruction in inference (reference inferencing/
    adaptive_scaling.py:398-465) inverts them exactly.

Determinism: everything flows from a numpy ``Generator``; a (seed, run_idx)
pair regenerates any sample (provenance parity with the reference's
per-sample ``rng_state``, dataset/adaptive_scaling.py:44,83).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from .geometry import Box


@dataclasses.dataclass(frozen=True)
class SynthPageConfig:
    """Generator knobs (the role of the reference's steps-JSON)."""

    page_height: int = 1024
    page_width: int = 1024
    num_lines_min: int = 8
    num_lines_max: int = 18
    char_height_min: int = 14
    char_height_max: int = 64
    char_aspect_min: float = 0.45
    char_aspect_max: float = 1.0
    char_gap_ratio: float = 0.18
    line_rotate_prob: float = 0.35
    line_rotate_max_deg: float = 25.0
    background_gray_min: int = 180
    background_gray_max: int = 250
    noise_sigma: float = 8.0
    ink_gray_max: int = 90
    gaussian_sigma_ratio: float = 0.25


@dataclasses.dataclass
class CharInstance:
    """One character: quadrilateral corners (4, 2) float32 (x, y) in page
    coords, ordered up-left, up-right, down-right, down-left; height in page
    pixels."""

    corners: np.ndarray
    height: float

    @property
    def center(self) -> np.ndarray:
        return self.corners.mean(axis=0)


@dataclasses.dataclass
class TextLine:
    chars: List[CharInstance]
    char_height: float

    def bounding_box(self) -> Box:
        pts = np.concatenate([c.corners for c in self.chars], axis=0)
        return Box(
            up=int(pts[:, 1].min()),
            down=int(math.ceil(pts[:, 1].max())),
            left=int(pts[:, 0].min()),
            right=int(math.ceil(pts[:, 0].max())),
        )


@dataclasses.dataclass
class SynthPage:
    image: np.ndarray  # (H, W, 3) uint8
    chars: List[CharInstance]
    lines: List[TextLine]
    config: SynthPageConfig


def _draw_glyph(image: np.ndarray, corners: np.ndarray, rng: np.random.Generator,
                ink: int) -> None:
    """Texture a char quad with a few strokes so it is not a flat box."""
    ul, ur, dr, dl = corners
    num_strokes = int(rng.integers(2, 5))
    for _ in range(num_strokes):
        a, b = rng.uniform(size=(2, 2))
        p0 = ul + a[0] * (ur - ul) + a[1] * (dl - ul)
        p1 = ul + b[0] * (ur - ul) + b[1] * (dl - ul)
        thickness = max(1, int(rng.integers(1, 3)))
        cv2.line(
            image,
            tuple(np.round(p0).astype(int)),
            tuple(np.round(p1).astype(int)),
            (ink, ink, ink),
            thickness,
        )
    cv2.polylines(
        image,
        [np.round(corners).astype(np.int32)],
        isClosed=True,
        color=(ink, ink, ink),
        thickness=1,
    )


def generate_page(config: SynthPageConfig, rng: np.random.Generator) -> SynthPage:
    h, w = config.page_height, config.page_width
    bg = int(rng.integers(config.background_gray_min, config.background_gray_max + 1))
    image = np.full((h, w, 3), bg, dtype=np.uint8)
    noise = rng.normal(0.0, config.noise_sigma, size=(h, w, 1))
    image = np.clip(image.astype(np.float32) + noise, 0, 255).astype(np.uint8)

    lines: List[TextLine] = []
    chars: List[CharInstance] = []

    num_lines = int(rng.integers(config.num_lines_min, config.num_lines_max + 1))
    for _ in range(num_lines):
        ch = float(rng.uniform(config.char_height_min, config.char_height_max))
        angle = 0.0
        if rng.uniform() < config.line_rotate_prob:
            angle = float(rng.uniform(-config.line_rotate_max_deg, config.line_rotate_max_deg))
        rad = math.radians(angle)
        # y-down coords; positive angle rotates the line downwards to the right.
        direction = np.asarray([math.cos(rad), math.sin(rad)], dtype=np.float32)
        normal = np.asarray([-math.sin(rad), math.cos(rad)], dtype=np.float32)

        line_len = float(rng.uniform(0.3, 0.9)) * w
        x0 = float(rng.uniform(0, max(1.0, w - line_len)))
        y0 = float(rng.uniform(ch + 4, h - ch - 4))
        origin = np.asarray([x0, y0], dtype=np.float32)

        line_chars: List[CharInstance] = []
        cursor = 0.0
        ink = int(rng.integers(10, config.ink_gray_max))
        while cursor < line_len:
            cw = ch * float(rng.uniform(config.char_aspect_min, config.char_aspect_max))
            ul = origin + cursor * direction
            ur = origin + (cursor + cw) * direction
            dl = ul + ch * normal
            dr = ur + ch * normal
            corners = np.stack([ul, ur, dr, dl]).astype(np.float32)
            cursor += cw * (1.0 + config.char_gap_ratio)
            if (
                corners[:, 0].min() < 0
                or corners[:, 1].min() < 0
                or corners[:, 0].max() >= w
                or corners[:, 1].max() >= h
            ):
                continue
            _draw_glyph(image, corners, rng, ink)
            line_chars.append(CharInstance(corners=corners, height=ch))
        if line_chars:
            lines.append(TextLine(chars=line_chars, char_height=ch))
            chars.extend(line_chars)

    return SynthPage(image=image, chars=chars, lines=lines, config=config)


def render_char_labels(
    chars: Sequence[CharInstance],
    shape: Tuple[int, int],
    downsample_factor: int,
    gaussian_sigma_ratio: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render (downsampled) label maps for chars given in *crop* coords.

    Returns (char_mask, char_height_map, char_gaussian_map), each of shape
    ``(shape[0] // f, shape[1] // f)``. Heights are painted in crop-pixel
    units (the unit the rough pass regresses); the gaussian peaks at 1.0 at
    each char center.
    """
    f = downsample_factor
    dh, dw = shape[0] // f, shape[1] // f
    mask = np.zeros((dh, dw), dtype=np.uint8)
    height_map = np.zeros((dh, dw), dtype=np.float32)
    gaussian = np.zeros((dh, dw), dtype=np.float32)

    for char in chars:
        corners_d = char.corners / f
        pts = np.round(corners_d).astype(np.int32)
        cv2.fillPoly(mask, [pts], 1)
        cv2.fillPoly(height_map, [pts], float(char.height))

        center = char.center / f
        sigma = max(0.7, gaussian_sigma_ratio * char.height / f)
        radius = int(math.ceil(3 * sigma))
        cx, cy = center
        x0, x1 = max(0, int(cx) - radius), min(dw, int(cx) + radius + 1)
        y0, y1 = max(0, int(cy) - radius), min(dh, int(cy) + radius + 1)
        if x0 >= x1 or y0 >= y1:
            continue
        ys = np.arange(y0, y1, dtype=np.float32)[:, None]
        xs = np.arange(x0, x1, dtype=np.float32)[None, :]
        blob = np.exp(-(((xs - cx) ** 2 + (ys - cy) ** 2) / (2.0 * sigma * sigma)))
        region = gaussian[y0:y1, x0:x1]
        np.maximum(region, blob, out=region)

    return mask, height_map, gaussian


def char_regression_label(
    char: CharInstance,
    downsample_factor: int,
    downsampled_shape: Tuple[int, int],
) -> Optional[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]]:
    """Build the per-char regression label, crop coords.

    Returns (label_point_y, label_point_x, up_left_offsets (2,),
    angle_distribution (4,), distances (4,)) or None if degenerate.

    Conventions (must invert exactly under inference's polar reconstruction,
    reference inferencing/adaptive_scaling.py:398-465):
      * label point = char center in the downsampled grid (int).
      * the point's position in crop pixels is ``point * f`` (plain
        conducted upscaling).
      * offsets = up_left_corner - upsampled_point, (y, x) order.
      * angles: clockwise fractions of 2*pi between consecutive corner
        directions seen from the point; distances: euclidean, corner order
        up-left, up-right, down-right, down-left.
    """
    f = downsample_factor
    dh, dw = downsampled_shape
    center = char.center
    py = int(round(center[1] / f))
    px = int(round(center[0] / f))
    if not (0 <= py < dh and 0 <= px < dw):
        return None
    point = np.asarray([px * f, py * f], dtype=np.float32)  # (x, y)

    deltas = char.corners - point[None, :]  # (4, 2) (dx, dy)
    distances = np.linalg.norm(deltas, axis=1).astype(np.float32)
    if np.any(distances < 1e-3):
        return None

    thetas = np.mod(np.arctan2(deltas[:, 1], deltas[:, 0]), 2 * np.pi)
    diffs = np.mod(np.roll(thetas, -1) - thetas, 2 * np.pi)
    if not np.isclose(diffs.sum(), 2 * np.pi, atol=1e-3):
        # Point outside the quad; angles do not wind once around.
        return None
    angle_distribution = (diffs / (2 * np.pi)).astype(np.float32)

    up_left_offsets = np.asarray(
        [deltas[0, 1], deltas[0, 0]], dtype=np.float32
    )  # (y, x)
    return py, px, up_left_offsets, angle_distribution, distances
