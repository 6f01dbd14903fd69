"""E2E inference demo driver with visualizations.

Mirrors the reference demo (/root/reference/experiment/adaptive_scaling/
demo.py:32-220): runs the full two-stage pipeline on a page image and writes
the same family of visualization JPEGs (rough mask/score-map overlays, text
region polygons + typicality coloring, stacked image, precise prob map and
thresholded mask, per-char polygons, remapped polygons with colored borders).
"""
from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from ..utils.config import load_config
from ..utils.painter import Painter
from .engine import AdaptiveScalingInference, AdaptiveScalingInferenceConfig


def _resize_nearest_to(mat: np.ndarray, shape) -> np.ndarray:
    return cv2.resize(mat, (shape[1], shape[0]), interpolation=cv2.INTER_NEAREST)


def infer(
    inferencing_config_json: Optional[str],
    image_file: str,
    output_folder: str,
    engine: Optional[AdaptiveScalingInference] = None,
    image: Optional[np.ndarray] = None,
) -> dict:
    os.makedirs(output_folder, exist_ok=True)
    if engine is None:
        config = load_config(inferencing_config_json, AdaptiveScalingInferenceConfig)
        engine = AdaptiveScalingInference(config)
    if image is None:
        image = cv2.imread(image_file)[:, :, ::-1]  # BGR -> RGB

    result = engine.detect(image)
    rough = result["rough"]
    precise = result["precise"]
    regions = result["regions"]
    stacked = result["stacked_image"]

    # Rough visualizations (reference demo.py:32-60).
    ph, pw = rough.padded_image_shape
    padded = np.zeros((ph, pw, 3), dtype=np.uint8)
    rh, rw = rough.resized_image_shape
    padded[:rh, :rw] = cv2.resize(image, (rw, rh), interpolation=cv2.INTER_AREA)

    Painter(padded).paint_mask(
        _resize_nearest_to(rough.rough_char_mask, (ph, pw))
    ).to_file(os.path.join(output_folder, "rough_mask.jpg"))
    Painter(padded).paint_score_map(
        _resize_nearest_to(rough.rough_char_height_score_map, (ph, pw)), alpha=1.0
    ).to_file(os.path.join(output_folder, "rough_score_map.jpg"))

    # Text region visualizations (demo.py:63-103).
    polygons = [r.text_region_polygon for r in regions]
    Painter(image).paint_polygons(polygons, enable_index=True).to_file(
        os.path.join(output_folder, "text_region_polygons.jpg")
    )
    colors = ["red" if r.is_typical else "blue" for r in regions]
    Painter(image).paint_polygons(polygons, color=colors).to_file(
        os.path.join(output_folder, "text_region_polygons_is_typical.jpg")
    )
    Painter(stacked).to_file(os.path.join(output_folder, "stacked_image.jpg"))

    # Precise visualizations (demo.py:106-137).
    sph, spw = precise.padded_image_shape
    stacked_padded = np.zeros((sph, spw, 3), dtype=np.uint8)
    sh, sw = precise.stacked_image_shape
    stacked_padded[:sh, :sw] = stacked
    Painter(stacked_padded).paint_score_map(
        _resize_nearest_to(precise.precise_char_prob_score_map, (sph, spw))
    ).to_file(os.path.join(output_folder, "precise_char_prob_score_map.jpg"))
    thr = engine.config.precise_build_polygons_positive_char_prob_thr
    Painter(stacked_padded).paint_mask(
        _resize_nearest_to(
            (precise.precise_char_prob_score_map >= thr).astype(np.uint8), (sph, spw)
        )
    ).to_file(os.path.join(output_folder, "precise_char_prob_gt_70_mask.jpg"))

    # Polygon visualizations (demo.py:140-175).
    grouped = result["grouped_polygons"]
    flat = [p for group in grouped for p in group]
    Painter(stacked_padded).paint_polygons(flat).to_file(
        os.path.join(output_folder, "precise_char_polygons.jpg")
    )
    remapped = result["char_polygons"]
    Painter(image).paint_polygons(remapped).to_file(
        os.path.join(output_folder, "remapped_char_polygons.jpg")
    )

    lines, colors = [], []
    for polygon in remapped:
        pts = polygon.points
        if len(pts) != 4:
            continue
        ul, ur, dr, dl = pts
        lines.extend(
            [
                (tuple(ul), tuple(ur)),
                (tuple(ur), tuple(dr)),
                (tuple(dr), tuple(dl)),
                (tuple(dl), tuple(ul)),
            ]
        )
        colors.extend(["green", "yellow", "red", "yellow"])
    Painter(image).paint_lines(lines, color=colors, thickness=1, alpha=0.8).to_file(
        os.path.join(output_folder, "remapped_char_polygons_border.jpg")
    )

    return result
