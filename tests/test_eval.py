"""Detection-quality eval tests (adascale/inference/eval.py) — the metric
layer behind the overfit->detect integration check. The reference has no
quality evaluation at all (demo.py only renders JPEGs), so these pin the
new framework's metric semantics."""
import numpy as np

from adascale.data.geometry import Polygon
from adascale.inference.eval import (
    evaluate_char_detection,
    mask_iou,
    match_polygons,
    polygon_iou,
)


def _square(x0, y0, size):
    return Polygon(
        np.asarray(
            [[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
            np.float32,
        )
    )


def test_polygon_iou_identical_and_disjoint():
    a = _square(5, 5, 10)
    assert polygon_iou(a, _square(5, 5, 10)) > 0.95
    assert polygon_iou(a, _square(100, 100, 10)) == 0.0


def test_polygon_iou_partial_overlap():
    # Two 10x10 squares overlapping in a 5x10 band: IoU = 50/150 = 1/3.
    a = _square(0, 0, 10)
    b = _square(5, 0, 10)
    iou = polygon_iou(a, b)
    assert abs(iou - 1 / 3) < 0.08  # rasterization tolerance


def test_match_polygons_one_to_one():
    gts = [_square(0, 0, 10), _square(20, 0, 10), _square(40, 0, 10)]
    # Two preds on gt0 (only one may match), one on gt1, none on gt2.
    preds = [_square(0, 0, 10), _square(1, 0, 10), _square(20, 1, 10)]
    matches = match_polygons(preds, gts, iou_thr=0.5)
    assert len(matches) == 2
    matched_gts = {j for _, j, _ in matches}
    assert matched_gts == {0, 1}
    matched_preds = {i for i, _, _ in matches}
    assert len(matched_preds) == 2


def test_evaluate_char_detection_metrics():
    gt_corners = [
        np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32),
        np.asarray([[20, 0], [30, 0], [30, 10], [20, 10]], np.float32),
        np.asarray([[40, 0], [50, 0], [50, 10], [40, 10]], np.float32),
        np.asarray([[60, 0], [70, 0], [70, 10], [60, 10]], np.float32),
    ]
    preds = [_square(0, 0, 10), _square(20, 0, 10), _square(100, 100, 10)]
    m = evaluate_char_detection(preds, gt_corners, iou_thr=0.5)
    assert m.num_matched == 2
    assert abs(m.precision - 2 / 3) < 1e-6
    assert abs(m.recall - 2 / 4) < 1e-6
    expected_f1 = 2 * (2 / 3) * 0.5 / (2 / 3 + 0.5)
    assert abs(m.f1 - expected_f1) < 1e-6
    assert m.mean_matched_iou > 0.9


def test_evaluate_char_detection_empty():
    m = evaluate_char_detection([], [], iou_thr=0.5)
    assert m.f1 == 0.0 and m.num_pred == 0 and m.num_gt == 0


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[:5] = 1
    assert mask_iou(a, b) == 1.0
    b[:] = 0
    b[5:] = 1
    assert mask_iou(a, b) == 0.0
    assert mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
