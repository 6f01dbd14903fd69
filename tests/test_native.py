"""Native (C++) synth rasterizer: build, backend equivalence contracts.

The native backend shares the python backend's geometry and rng stream
(adascale/data/synth.py::_glyph_commands) — pages for a (seed, run_idx)
pair have IDENTICAL char/line GT across backends, and only rasterized
pixels may differ (cv2 anti-aliased primitives vs the C++ rasterizer).
"""
import numpy as np
import pytest

from adascale import native
from adascale.data.synth import (
    CharInstance,
    SynthPageConfig,
    generate_page,
    render_char_labels,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native renderer unavailable (no g++?)"
)


def _cfg(backend):
    return SynthPageConfig(
        page_height=256,
        page_width=256,
        num_lines_min=4,
        num_lines_max=6,
        char_height_min=12,
        char_height_max=28,
        perspective_prob=0.0,
        render_backend=backend,
    )


def test_geometry_identical_across_backends():
    p_py = generate_page(_cfg("python"), np.random.default_rng(11))
    p_nat = generate_page(_cfg("native"), np.random.default_rng(11))
    assert len(p_py.chars) == len(p_nat.chars)
    for a, b in zip(p_py.chars, p_nat.chars):
        np.testing.assert_array_equal(a.corners, b.corners)
        assert a.height == b.height


def test_rendered_ink_overlaps_python_backend():
    p_py = generate_page(_cfg("python"), np.random.default_rng(11))
    p_nat = generate_page(_cfg("native"), np.random.default_rng(11))
    # Ink masks (well below background gray) must substantially overlap.
    bg_floor = 140
    ink_py = (p_py.image[..., 0] < bg_floor)
    ink_nat = (p_nat.image[..., 0] < bg_floor)
    inter = float(np.sum(ink_py & ink_nat))
    union = float(np.sum(ink_py | ink_nat))
    assert union > 0
    assert inter / union > 0.55, inter / union
    # Every char quad must actually contain ink in the native rendering.
    h, w = p_nat.image.shape[:2]
    hit = 0
    for c in p_nat.chars:
        x0, y0 = np.floor(c.corners.min(axis=0)).astype(int)
        x1, y1 = np.ceil(c.corners.max(axis=0)).astype(int)
        roi = p_nat.image[max(0, y0):min(h, y1 + 1), max(0, x0):min(w, x1 + 1), 0]
        if roi.size and roi.min() < bg_floor:
            hit += 1
    assert hit / len(p_nat.chars) > 0.9


def test_labels_match_python_backend():
    rng = np.random.default_rng(5)
    chars = []
    for _ in range(20):
        x, y = rng.uniform(20, 220, size=2)
        hgt = float(rng.uniform(10, 26))
        wid = hgt * float(rng.uniform(0.5, 1.0))
        corners = np.asarray(
            [[x, y], [x + wid, y], [x + wid, y + hgt], [x, y + hgt]], np.float32
        )
        chars.append(CharInstance(corners=corners, height=hgt))

    m_py, h_py, g_py = render_char_labels(chars, (256, 256), 2, backend="python")
    m_nat, h_nat, g_nat = render_char_labels(chars, (256, 256), 2, backend="native")

    inter = float(np.sum((m_py == 1) & (m_nat == 1)))
    union = float(np.sum((m_py == 1) | (m_nat == 1)))
    assert inter / union > 0.9, inter / union
    both = (m_py == 1) & (m_nat == 1)
    np.testing.assert_allclose(h_py[both], h_nat[both], atol=1e-4)
    # Same gaussian formula on both sides.
    np.testing.assert_allclose(g_py, g_nat, atol=1e-5)


def test_native_page_throughput_smoke():
    """Native rendering of a default-size page must not be slower than the
    python path (sanity; the real win is measured in bench.py)."""
    import time

    cfg_n = _cfg("native")
    cfg_p = _cfg("python")
    generate_page(cfg_n, np.random.default_rng(0))  # warm build/atlas
    t0 = time.perf_counter()
    for i in range(3):
        generate_page(cfg_n, np.random.default_rng(i))
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(3):
        generate_page(cfg_p, np.random.default_rng(i))
    t_py = time.perf_counter() - t0
    assert t_nat < t_py * 1.5, (t_nat, t_py)
