"""Render distribution-shift fixture pages: real-FONT documents.

Training pages draw characters as random strokes/blobs/ellipse parts
(adascale/data/synth.py); the model has never seen an actual typeface.
These fixtures render paragraphs of DejaVu Sans/Serif/Mono text with PIL,
record the exact per-glyph ground-truth quadrilaterals, apply a small page
rotation plus scan-like degradations (noise, vignette, JPEG artifacts),
and save everything as .npz for `eval_checkpoint --shift`. This is the
robustness probe the reference lacks entirely (its only evaluation is
eyeballing demo JPEGs, experiment/adaptive_scaling/demo.py:178-220).

Usage:
  python -m adascale.tools.shift_fixtures [--out tests/fixtures/shift_pages]
"""
from __future__ import annotations

import argparse
import os
import string
from typing import List, Tuple

import numpy as np

FONTS = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
]
# Full-bodied glyphs only: thin marks ('i', 'l', '.', quotes) have ink
# boxes far narrower than the char-cell convention the synthetic GT uses,
# which would turn the IoU matching into a convention test instead of a
# detection test.
CHARS = "".join(
    c for c in string.ascii_uppercase + string.ascii_lowercase + string.digits
    if c not in "iljI1"
)


def _render_page(
    rng: np.random.Generator, page_h: int = 1024, page_w: int = 768
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (image uint8 (H,W), corners float32 (N,4,2) xy, heights (N,))."""
    from PIL import Image, ImageDraw, ImageFont

    bg = int(rng.integers(200, 245))
    img = Image.new("L", (page_w, page_h), color=bg)
    draw = ImageDraw.Draw(img)
    font_path = FONTS[int(rng.integers(len(FONTS)))]

    corners: List[np.ndarray] = []
    heights: List[float] = []
    y = int(rng.integers(30, 70))
    while True:
        size = int(rng.integers(18, 54))
        font = ImageFont.truetype(font_path, size=size)
        line_gap = int(size * float(rng.uniform(1.25, 1.8)))
        if y + line_gap + 30 > page_h:
            break
        x = int(rng.integers(25, 60))
        n_words = int(rng.integers(3, 9))
        ink = int(rng.integers(10, 100))
        for _ in range(n_words):
            word_len = int(rng.integers(2, 9))
            for _ in range(word_len):
                ch = CHARS[int(rng.integers(len(CHARS)))]
                l, t, r, b = draw.textbbox((x, y), ch, font=font)
                if r >= page_w - 20:
                    x = page_w  # line full
                    break
                draw.text((x, y), ch, font=font, fill=ink)
                corners.append(
                    np.asarray(
                        [[l, t], [r, t], [r, b], [l, b]], dtype=np.float32
                    )
                )
                heights.append(float(b - t))
                adv = draw.textlength(ch, font=font)
                x += int(adv) + int(rng.integers(0, 3))
            x += int(size * 0.5)
            if x >= page_w - 60:
                break
        y += line_gap

    arr = np.asarray(img, dtype=np.uint8)
    quads = np.stack(corners).astype(np.float32)

    import cv2

    # Small page rotation (scan skew).
    angle = float(rng.uniform(-3.0, 3.0))
    mat = cv2.getRotationMatrix2D((page_w / 2, page_h / 2), angle, 1.0)
    arr = cv2.warpAffine(
        arr, mat, (page_w, page_h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=bg,
    )
    flat = quads.reshape(-1, 2)
    flat = flat @ mat[:, :2].T + mat[:, 2]
    quads = flat.reshape(-1, 4, 2).astype(np.float32)

    # Scan-like degradations: vignette, sensor noise, JPEG roundtrip.
    yy, xx = np.mgrid[0:page_h, 0:page_w].astype(np.float32)
    vignette = 1.0 - 0.15 * np.hypot(
        (yy / page_h) - 0.5, (xx / page_w) - 0.5
    )
    arr = arr.astype(np.float32) * vignette
    arr = arr + rng.normal(0.0, 6.0, size=arr.shape)
    arr = np.clip(arr, 0, 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", arr, [int(cv2.IMWRITE_JPEG_QUALITY), 70])
    assert ok
    arr = cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE)
    # Engine contract is (H, W, 3) uint8 (SynthPage.image).
    arr = np.repeat(arr[:, :, None], 3, axis=2)
    return arr, quads, np.asarray(heights, dtype=np.float32)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/fixtures/shift_pages")
    parser.add_argument("--num-pages", type=int, default=3)
    parser.add_argument("--seed", type=int, default=20260817)
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.num_pages):
        image, quads, heights = _render_page(
            np.random.default_rng([args.seed, i])
        )
        path = os.path.join(args.out, f"page_{i}.npz")
        np.savez_compressed(
            path, image=image, corners=quads, heights=heights
        )
        print(f"{path}: {image.shape}, {len(quads)} chars")


if __name__ == "__main__":
    main()
