#!/usr/bin/env python3
"""Bin detector: beige HSV mask -> morphology -> minAreaRect filtering.

Parity target: reference modules/bins.py:10-81 — HSV inRange for the beige
background, overlay visualization, open-morphology denoise, outer contours,
minAreaRect candidates filtered by area > 500 and aspect ratio in [1, 3],
all drawn on the overlay.

TPU re-design: the mask+morphology run as one fused device chain
(hsv_mask_chain); contour tracing + rotated rectangles stay on host where
they feed drawing only.
"""

from __future__ import annotations

import numpy as np

from ..core.base import ModuleBase
from ..engine.chains import HsvMaskPipeline
from ..utils.draw import Color, draw_polylines
from ..utils.feature import min_enclosing_rect, outer_contours

LOWER_BEIGE = np.array([10, 20, 60], np.uint8)
UPPER_BEIGE = np.array([30, 100, 255], np.uint8)


def box_points(rect) -> np.ndarray:
    """cv2.boxPoints equivalent for our min_enclosing_rect tuples."""
    import math

    (cx, cy), (w, h), angle = rect
    rad = math.radians(angle)
    c, s = math.cos(rad), math.sin(rad)
    hw, hh = w / 2.0, h / 2.0
    pts = []
    for dx, dy in ((-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)):
        pts.append((cx + dx * c - dy * s, cy + dx * s + dy * c))
    return np.array(pts, np.float32)


class BinDetector(ModuleBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pipeline = HsvMaskPipeline(LOWER_BEIGE, UPPER_BEIGE)

    def process(self, direction, img):
        mask, cleaned, _stats = self._pipeline.run_sync(img)

        # overlay = 0.7*img + 0.3*mask_bgr (the reference's visualization)
        mask_bgr = np.repeat(mask[..., None], 3, axis=-1)
        overlayed = (
            img.astype(np.float32) * 0.7 + mask_bgr.astype(np.float32) * 0.3
        ).astype(np.uint8)

        valid_rects = []
        for contour in outer_contours(cleaned):
            rect = min_enclosing_rect(contour)
            (_, (w, h), _) = rect
            if w * h < 500 or min(w, h) == 0:
                continue
            aspect = max(w, h) / min(w, h)
            if 1.0 <= aspect <= 3.0:
                valid_rects.append(rect)

        for rect in valid_rects:
            pts = box_points(rect).astype(np.int32)
            draw_polylines(overlayed, [pts], True, Color.GREEN, 4)

        self.post("bins", overlayed)


if __name__ == "__main__":
    BinDetector(video_sources=["forward"], tuners=[])()
