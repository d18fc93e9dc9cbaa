#!/usr/bin/env python3
"""Bin detector: beige HSV mask -> morphology -> minAreaRect filtering.

Parity target: reference modules/bins.py:10-81 — HSV inRange for the beige
background, overlay visualization, open-morphology denoise, outer contours,
minAreaRect candidates filtered by area > 500 and aspect ratio in [1, 3],
all drawn on the overlay.

TPU re-design: HSV mask + open morphology + the 0.7/0.3 overlay blend run
as ONE device graph on the module's @device_fn fast path (pipelined, one
packed fetch per frame); contour tracing + rotated rectangles stay on host
where they feed drawing only.
"""

from __future__ import annotations

import numpy as np

from ..core.base import ModuleBase, device_fn
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
    @device_fn("*", depth=1, async_fetch=True)
    def bins_chain(self, img, *, tuners, want_posts):
        """HSV inRange + open morphology + the reference's 0.7/0.3 overlay
        blend as one device graph; one packed fetch carries both the
        cleaned mask (for host contours) and the overlay image."""
        import jax.numpy as jnp

        from ..ops import color as C
        from ..ops import morphology as M
        from ..ops import threshold as T

        hsv = C.bgr_to_hsv(img)
        mask = T.in_range(hsv, LOWER_BEIGE, UPPER_BEIGE)
        cleaned = M.open_morph(mask, M.rect_kernel(5))
        result = {"cleaned": cleaned}
        posts = {}
        if want_posts:
            # overlay = 0.7*img + 0.3*mask_bgr (the reference's viz)
            blend = (
                img.astype(jnp.float32) * jnp.float32(0.7)
                + mask[..., None].astype(jnp.float32) * jnp.float32(0.3)
            )
            posts["overlay"] = blend.astype(jnp.uint8)
        return result, posts

    def on_device_result(self, result, posts, meta):
        cleaned = result["cleaned"]
        valid_rects = []
        for contour in outer_contours(cleaned):
            rect = min_enclosing_rect(contour)
            (_, (w, h), _) = rect
            if w * h < 500 or min(w, h) == 0:
                continue
            aspect = max(w, h) / min(w, h)
            if 1.0 <= aspect <= 3.0:
                valid_rects.append(rect)

        overlayed = posts.get("overlay")
        if overlayed is not None:
            if not overlayed.flags.writeable:  # packed-fetch views are RO
                overlayed = overlayed.copy()
            for rect in valid_rects:
                pts = box_points(rect).astype(np.int32)
                draw_polylines(overlayed, [pts], True, Color.GREEN, 4)
            self.post("bins", overlayed)


if __name__ == "__main__":
    BinDetector(video_sources=["forward"], tuners=[])()
