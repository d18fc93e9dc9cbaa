#!/usr/bin/env python3
"""Red buoy detector — the canonical threshold+contour module, TPU edition.

Parity target: reference modules/red_buoy.py:16-56 (the primary benchmark
config). Pipeline: BGR -> LAB A channel -> inRange with thresh_min/max
IntTuners -> open+close with a 5x5 rect kernel -> contours -> centroid/area
of the most likely blob -> normalize -> shm.red_buoy_results + debug posts.

TPU re-design: the whole chain is ONE jitted graph (engine/chains.py
red_buoy_chain) — colorspace, threshold, morphology and connected-component
stats fuse on device; only the final scalars and (outside performance mode)
the two debug masks come back to the host. Tuner values feed the graph as
traced scalars, so live tuning never recompiles.
"""

from __future__ import annotations

import numpy as np

from ..core import shm
from ..core.base import ModuleBase, sources
from ..core.tuners import IntTuner
from ..engine.chains import RedBuoyPipeline
from ..utils.draw import Color, draw_circle, draw_rect

module_tuners = [
    IntTuner("thresh_min", 0, 0, 255),
    IntTuner("thresh_max", 255, 0, 255),
]


class BuoyLAB(ModuleBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pipeline = RedBuoyPipeline()
        # fresh results on startup: stale values from a previous run must
        # not read as a live detection
        shm.red_buoy_results.set(
            visible=False, center_x=0.0, center_y=0.0, area=0.0
        )

    @sources("zed[forward]", "zed[normal]")
    def process_img(self, image: np.ndarray, normal: np.ndarray):
        tmin = np.int32(self.tuners["thresh_min"])
        tmax = np.int32(self.tuners["thresh_max"])

        threshed, cleaned, best = self._pipeline.run_sync(image, tmin, tmax)


        self.post("threshed", threshed, "GRAY")
        self.post("threshed_cleaned", cleaned, "GRAY")

        found = bool(best["found"])
        if found:
            cy, cx = (float(v) for v in best["centroid"])
            area = float(best["area"])
            ny, nx = self.normalize((cy, cx))
        else:
            cy = cx = area = 0.0
            ny = nx = 0.0

        shm.red_buoy_results.set(
            visible=found, center_x=nx, center_y=ny, area=area
        )

        annotated = np.ascontiguousarray(image)
        if found:
            x, y, w, h = (int(v) for v in best["bbox"])
            draw_rect(annotated, (x, y), (x + w, y + h), Color.GREEN, thickness=3)
            draw_circle(annotated, (int(cx), int(cy)), 4, Color.YELLOW, thickness=-1)
        self.post("contours", annotated)


if __name__ == "__main__":
    BuoyLAB(["zed"], module_tuners)()
