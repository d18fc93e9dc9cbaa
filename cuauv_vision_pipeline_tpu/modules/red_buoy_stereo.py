#!/usr/bin/env python3
"""Stereo red_buoy: both ZED eyes detected in ONE device dispatch.

The multi-camera fan-in story on one chip: the forward and forward2 planes
stack into a [2, H, W] mask batch, the batched Pallas CCL labels both in a
single kernel dispatch (ops/ccl.py label_fast -> label_pallas_batched), and
per-camera blob stats come back as one packed fetch. The reference would
run two module processes for this (reference core/module_toggler.py); here
it is one executable and one H2D/compute/readback cycle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import shm
from ..core.base import DeviceResultMeta, ModuleBase, device_fn
from ..core.tuners import IntTuner
from ..ops import ccl
from ..ops import color as C
from ..ops import morphology as M
from ..ops import threshold as T

module_tuners = [
    IntTuner("thresh_min", 0, 0, 255),
    IntTuner("thresh_max", 255, 0, 255),
]

shm.define_group(
    "red_buoy_stereo_results",
    {
        "visible_left": "bool",
        "center_x_left": "float",
        "center_y_left": "float",
        "area_left": "float",
        "visible_right": "bool",
        "center_x_right": "float",
        "center_y_right": "float",
        "area_right": "float",
        "latency_ms": "float",
    },
)


class BuoyStereo(ModuleBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        shm.red_buoy_stereo_results.set(
            visible_left=False, visible_right=False, latency_ms=0.0
        )

    @device_fn("zed[forward]", "zed[forward2]", depth=2, async_fetch=True)
    def stereo_chain(self, forward, forward2, *, tuners, want_posts):
        stack = jnp.stack([forward, forward2])  # [2, H, W, 3]
        lab = C.bgr_to_lab(stack)
        masks = T.in_range(lab[..., 1], tuners["thresh_min"], tuners["thresh_max"])
        cleaned = M.close_morph(M.open_morph(masks, M.rect_kernel(5)), M.rect_kernel(5))
        labels = ccl.label_fast(masks)  # [2,H,W] -> ONE Pallas dispatch

        def pick(lbl):
            stats = ccl.component_stats(lbl, max_components=8)
            i = jnp.argmax(stats["area"])
            return {
                "area": stats["area"][i],
                "centroid": stats["centroid"][i],
                "found": stats["valid"][i],
            }

        best = jax.vmap(pick)(labels)  # leaves shaped [2, ...]
        posts = (
            {"threshed_left": masks[0], "threshed_right": masks[1],
             "cleaned_left": cleaned[0], "cleaned_right": cleaned[1]}
            if want_posts
            else {}
        )
        return best, posts

    def on_device_result(self, best, posts, meta: DeviceResultMeta):
        values = {"latency_ms": float(meta.latency_ms())}
        for cam, side in enumerate(("left", "right")):
            found = bool(best["found"][cam])
            if found:
                cy, cx = (float(v) for v in best["centroid"][cam])
                ny, nx = self.normalize((cy, cx))
                area = float(best["area"][cam])
            else:
                ny = nx = area = 0.0
            values[f"visible_{side}"] = found
            values[f"center_x_{side}"] = nx
            values[f"center_y_{side}"] = ny
            values[f"area_{side}"] = area
        shm.red_buoy_stereo_results.set(**values)

        for name, img in posts.items():
            self.post(name, img, "GRAY")


if __name__ == "__main__":
    BuoyStereo(["zed"], module_tuners)()
