#!/usr/bin/env python3
"""Color-balance module: posts original and corrected frames side by side.

Parity target: reference modules/color_balance.py:93-140 — a module wrapping
the native color-balance engine (there: ctypes to libauv-color-balance.so's
process_frame; here: the fused JAX pipeline in ops/balance.py running on
TPU) with live tuners for each correction stage."""

from __future__ import annotations

import numpy as np

from ..core.base import ModuleBase
from ..core.tuners import BoolTuner, IntTuner
from ..engine.executor import DevicePipeline, StreamExecutor
from ..ops.balance import BalanceConfig, balance

module_tuners = [
    BoolTuner("equalize_rgb", True),
    BoolTuner("rgb_contrast_correct", False),
    BoolTuner("hsv_contrast_correct", False),
    BoolTuner("hsi_contrast_correct", True),
    BoolTuner("rgb_extrema_clipping", True),
    BoolTuner("adaptive_cast_correction", False),
    IntTuner("horizontal_blocks", 1, 1, 16),
    IntTuner("vertical_blocks", 1, 1, 16),
]


class ColorBalance(ModuleBase):
    """The balance flags choose which stages exist in the graph, so each
    flag combination is its own compiled pipeline (a @device_fn would need
    one static trace); each runs through a depth-1 async StreamExecutor so
    the fetch of frame N overlaps the H2D + compute of frame N+1 — posts
    arrive one frame late, throughput doubles on high-latency links."""

    @classmethod
    def prewarm(cls, shape=(720, 1280, 3), log=None):
        """AOT-compile the default-flag balance pipeline into the shared
        persistent cache (engine/prewarm.py). The module compiles one
        pipeline per flag combination; the default tuner set is the
        combination every deployment starts in, so warming it covers the
        spawned module's first (multi-minute, cold-cache) compile."""
        import time

        import jax

        defaults = {t.name: t.value for t in module_tuners}
        cfg = BalanceConfig(
            equalize_rgb=bool(defaults["equalize_rgb"]),
            rgb_contrast_correct=bool(defaults["rgb_contrast_correct"]),
            hsv_contrast_correct=bool(defaults["hsv_contrast_correct"]),
            hsi_contrast_correct=bool(defaults["hsi_contrast_correct"]),
            rgb_extrema_clipping=bool(defaults["rgb_extrema_clipping"]),
            adaptive_cast_correction=bool(
                defaults["adaptive_cast_correction"]
            ),
            horizontal_blocks=int(defaults["horizontal_blocks"]),
            vertical_blocks=int(defaults["vertical_blocks"]),
        )
        pipe = DevicePipeline(lambda img, c=cfg: balance(img, c))
        t0 = time.perf_counter()
        out = pipe(np.zeros(tuple(shape), np.uint8))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if log:
            log(f"prewarm ColorBalance.balance[default]: {dt:.1f}s")
        return {"ColorBalance.balance[default]": dt}

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._execs = {}
        self._last_exec = None
        self._module_manager.set_staging_depth(2)

    def _exec_for(self, cfg: BalanceConfig) -> StreamExecutor:
        ex = self._execs.get(cfg)
        if ex is None:
            ex = StreamExecutor(
                DevicePipeline(lambda img, c=cfg: balance(img, c)),
                depth=1,
                async_fetch=True,
            )
            self._execs[cfg] = ex
        return ex

    def _post_pair(self, balanced, original) -> None:
        self.post("original", original)
        self.post("balanced", np.asarray(balanced))

    def process(self, direction, img):
        cfg = BalanceConfig(
            equalize_rgb=bool(self.tuners["equalize_rgb"]),
            rgb_contrast_correct=bool(self.tuners["rgb_contrast_correct"]),
            hsv_contrast_correct=bool(self.tuners["hsv_contrast_correct"]),
            hsi_contrast_correct=bool(self.tuners["hsi_contrast_correct"]),
            rgb_extrema_clipping=bool(self.tuners["rgb_extrema_clipping"]),
            adaptive_cast_correction=bool(
                self.tuners["adaptive_cast_correction"]
            ),
            horizontal_blocks=int(self.tuners["horizontal_blocks"]),
            vertical_blocks=int(self.tuners["vertical_blocks"]),
        )
        ex = self._exec_for(cfg)
        if self._last_exec is not None and self._last_exec is not ex:
            for balanced, original in self._last_exec.flush():
                self._post_pair(balanced, original)
        self._last_exec = ex
        # meta carries a copy of the original frame (the bus staging view
        # is recycled) so the original/balanced pair posts together
        for balanced, original in ex.submit((img,), meta=np.array(img)):
            self._post_pair(balanced, original)


if __name__ == "__main__":
    ColorBalance(["forward"], module_tuners)()
