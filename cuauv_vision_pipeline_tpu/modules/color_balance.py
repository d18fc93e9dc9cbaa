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
from ..engine.executor import DevicePipeline
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
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pipelines = {}

    def _pipeline_for(self, cfg: BalanceConfig) -> DevicePipeline:
        # one compiled graph per flag combination (flags are compile-time)
        pipe = self._pipelines.get(cfg)
        if pipe is None:
            pipe = DevicePipeline(lambda img, c=cfg: balance(img, c))
            self._pipelines[cfg] = pipe
        return pipe

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
        balanced = np.asarray(self._pipeline_for(cfg).run_sync(img))
        self.post("original", img)
        self.post("balanced", balanced)


if __name__ == "__main__":
    ColorBalance(["forward"], module_tuners)()
