#!/usr/bin/env python3
"""Composable debug preprocessor: a tuner-driven stack of image stages.

Parity target: reference modules/preprocessor.py:47-151 — 25+ tuner-driven
stages (grayscale, LAB/HSV/HLS/YCrCb/LUV channel splits, the color-balance
engine, RGB bias, contrast/brightness, blur, noise, erode/dilate, rotate,
resize, translate) applied sequentially. The reference version targets a
pre-refactor API and is broken against its own core (SURVEY.md §2.5); this
rebuild implements the same stage set against the current ModuleBase."""

from __future__ import annotations

import numpy as np

from ..core.base import ModuleBase
from ..core.tuners import BoolTuner, DoubleTuner, IntTuner
from ..ops.balance import process_frame as balance_frame
from ..utils import color as UC
from ..utils import transform as UT

module_tuners = [
    BoolTuner("grayscale", False),
    BoolTuner("balance", False),
    IntTuner("channel_split", 0, 0, 18),  # 0=off; see _CHANNEL_SPLITS
    IntTuner("bias_r", 0, -255, 255),
    IntTuner("bias_g", 0, -255, 255),
    IntTuner("bias_b", 0, -255, 255),
    DoubleTuner("contrast", 1.0, 0.0, 3.0),
    IntTuner("brightness", 0, -255, 255),
    IntTuner("blur_kernel", 0, 0, 31),
    DoubleTuner("noise_stddev", 0.0, 0.0, 50.0),
    IntTuner("erode_kernel", 0, 0, 15),
    IntTuner("dilate_kernel", 0, 0, 15),
    DoubleTuner("rotate_deg", 0.0, -180.0, 180.0),
    DoubleTuner("resize_factor", 1.0, 0.05, 4.0),
    IntTuner("translate_x", 0, -500, 500),
    IntTuner("translate_y", 0, -500, 500),
]

# (name, converter, channel count) for the channel_split tuner
_CHANNEL_SPLITS = [
    ("lab", UC.bgr_to_lab),
    ("hsv", UC.bgr_to_hsv),
    ("hls", UC.bgr_to_hls),
    ("ycrcb", UC.bgr_to_ycrcb),
    ("luv", UC.bgr_to_luv),
    ("gray", UC.bgr_to_gray),
]


class Preprocessor(ModuleBase):
    def process(self, direction, img):
        out = img

        if self.tuners["balance"]:
            out = balance_frame(out)

        split_idx = self.tuners["channel_split"]
        if split_idx > 0:
            conv_idx = (split_idx - 1) // 3
            chan_idx = (split_idx - 1) % 3
            if conv_idx < len(_CHANNEL_SPLITS):
                _, fn = _CHANNEL_SPLITS[conv_idx]
                _, channels = fn(out)
                chan = channels[min(chan_idx, len(channels) - 1)]
                out = np.repeat(chan[..., None], 3, axis=-1)

        if self.tuners["grayscale"] and out.ndim == 3:
            gray, _ = UC.bgr_to_gray(out)
            out = np.repeat(gray[..., None], 3, axis=-1)

        bias = (
            self.tuners["bias_b"],
            self.tuners["bias_g"],
            self.tuners["bias_r"],
        )
        if any(bias) and out.ndim == 3:
            out = np.clip(
                out.astype(np.int16) + np.array(bias, np.int16), 0, 255
            ).astype(np.uint8)

        contrast = self.tuners["contrast"]
        brightness = self.tuners["brightness"]
        if contrast != 1.0 or brightness != 0:
            out = np.clip(
                out.astype(np.float32) * contrast + brightness, 0, 255
            ).astype(np.uint8)

        k = self.tuners["blur_kernel"]
        if k > 0:
            out = UT.simple_gaussian_blur(out, k | 1)

        std = self.tuners["noise_stddev"]
        if std > 0:
            noise = np.random.default_rng().normal(0, std, out.shape)
            out = np.clip(out.astype(np.float32) + noise, 0, 255).astype(np.uint8)

        k = self.tuners["erode_kernel"]
        if k > 0:
            out = UT.erode(out, UT.rect_kernel(k | 1))
        k = self.tuners["dilate_kernel"]
        if k > 0:
            out = UT.dilate(out, UT.rect_kernel(k | 1))

        angle = self.tuners["rotate_deg"]
        if angle != 0.0:
            out = UT.rotate(out, angle)

        factor = self.tuners["resize_factor"]
        if factor != 1.0:
            h, w = out.shape[:2]
            out = UT.resize(out, (max(int(w * factor), 1), max(int(h * factor), 1)))

        tx, ty = self.tuners["translate_x"], self.tuners["translate_y"]
        if tx or ty:
            out = UT.translate(out, tx, ty)

        self.post("preprocessed", out)


if __name__ == "__main__":
    Preprocessor(["forward"], module_tuners)()
