#!/usr/bin/env python3
"""Gate module: minimal pass-through diagnostics.

Parity target: reference modules/gate.py:13-21 — posts the input per
direction and prints normalize/latency, the smallest real module."""

from ..core.base import ModuleBase


class GateDetector(ModuleBase):
    def process(self, direction, img):
        self.post(direction, img)
        print(self.normalize((10, 10)), self.get_latency())


if __name__ == "__main__":
    GateDetector(["forward"], [])()
