#!/usr/bin/env python3
"""LAB channel visualization (reference modules/lab_test.py)."""

from ..core.base import ModuleBase
from ..utils.color import bgr_to_lab


class LabTest(ModuleBase):
    def process(self, direction, img):
        lab, (l, a, b) = bgr_to_lab(img)
        self.post("l", l, "GRAY")
        self.post("a", a, "GRAY")
        self.post("b", b, "GRAY")


if __name__ == "__main__":
    LabTest(["forward"], [])()
