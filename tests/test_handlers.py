"""Handler-logic tests for the five OBB handlers not covered by the
torpedoes test: slalom's bottom-most pick + left/right split, manipulator's
spoon counting, gate's two-object writes, gate_behind, and bins."""

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core import shm
from cuauv_vision_pipeline_tpu.models.yolo.data import OBBData


class FakeModule:
    def __init__(self, shape=(100, 200)):
        self._shape = shape
        self.posted = None

    def normalize_axis(self, coord, axis):
        return (coord - self._shape[1 - axis] / 2) / self._shape[1]

    def normalize(self, coord):
        return self.normalize_axis(coord[0], 1), self.normalize_axis(coord[1], 0)

    def post(self, name, img, color_space="BGR"):
        self.posted = (name, img.shape)

    class _Tuners(dict):
        def __getitem__(self, k):
            return 0.05

    tuners = _Tuners()

    def get_latency(self):
        return 0


def _obb(name, cx, cy, conf=0.9, half=10):
    return OBBData(
        name, 0, conf,
        cx - half, cy - half, cx + half, cy - half,
        cx + half, cy + half, cx - half, cy + half,
    )


def _registered(handler_cls, name):
    handler = handler_cls(name)
    module = FakeModule()
    handler.register(module)
    return handler, module


def test_slalom_bottom_most_and_left_right_split():
    from cuauv_vision_pipeline_tpu.handlers.slalom import SlalomOBB

    handler, module = _registered(SlalomOBB, "slalom")
    img = np.zeros((100, 200, 3), np.uint8)
    reds = [_obb("pole_red", 100, 30), _obb("pole_red", 120, 80)]  # lower wins
    whites = [
        _obb("pole_white", 40, 50),    # left of red_x=120
        _obb("pole_white", 60, 70),    # left, lower -> picked for left
        _obb("pole_white", 170, 60),   # right
    ]
    handler.process("forward", img, reds, whites)

    g = shm.yolo_slalom
    assert g.slalom_red_visible.get() == 1
    # bottom-most red is (120, 80): normalized center x = (120-100)/200
    assert g.slalom_red_center_x.get() == pytest.approx(0.1)
    assert g.slalom_left_visible.get() == 1
    # bottom-most left white is (60, 70)
    assert g.slalom_left_center_x.get() == pytest.approx((60 - 100) / 200)
    assert g.slalom_right_visible.get() == 1
    assert g.slalom_right_center_x.get() == pytest.approx((170 - 100) / 200)
    assert module.posted[0] == "slalom handler"

    # no red -> both sides cleared regardless of whites
    handler.process("forward", img, [], whites)
    assert g.slalom_red_visible.get() == 0
    assert g.slalom_left_visible.get() == 0
    assert g.slalom_right_visible.get() == 0


def test_manipulator_counts_spoons_above_threshold():
    from cuauv_vision_pipeline_tpu.handlers.manipulator import ManipulatorOBB

    handler, module = _registered(ManipulatorOBB, "manipulator")
    img = np.zeros((100, 200, 3), np.uint8)
    spoons = [
        _obb("spoon", 50, 50, conf=0.9),
        _obb("spoon", 80, 50, conf=0.6),
        _obb("spoon", 110, 50, conf=0.01),  # below 0.05 threshold
    ]
    cups = [_obb("cup", 150, 40, conf=0.8)]
    handler.process("forward", img, spoons, cups, [], [])

    g = shm.yolo_manipulator
    assert g.num_spoons_detected.get() == 2
    assert g.spoon_visible.get() == 1
    assert g.cup_visible.get() == 1
    assert g.pink_basket_visible.get() == 0
    assert module.posted[0] == "manipulator handler"


def test_gate_writes_shark_and_saw():
    from cuauv_vision_pipeline_tpu.handlers.gate import GateOBB

    handler, module = _registered(GateOBB, "gate")
    img = np.zeros((100, 200, 3), np.uint8)
    handler.process(
        "forward", img,
        [_obb("shark", 60, 40, conf=0.7)],
        [_obb("saw", 140, 60, conf=0.8)],
    )
    g = shm.yolo_gate
    assert g.shark_visible.get() == 1
    assert g.shark_confidence.get() == pytest.approx(0.7)
    assert g.saw_visible.get() == 1
    assert g.saw_center_x.get() == pytest.approx((140 - 100) / 200)
    # highest-confidence wins when several compete
    handler.process(
        "forward", img,
        [_obb("shark", 30, 30, conf=0.3), _obb("shark", 90, 90, conf=0.95)],
        [],
    )
    assert g.shark_center_x.get() == pytest.approx((90 - 100) / 200)
    assert g.saw_visible.get() == 0


def test_gate_behind_single_object():
    from cuauv_vision_pipeline_tpu.handlers.gate_behind import GateBehindOBB

    handler, module = _registered(GateBehindOBB, "gate_behind")
    img = np.zeros((100, 200, 3), np.uint8)
    handler.process("forward", img, [_obb("gate_behind", 100, 50, conf=0.9)])
    g = shm.yolo_gate_behind
    assert g.gate_behind_visible.get() == 1
    assert g.gate_behind_area.get() > 0
    handler.process("forward", img, [])
    assert g.gate_behind_visible.get() == 0


def test_bins_three_classes():
    from cuauv_vision_pipeline_tpu.handlers.bins import BinsOBB

    handler, module = _registered(BinsOBB, "bins")
    img = np.zeros((100, 200, 3), np.uint8)
    handler.process(
        "forward", img,
        [_obb("bin_shark", 50, 30)],
        [_obb("bin_saw", 100, 60)],
        [_obb("bin", 160, 80)],
    )
    g = shm.yolo_bins
    assert g.bin_shark_visible.get() == 1
    assert g.bin_saw_visible.get() == 1
    assert g.bin_visible.get() == 1
    assert module.posted[0] == "bins handler"
