"""The in-repo gate checkpoint: provenance + live detections.

BASELINE config 2 serves ``tests/fixtures/gate_pico_detect.msgpack``
through the real yolo module (bench.py config2_gate_video); these tests
pin that the fixture (a) carries reproducible provenance — the trainer
always embeds ``image_size``, so serving resolves to the trained scale
via the checkpoint-resolution override (models/yolo/predictor.py) — and
(b) actually detects the gate scene's shark/saw objects, so config 2
measures real detections, not noise.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "tests", "fixtures", "gate_pico_detect.msgpack")


@pytest.fixture(scope="module")
def gate_model():
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    return YoloModel(FIXTURE)


def test_sidecar_provenance():
    with open(FIXTURE + ".json") as f:
        meta = json.load(f)
    assert meta["names"] == ["shark", "saw"]
    # image_size present = produced by examples/train_synthetic.py (which
    # always embeds it); absent = hand-rolled, unreproducible fixture
    assert int(meta["image_size"]) >= 64


def test_serves_at_trained_resolution(gate_model):
    with open(FIXTURE + ".json") as f:
        meta = json.load(f)
    assert gate_model.image_size == int(meta["image_size"])
    assert gate_model.task == "detect"
    assert gate_model.class_names == ["shark", "saw"]


def test_detects_gate_scene_objects(gate_model):
    """Both gate classes detected on frames drawn by the same primitive
    the training scenes use (capture_sources/synthetic.gate_frame)."""
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import gate_frame

    seen = set()
    for t in (0.0, 1.3, 2.6):
        frame = gate_frame((720, 1280), t)
        decoded = {
            k: np.asarray(v)
            for k, v in gate_model.device_decode(frame).items()
        }
        for r in gate_model.summarize_decoded(decoded, (720, 1280)):
            if r["confidence"] >= 0.25:
                seen.add(r["name"])
    assert seen == {"shark", "saw"}, f"detected only {seen}"
