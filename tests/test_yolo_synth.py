"""Synthetic-trained checkpoint: semantic detection + quantization budget.

The random-weight parity tests in test_yolo.py pin that quantized
forwards agree with bf16 numerically; these pin that they agree where it
matters — on weights that actually detect (the in-repo trained fixture,
produced by examples/train_synthetic.py). The reference has no
counterpart: it consumes externally-trained ultralytics weights
(reference modules/yolo.py:44-55) and can't measure a quantization
accuracy budget at all.
"""

import os

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.models.yolo.synth import (
    CLASS_NAMES,
    make_batch,
    match_detections,
    render_scene,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "synth_pico_detect.msgpack"
)


def test_synth_scene_contract():
    rng = np.random.default_rng(3)
    for _ in range(8):
        img, boxes, cls = render_scene(rng, size=96, max_objects=3)
        assert img.shape == (96, 96, 3) and img.dtype == np.uint8
        assert boxes.shape == (3, 4) and cls.shape == (3,)
        real = cls >= 0
        assert real.any()
        for b, c in zip(boxes[real], cls[real]):
            assert 0 <= b[0] < b[2] <= 96 and 0 <= b[1] < b[3] <= 96
            assert c in (0, 1)
            # objects are warm (red-heavy BGR) vs the cool background:
            # the box interior's red channel clearly exceeds the global
            # median
            x0, y0, x1, y1 = b.astype(int)
            inner = img[y0:y1, x0:x1, 2].astype(np.float32)
            assert inner.mean() > np.median(img[..., 2]) + 30


def test_match_detections_greedy():
    gt_boxes = np.array([[10, 10, 30, 30], [50, 50, 80, 80]], np.float32)
    gt_cls = np.array([0, 1], np.int32)
    decoded = {
        "xyxy": np.array(
            [[11, 11, 29, 29], [52, 50, 79, 81], [0, 0, 5, 5]], np.float32
        ),
        "score": np.array([0.9, 0.8, 0.7], np.float32),
        "cls": np.array([0, 1, 0], np.int32),
        "valid": np.array([True, True, True]),
    }
    tp, n_gt, n_pred = match_detections(decoded, gt_boxes, gt_cls)
    assert (tp, n_gt, n_pred) == (2, 2, 3)
    # class-aware: flip a predicted class and its match dissolves
    decoded["cls"] = np.array([1, 1, 0], np.int32)
    tp, _, _ = match_detections(decoded, gt_boxes, gt_cls)
    assert tp == 1


def _fixture_model(**kw):
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    assert os.path.exists(FIXTURE), "run examples/train_synthetic.py"
    return YoloModel(FIXTURE, image_size=128, max_det=8, conf_thresh=0.25, **kw)


def _score(model, n_scenes=24, seed=77):
    rng = np.random.default_rng(seed)
    tp = n_gt = n_pred = 0
    per_scene = []
    for _ in range(n_scenes):
        img, boxes, cls = render_scene(rng, size=128, max_objects=3)
        decoded = {k: np.asarray(v) for k, v in model.device_decode(img).items()}
        t, g, p = match_detections(decoded, boxes, cls)
        tp, n_gt, n_pred = tp + t, n_gt + g, n_pred + p
        per_scene.append(decoded)
    return tp / max(n_gt, 1), tp / max(n_pred, 1), per_scene


@pytest.mark.slow
def test_trained_fixture_detects():
    """The shipped checkpoint is a working detector: both classes found
    with high recall AND precision on fresh scenes (the random-weight
    tests can't assert semantics; this one can)."""
    model = _fixture_model()
    assert model.task == "detect"
    assert tuple(model.class_names) == CLASS_NAMES
    recall, precision, _ = _score(model)
    assert recall >= 0.75, f"recall {recall:.3f}"
    assert precision >= 0.75, f"precision {precision:.3f}"


@pytest.mark.slow
def test_quantization_accuracy_budget():
    """The measured accuracy budget of the two quantized serving modes on
    a real (synthetic-trained) checkpoint: recall/precision within 0.1 of
    the bf16 baseline. This is the evidence the w8a8 default decision
    waits on — on this task the budget is small; flipping the default
    still waits for a mission-trained checkpoint (ROADMAP.md)."""
    base = _fixture_model()
    recall0, precision0, _ = _score(base)
    for mode in ("int8", "w8a8"):
        q = _fixture_model(quantize=mode)
        recall, precision, _ = _score(q)
        assert recall >= recall0 - 0.1, f"{mode}: recall {recall:.3f} vs {recall0:.3f}"
        assert precision >= precision0 - 0.1, (
            f"{mode}: precision {precision:.3f} vs {precision0:.3f}"
        )


SEG_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "synth_pico_segment.msgpack"
)


def _seg_fixture_model(**kw):
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    assert os.path.exists(SEG_FIXTURE), (
        "run examples/train_synthetic.py --task segment"
    )
    return YoloModel(SEG_FIXTURE, image_size=128, max_det=8, conf_thresh=0.25, **kw)


def _seg_score(model, n_scenes=16, seed=77):
    from cuauv_vision_pipeline_tpu.models.yolo.synth import mask_iou

    rng = np.random.default_rng(seed)
    tp = n_gt = n_pred = 0
    mious = []
    for _ in range(n_scenes):
        img, boxes, cls, masks = render_scene(
            rng, size=128, max_objects=3, with_masks=True
        )
        decoded = {k: np.asarray(v) for k, v in model.device_decode(img).items()}
        t, g, p, pairs = match_detections(decoded, boxes, cls, return_pairs=True)
        tp, n_gt, n_pred = tp + t, n_gt + g, n_pred + p
        mious.extend(mask_iou(decoded["mask"][pi], masks[gi]) for pi, gi in pairs)
    miou = float(np.mean(mious)) if mious else 0.0
    return tp / max(n_gt, 1), tp / max(n_pred, 1), miou


@pytest.mark.slow
def test_trained_segment_fixture():
    """The shipped segment checkpoint detects AND masks: boxes match gt
    and the composed prototype masks overlap the exact gt masks (trained
    to 0.857 mask-IoU at export; margins absorb bf16 serving + the small
    eval set)."""
    model = _seg_fixture_model()
    assert model.task == "segment"
    recall, precision, miou = _seg_score(model)
    assert recall >= 0.7, f"recall {recall:.3f}"
    assert precision >= 0.55, f"precision {precision:.3f}"
    assert miou >= 0.7, f"mask IoU {miou:.3f}"


@pytest.mark.slow
def test_segment_quantization_budget():
    """Quantized serving budget for the segment task — box recall AND mask
    IoU within 0.12 / 0.1 of the bf16 baseline on the trained fixture (the
    mask path adds the Proto ConvTranspose, which w8a8 deliberately leaves
    bf16: only nn.Conv is intercepted)."""
    base = _seg_fixture_model()
    recall0, _, miou0 = _seg_score(base)
    for mode in ("int8", "w8a8"):
        q = _seg_fixture_model(quantize=mode)
        recall, _, miou = _seg_score(q)
        assert recall >= recall0 - 0.12, f"{mode}: recall {recall:.3f} vs {recall0:.3f}"
        assert miou >= miou0 - 0.1, f"{mode}: mask IoU {miou:.3f} vs {miou0:.3f}"
