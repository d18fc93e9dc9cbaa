"""YOLO stack tests: model shapes, decode/NMS, data parsing, handlers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN, OBBData
from cuauv_vision_pipeline_tpu.models.yolo.decode import (
    decode,
    nms_fixed,
    obb_corners,
    summarize,
)
from cuauv_vision_pipeline_tpu.models.yolo.model import create_model, preprocess
from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
from cuauv_vision_pipeline_tpu.models.yolo.utils import order_points


@pytest.mark.slow
def test_model_output_shapes():
    model, variables = create_model(num_classes=5, size="n", task="obb",
                                    image_size=160)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    out = model.apply(variables, x)
    assert len(out["box"]) == 3 and len(out["cls"]) == 3
    assert out["box"][0].shape == (1, 20, 20, 64)  # stride 8, 4*reg_max
    assert out["cls"][0].shape == (1, 20, 20, 5)
    assert out["angle"][0].shape == (1, 20, 20, 1)
    assert out["box"][2].shape == (1, 5, 5, 64)  # stride 32


@pytest.mark.slow
def test_decode_fixed_shapes():
    model, variables = create_model(num_classes=3, size="n", task="detect",
                                    image_size=160)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    out = model.apply(variables, x)
    decoded = decode(out, 160, max_det=8)
    assert decoded["xyxy"].shape == (8, 4)
    assert decoded["score"].shape == (8,)
    assert decoded["valid"].shape == (8,)


def test_pose_kpts_decode_geometry():
    """decode()'s pose branch: a zero keypoint prediction lands on its
    anchor's grid corner (centers - stride/2) with sigmoid(0) = 0.5
    visibility — ultralytics' kpts_decode mapping (reference consumes it
    via model.track, reference modules/yolo.py:57-58 task='pose').
    Regression: the branch read ``strides``/``centers`` from
    decode_boxes' scope and raised NameError on any pose decode."""
    reg_max = 4
    nk = 2
    outputs = {"box": [], "cls": [], "kpts": []}
    for H in (4, 2, 1):  # image_size=32 at strides (8, 16, 32)
        outputs["box"].append(jnp.zeros((1, H, H, 4 * reg_max)))
        outputs["cls"].append(jnp.full((1, H, H, 1), -10.0))
        outputs["kpts"].append(jnp.zeros((1, H, H, 3 * nk)))
    # one confident anchor: stride-8 scale, grid cell (y=1, x=2)
    outputs["cls"][0] = outputs["cls"][0].at[0, 1, 2, 0].set(5.0)

    decoded = decode(outputs, 32, reg_max=reg_max, conf_thresh=0.25, max_det=4)
    assert decoded["kpts"].shape == (4, nk, 3)
    top = int(np.argmax(np.asarray(decoded["score"])))
    assert bool(np.asarray(decoded["valid"])[top])
    kp = np.asarray(decoded["kpts"])[top]
    # kx = pred*2*stride + (cx - stride/2) = (2+0.5)*8 - 4 = 16; ky = 8
    np.testing.assert_allclose(kp[:, 0], 16.0, atol=1e-4)
    np.testing.assert_allclose(kp[:, 1], 8.0, atol=1e-4)
    np.testing.assert_allclose(kp[:, 2], 0.5, atol=1e-4)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],  # overlaps box 0
            [50, 50, 60, 60],
        ],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 0], jnp.int32)
    picked, valid = nms_fixed(boxes, scores, classes, iou_thresh=0.5, max_det=3)
    picked = np.asarray(picked)
    valid = np.asarray(valid)
    assert valid.tolist() == [True, True, False]
    assert set(picked[valid].tolist()) == {0, 2}


def test_nms_class_aware_keeps_other_class():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1], jnp.int32)
    _, valid = nms_fixed(boxes, scores, classes, iou_thresh=0.5, max_det=2)
    assert np.asarray(valid).all()


def test_obb_corners_axis_aligned_at_zero_angle():
    xyxy = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    corners = np.asarray(obb_corners(xyxy, jnp.asarray([0.0])))
    assert corners.shape == (1, 4, 2)
    np.testing.assert_allclose(
        sorted(map(tuple, corners[0])), [(10, 20), (10, 60), (30, 20), (30, 60)]
    )


def test_map_fn_parsers():
    obb = MAP_FN["obb"](
        {
            "name": "torpedo_board",
            "class": 0,
            "confidence": 0.88,
            "box": {
                "x1": 1, "y1": 2, "x2": 3, "y2": 4,
                "x3": 5, "y3": 6, "x4": 7, "y4": 8,
            },
        }
    )
    assert isinstance(obb, OBBData)
    assert obb.corners == [(1, 2), (3, 4), (5, 6), (7, 8)]
    assert obb.confidence == pytest.approx(0.88)

    det = MAP_FN["detect"](
        {"name": "x", "class": 1, "confidence": 0.5,
         "box": {"x1": 0, "y1": 0, "x2": 10, "y2": 20}}
    )
    assert det.area == 200
    pose = MAP_FN["pose"](
        {"name": "p", "class": 2, "confidence": 0.6,
         "box": {"x1": 0, "y1": 0, "x2": 1, "y2": 1},
         "keypoints": {"x": [1, 2], "y": [3, 4], "visible": [1, 0.5]}}
    )
    assert pose.keypoints == [(1, 3, 1), (2, 4, 0.5)]


def test_order_points():
    pts = [(10, 10), (50, 12), (48, 40), (8, 42)]
    tl, tr, bl, br = order_points(pts)
    assert tl == (10, 10)
    assert tr == (50, 12)
    assert bl == (8, 42)
    assert br == (48, 40)


@pytest.mark.slow
def test_predictor_end_to_end_random_weights():
    model = YoloModel(None, task="obb", image_size=160, max_det=8,
                      conf_thresh=0.0)
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    results = model.track(img)[0].summary()
    # random weights: just verify the contract
    for r in results:
        assert set(r["box"].keys()) == {
            "x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4"
        }
        assert "track_id" in r


@pytest.mark.slow
def test_device_decode_batch_matches_single():
    """device_decode_batch ([K,H,W,3] -> ONE K-batch conv stack, the
    CUAUV_YOLO_BATCH dispatch shape) produces the same decode per lane as
    K separate device_decode calls (f32 path; bf16 batched convs may
    reassociate, the module ships f32-exactness here)."""
    m = YoloModel(None, task="detect", image_size=64, max_det=4,
                  conf_thresh=0.0, half_precision=False)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (3, 48, 64, 3), np.uint8)

    batched = {k: np.asarray(v) for k, v in m.device_decode_batch(frames).items()}
    for lane in range(3):
        single = {k: np.asarray(v) for k, v in m.device_decode(frames[lane]).items()}
        for k, v in single.items():
            assert batched[k].shape[1:] == v.shape, (k, batched[k].shape, v.shape)
            np.testing.assert_allclose(
                batched[k][lane], v, rtol=1e-5, atol=1e-5, err_msg=k
            )


def test_pose_predictor_end_to_end_random_weights():
    """The full pose serving path — forward, decode (kpts branch),
    summarize (keypoints dict), MAP_FN['pose'] parse — produces
    well-formed keypoints (the reference consumes this shape via
    result.summary(), reference modules/yolo.py:57-58,116-123)."""
    from cuauv_vision_pipeline_tpu.models.yolo.data import PoseData

    m = YoloModel(None, task="pose", image_size=64, max_det=4,
                  conf_thresh=0.0, half_precision=False)
    img = np.random.default_rng(2).integers(0, 255, (48, 64, 3), np.uint8)
    decoded = {k: np.asarray(v) for k, v in m.device_decode(img).items()}
    assert decoded["kpts"].shape == (4, 17, 3)
    assert np.isfinite(decoded["kpts"]).all()

    entries = summarize(decoded, m.class_names, task="pose")
    assert entries, "conf_thresh=0 must yield at least one detection"
    kp = entries[0]["keypoints"]
    assert len(kp["x"]) == len(kp["y"]) == len(kp["visible"]) == 17
    assert all(0.0 <= v <= 1.0 for v in kp["visible"])

    parsed = MAP_FN["pose"](entries[0])
    assert isinstance(parsed, PoseData)
    assert len(parsed.keypoints) == 17


def test_torpedoes_handler_writes_shm():
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.handlers.torpedoes import TorpedoesOBB

    class FakeModule:
        def __init__(self):
            self._shape = (100, 200)

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

    handler = TorpedoesOBB("torpedoes")
    module = FakeModule()
    handler.register(module)

    board = OBBData("torpedo_board", 0, 0.9, 50, 20, 150, 20, 150, 80, 50, 80)
    img = np.zeros((100, 200, 3), np.uint8)
    handler.process("forward", img, [board], [], [])

    group = shm.yolo_torpedoes_board
    assert group.board_visible.get() == 1
    assert group.board_confidence.get() == pytest.approx(0.9)
    # board center: (100, 50) pixels -> normalized ((50-50)/200, (100-100)/200)
    assert group.board_center_x.get() == pytest.approx(0.0)
    assert group.board_center_y.get() == pytest.approx(0.0)
    assert group.board_area.get() > 0
    assert module.posted[0] == "torpedoes handler"

    # below-threshold board disappears
    weak = OBBData("torpedo_board", 0, 0.01, 0, 0, 1, 0, 1, 1, 0, 1)
    handler.process("forward", img, [weak], [], [])
    assert group.board_visible.get() == 0

# ── ByteTrack-equivalent tracker ─────────────────────────────────────────


def _det(x1, y1, x2, y2, conf=0.9, cls=0):
    return {
        "class": cls,
        "confidence": conf,
        "box": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
    }


def test_tracker_stable_id_moving_target():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker()
    ids = []
    for step in range(10):
        d = _det(10 + 3 * step, 20, 60 + 3 * step, 70)
        tr.update([d])
        ids.append(d["track_id"])
    assert ids[0] is not None
    assert all(i == ids[0] for i in ids)


def test_tracker_low_score_keeps_id():
    """The 'byte' property: a low-confidence frame mid-sequence doesn't
    break the track — the second association round picks it up."""
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker(track_thresh=0.5)
    d0 = _det(10, 10, 50, 50, conf=0.9)
    tr.update([d0])
    tid = d0["track_id"]
    assert tid is not None

    d_low = _det(12, 11, 52, 51, conf=0.2)  # occluded/blurred frame
    tr.update([d_low])
    assert d_low["track_id"] == tid

    d2 = _det(14, 12, 54, 52, conf=0.9)
    tr.update([d2])
    assert d2["track_id"] == tid


def test_tracker_low_score_never_starts_track():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker(track_thresh=0.5)
    d = _det(10, 10, 50, 50, conf=0.3)
    tr.update([d])
    assert d["track_id"] is None
    assert tr.tracks == []


def test_tracker_survives_occlusion_gap():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker(track_buffer=30)
    d0 = _det(100, 100, 160, 180, conf=0.9)
    tr.update([d0])
    tid = d0["track_id"]
    for _ in range(5):  # fully occluded: no detections at all
        tr.update([])
    d1 = _det(104, 102, 164, 182, conf=0.9)
    tr.update([d1])
    assert d1["track_id"] == tid


def test_tracker_new_target_new_id_and_class_gate():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker()
    a = _det(10, 10, 50, 50, cls=0)
    tr.update([a])
    # same place, different class: must NOT inherit the id
    b = _det(10, 10, 50, 50, cls=1)
    far = _det(200, 200, 250, 250, cls=0)
    tr.update([b, far])
    assert b["track_id"] not in (None, a["track_id"])
    assert far["track_id"] not in (None, a["track_id"], b["track_id"])


def test_tracker_two_targets_no_id_swap():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker()
    left = _det(0, 0, 40, 40)
    right = _det(100, 0, 140, 40)
    tr.update([left, right])
    lid, rid = left["track_id"], right["track_id"]
    assert lid != rid
    for step in range(1, 8):  # approach each other but never cross
        l2 = _det(0 + 4 * step, 0, 40 + 4 * step, 40)
        r2 = _det(100 - 4 * step, 0, 140 - 4 * step, 40)
        tr.update([r2, l2])  # order shuffled on purpose
        assert l2["track_id"] == lid
        assert r2["track_id"] == rid


def test_tracker_obb_corner_boxes():
    from cuauv_vision_pipeline_tpu.models.yolo.tracker import ByteTracker

    tr = ByteTracker()
    d = {
        "class": 0,
        "confidence": 0.9,
        "box": {"x1": 10, "y1": 10, "x2": 50, "y2": 12,
                "x3": 48, "y3": 52, "x4": 8, "y4": 50},
    }
    tr.update([d])
    assert d["track_id"] is not None


# ── ultralytics .pt weight mapping ───────────────────────────────────────


@pytest.mark.slow
@pytest.mark.parametrize("task", ["obb", "detect"])
def test_ultralytics_mapping_round_trip(task):
    """export (flax -> v8 tensor names) then import into a DIFFERENTLY
    seeded tree must reproduce the original tree exactly — validates the
    name table in both directions with zero fallbacks."""
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        map_ultralytics_state,
    )

    model, variables = create_model(6, size="n", task=task, image_size=64)
    state = export_ultralytics_state(variables, task)
    _, fresh = create_model(6, size="n", task=task, image_size=64, seed=1)
    restored, report = map_ultralytics_state(state, fresh, task)
    assert report["missing"] == 0 and report["mismatched"] == 0
    assert report["mapped"] == len(state)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ultralytics_export_key_names():
    """The exported names must be the REAL ultralytics v8 state-dict keys
    (spot-checked against the published yolov8n-obb layout)."""
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
    )

    _, variables = create_model(6, size="n", task="obb", image_size=64)
    state = export_ultralytics_state(variables, "obb")
    for key in [
        "model.0.conv.weight",            # stem
        "model.0.bn.running_mean",
        "model.2.cv1.conv.weight",        # first C2f
        "model.4.m.1.cv2.conv.weight",    # 2nd bottleneck of C2f(n=2)
        "model.9.cv2.bn.weight",          # SPPF
        "model.12.cv1.conv.weight",       # neck C2f
        "model.16.conv.weight",           # neck downsample
        "model.22.cv2.0.2.bias",          # box head 1x1
        "model.22.cv3.2.1.conv.weight",   # cls head 2nd conv, P5
        "model.22.cv4.1.0.conv.weight",   # OBB angle branch
    ]:
        assert key in state, key


@pytest.mark.slow
def test_load_pt_checkpoint_via_torch(tmp_path):
    """A .pt file written by torch.save with ultralytics-style contents
    loads through load_checkpoint and preserves tensors + metadata."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        load_checkpoint,
    )

    _, variables = create_model(3, size="n", task="obb", image_size=64)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_ultralytics_state(variables, "obb").items()}

    path = tmp_path / "obb_test.pt"
    torch.save(
        {"model": state, "task": "obb",
         "names": {0: "buoy", 1: "gate", 2: "bin"}},
        path,
    )

    model, loaded, meta = load_checkpoint(str(path))
    assert meta["task"] == "obb"
    assert meta["names"] == ["buoy", "gate", "bin"]
    assert model.num_classes == 3
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_corrupted_checkpoint_error_names_path(tmp_path):
    """A truncated/garbage weight file must fail with an error that NAMES
    the offending path — the operator's first question is always 'which
    file?'. Covers both the torch .pt path and the flax msgpack path."""
    from cuauv_vision_pipeline_tpu.models.yolo.weights import load_checkpoint

    bad_pt = tmp_path / "corrupt_obb.pt"
    bad_pt.write_bytes(b"\x00not a zipfile, not a pickle\xff" * 8)
    with pytest.raises(RuntimeError, match="corrupt_obb.pt"):
        load_checkpoint(str(bad_pt))

    bad_msgpack = tmp_path / "corrupt_flax.ckpt"
    bad_msgpack.write_bytes(b"\xc1garbage that is not msgpack" * 4)
    with pytest.raises(RuntimeError, match="corrupt_flax.ckpt"):
        load_checkpoint(str(bad_msgpack))


@pytest.mark.slow
def test_pt_task_from_train_args_and_structure(tmp_path):
    """Real ultralytics exports keep task in ckpt['train_args'], not the
    top level; and with no declaration anywhere the head's cv4 branch
    identifies the task (1 channel = obb, 3*nk = pose, absent = detect).
    Regression: an obb .pt without a top-level 'task' key silently
    imported as detect, dropping the angle branch with no warning."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        load_checkpoint,
    )

    _, variables = create_model(2, size="n", task="obb", image_size=64)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_ultralytics_state(variables, "obb").items()}
    names = {0: "a", 1: "b"}

    p1 = tmp_path / "train_args.pt"
    torch.save({"model": state, "train_args": {"task": "obb"}, "names": names}, p1)
    model, _, meta = load_checkpoint(str(p1))
    assert meta["task"] == "obb" and model.task == "obb"

    p2 = tmp_path / "bare.pt"
    torch.save({"model": state, "names": names}, p2)
    model, _, meta = load_checkpoint(str(p2))
    assert meta["task"] == "obb" and model.task == "obb"

    _, dvars = create_model(2, size="n", task="detect", image_size=64)
    dstate = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_ultralytics_state(dvars, "detect").items()}
    p3 = tmp_path / "bare_detect.pt"
    torch.save({"model": dstate, "names": names}, p3)
    model, _, meta = load_checkpoint(str(p3))
    assert meta["task"] == "detect"


@pytest.mark.slow
def test_pt_pose_custom_keypoint_count(tmp_path):
    """A pose .pt with a non-COCO kpt count (nk=4) must infer nk from the
    cv4 branch width and map every tensor — hardcoding 17 shape-mismatched
    the whole keypoint head into random init."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        load_checkpoint,
    )

    _, variables = create_model(
        2, size="n", task="pose", image_size=64, num_keypoints=4
    )
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_ultralytics_state(variables, "pose").items()}
    path = tmp_path / "pose4.pt"
    torch.save({"model": state, "names": {0: "a", 1: "b"}}, path)

    model, loaded, meta = load_checkpoint(str(path))
    assert meta["task"] == "pose"
    assert model.num_keypoints == 4
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_empty_checkpoint_names_fall_back(tmp_path):
    """A checkpoint whose meta stores names=[] (what a .pt without
    embedded names produces) must not override the caller's class_names —
    str(cls_id) names would match no handler bucket."""
    from cuauv_vision_pipeline_tpu.models.yolo.weights import save_checkpoint

    model, variables = create_model(2, size="p", task="detect", image_size=64)
    path = str(tmp_path / "m.msgpack")
    save_checkpoint(
        path, model, jax.tree.map(np.asarray, variables), {"names": []}
    )
    m = YoloModel(path, class_names=["shark", "saw"], image_size=64)
    assert m.class_names == ["shark", "saw"]


def test_summarize_clips_detect_boxes_not_obb_corners():
    """clip_wh clamps detect boxes and pose keypoints to the frame
    (ultralytics scale_boxes/scale_coords parity); rotated OBB corners
    stay unclipped (ultralytics OBB keeps them)."""
    decoded = {
        "xyxy": np.array([[-10.0, -5.0, 700.0, 500.0]], np.float32),
        "score": np.array([0.9], np.float32),
        "cls": np.array([0], np.int32),
        "valid": np.array([True]),
    }
    out = summarize(decoded, ["x"], task="detect", clip_wh=(640.0, 480.0))
    b = out[0]["box"]
    assert (b["x1"], b["y1"], b["x2"], b["y2"]) == (0.0, 0.0, 640.0, 480.0)

    decoded["angle"] = np.array([0.0], np.float32)
    out = summarize(decoded, ["x"], task="obb", clip_wh=(640.0, 480.0))
    b = out[0]["box"]
    assert b["x1"] == -10.0 and b["y3"] == 500.0  # corners untouched

    decoded_pose = dict(decoded)
    del decoded_pose["angle"]
    decoded_pose["kpts"] = np.array(
        [[[-3.0, 490.0, 0.7], [650.0, 10.0, 0.2]]], np.float32
    )
    out = summarize(decoded_pose, ["x"], task="pose", clip_wh=(640.0, 480.0))
    kp = out[0]["keypoints"]
    assert kp["x"] == [0.0, 640.0] and kp["y"] == [480.0, 10.0]


# ── round-2 fixes: dist2rbox, probiou NMS, letterbox ─────────────────────


@pytest.mark.slow
def test_obb_decode_matches_dist2rbox_reference():
    """decode_boxes for obb must agree numerically with an independent
    numpy implementation of ultralytics' dist2rbox on random logits
    (anchor + R(angle) @ (rb-lt)/2 center; w,h = lt+rb)."""
    from cuauv_vision_pipeline_tpu.models.yolo.decode import (
        _flatten_scales,
        decode_boxes,
    )

    rng = np.random.default_rng(7)
    reg_max = 16
    image_size = 64  # strides 8/16/32 -> 8x8 + 4x4 + 2x2 = 84 anchors
    outputs = {"box": [], "cls": [], "angle": []}
    for s in (8, 16, 32):
        hw = image_size // s
        outputs["box"].append(
            jnp.asarray(rng.normal(size=(1, hw, hw, 4 * reg_max)), jnp.float32)
        )
        outputs["cls"].append(
            jnp.asarray(rng.normal(size=(1, hw, hw, 3)), jnp.float32)
        )
        outputs["angle"].append(
            jnp.asarray(rng.normal(size=(1, hw, hw, 1)), jnp.float32)
        )
    flat = jax.tree.map(np.asarray, _flatten_scales(outputs, image_size))
    xyxy, angle = decode_boxes(
        {k: jnp.asarray(v) for k, v in flat.items()}, reg_max
    )
    xyxy, angle = np.asarray(xyxy), np.asarray(angle)

    # independent numpy reference
    logits = flat["box"][0].reshape(-1, 4, reg_max).astype(np.float64)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    d = (probs * np.arange(reg_max)).sum(-1) * flat["strides"][:, None]
    ref_angle = (
        1 / (1 + np.exp(-flat["angle"][0, :, 0].astype(np.float64))) - 0.25
    ) * np.pi
    lt, rb = d[:, :2], d[:, 2:]
    off = (rb - lt) / 2
    cos, sin = np.cos(ref_angle), np.sin(ref_angle)
    cx = flat["centers"][:, 0] + off[:, 0] * cos - off[:, 1] * sin
    cy = flat["centers"][:, 1] + off[:, 0] * sin + off[:, 1] * cos
    w, h = lt[:, 0] + rb[:, 0], lt[:, 1] + rb[:, 1]

    np.testing.assert_allclose(angle, ref_angle, atol=1e-5)
    np.testing.assert_allclose((xyxy[:, 0] + xyxy[:, 2]) / 2, cx, atol=1e-3)
    np.testing.assert_allclose((xyxy[:, 1] + xyxy[:, 3]) / 2, cy, atol=1e-3)
    np.testing.assert_allclose(xyxy[:, 2] - xyxy[:, 0], w, atol=1e-3)
    np.testing.assert_allclose(xyxy[:, 3] - xyxy[:, 1], h, atol=1e-3)


def test_obb_nms_keeps_adjacent_rotated_poles():
    """Two elongated boxes at 45 deg, side by side: their AABBs overlap
    heavily (axis-aligned NMS would merge them) but the rotated boxes
    barely touch — probiou NMS must keep both."""
    # two 100x10 boxes at 45deg, centers 20px apart perpendicular to the
    # long axis: rotated boxes have a 10px gap; the AABBs overlap at
    # IoU ~0.50
    w, h = 100.0, 10.0
    c1 = (100.0, 100.0)
    c2 = (100.0 + 20.0 / np.sqrt(2), 100.0 - 20.0 / np.sqrt(2))
    boxes = jnp.asarray(
        [
            [c1[0] - w / 2, c1[1] - h / 2, c1[0] + w / 2, c1[1] + h / 2],
            [c2[0] - w / 2, c2[1] - h / 2, c2[0] + w / 2, c2[1] + h / 2],
        ],
        jnp.float32,
    )
    angles = jnp.asarray([np.pi / 4, np.pi / 4], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 0], jnp.int32)

    # axis-aligned NMS on the AABBs of the rotated boxes WOULD suppress:
    from cuauv_vision_pipeline_tpu.models.yolo.decode import obb_corners

    corners = np.asarray(obb_corners(boxes, angles))
    aabbs = jnp.asarray(
        np.concatenate(
            [corners.min(axis=1), corners.max(axis=1)], axis=-1
        ),
        jnp.float32,
    )
    _, valid_aabb = nms_fixed(aabbs, scores, classes, iou_thresh=0.45, max_det=2)
    assert np.asarray(valid_aabb).tolist() == [True, False]

    # rotated probiou NMS keeps both
    _, valid_rot = nms_fixed(
        boxes, scores, classes, iou_thresh=0.45, max_det=2, angles=angles
    )
    assert np.asarray(valid_rot).tolist() == [True, True]


def test_probiou_identity_and_disjoint():
    from cuauv_vision_pipeline_tpu.models.yolo.decode import _probiou

    b = jnp.asarray([50.0, 50.0, 40.0, 10.0, 0.6])
    others = jnp.asarray(
        [
            [50.0, 50.0, 40.0, 10.0, 0.6],   # identical
            [500.0, 500.0, 40.0, 10.0, 0.6], # far away
        ]
    )
    iou = np.asarray(_probiou(b, others))
    assert iou[0] > 0.95
    assert iou[1] < 0.05


def test_preprocess_letterboxes_and_summarize_inverts():
    """A 16:9 frame must be aspect-preserved with 114-gray pads, and
    summarize's (v - pad) * scale must map model coords back to frame
    pixels."""
    from cuauv_vision_pipeline_tpu.models.yolo.model import letterbox_params

    h, w, S = 720, 1280, 640
    img = np.full((h, w, 3), 200, np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img)[None], S))[0]
    assert out.shape == (S, S, 3)
    scale, left, top, nh, nw = letterbox_params(h, w, S)
    assert (nh, nw) == (360, 640) and left == 0 and top == 140
    # pad rows are the 114 gray, content rows are the image
    np.testing.assert_allclose(out[0], 114 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[-1], 114 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[S // 2], 200 / 255.0, atol=1e-2)

    # summarize inverse: a detection spanning the content area maps to the
    # full original frame
    decoded = {
        "valid": np.array([True]),
        "xyxy": np.array([[left, top, left + nw, top + nh]], np.float32),
        "score": np.array([0.9], np.float32),
        "cls": np.array([0], np.int32),
    }
    [entry] = summarize(
        decoded, ["thing"], (1 / scale, 1 / scale), "detect", pad=(left, top)
    )
    assert entry["box"]["x1"] == pytest.approx(0.0, abs=1e-3)
    assert entry["box"]["y1"] == pytest.approx(0.0, abs=1e-3)
    assert entry["box"]["x2"] == pytest.approx(w, abs=1e-3)
    assert entry["box"]["y2"] == pytest.approx(h, abs=1e-3)


@pytest.mark.slow
def test_load_pt_ultralytics_fixture_with_dfl_and_strictness(tmp_path):
    """An ultralytics-faithful fixture (incl. the frozen DFL conv buffer
    real checkpoints carry, reference modules/yolo.py:17,44-58) imports
    totally — and a fixture with a missing tensor warns loudly, naming the
    file."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        load_checkpoint,
    )

    _, variables = create_model(3, size="n", task="obb", image_size=64)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_ultralytics_state(variables, "obb").items()}
    # real ultralytics checkpoints include the frozen DFL projection conv
    state["model.22.dfl.conv.weight"] = torch.arange(
        16, dtype=torch.float32
    ).reshape(1, 16, 1, 1)

    path = tmp_path / "obb_dfl.pt"
    torch.save({"model": state, "task": "obb",
                "names": {0: "a", 1: "b", 2: "c"}}, path)
    model, loaded, meta = load_checkpoint(str(path))
    # total import: every expected tensor restored bit-exactly
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # strictness: drop one tensor -> loud warning naming the file
    # (not the stem — that one is the v8-layout sentinel and raises)
    del state["model.2.cv1.conv.weight"]
    bad = tmp_path / "obb_partial.pt"
    torch.save({"model": state, "task": "obb",
                "names": {0: "a", 1: "b", 2: "c"}}, bad)
    with pytest.warns(RuntimeWarning, match="obb_partial.pt"):
        load_checkpoint(str(bad))


@pytest.mark.slow
def test_int8_weight_only_quantization_parity():
    """Weight-only int8 (predictor.quantize_weights_int8): dequantized
    kernels stay within half a quantization step of the originals, and the
    quantized forward's detections match the bf16 forward's on the same
    image (same valid set, boxes within a few pixels)."""
    import jax
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import (
        quantize_weights_int8,
    )

    base = YoloModel(None, task="obb", image_size=160, max_det=8,
                     conf_thresh=0.0)
    qvars, scales = quantize_weights_int8(base.variables)

    # per-leaf quantization error bound: |w - q*s| <= s/2
    flat_q = jax.tree.leaves(qvars)
    flat_s = jax.tree.leaves(scales)
    flat_w = jax.tree.leaves(base.variables)
    checked = 0
    for q, s, w in zip(flat_q, flat_s, flat_w):
        if np.asarray(q).dtype == np.int8:
            err = np.abs(np.asarray(q, np.float32) * s - np.asarray(w))
            assert (err <= s / 2 + 1e-7).all()
            checked += 1
    assert checked > 10  # the conv stack actually got quantized

    quant = YoloModel(None, task="obb", image_size=160, max_det=8,
                      conf_thresh=0.0, quantize="int8")
    # the quantized store must be device-resident: numpy leaves here mean
    # every device_decode call re-uploads the whole weight tree (regression
    # guard for a measured 124 ms/frame tunnel pathology)
    assert all(
        isinstance(leaf, jax.Array)
        for leaf in jax.tree.leaves(quant._infer_vars)
    )
    quant.variables = base.variables
    quant._infer_vars = jax.tree.map(
        jax.device_put, quantize_weights_int8(base.variables)
    )

    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    ref = {k: np.asarray(v) for k, v in base.device_decode(img).items()}
    out = {k: np.asarray(v) for k, v in quant.device_decode(img).items()}
    # top-score detection agrees to within a few pixels
    ri = int(np.argmax(np.where(ref["valid"], ref["score"], -1)))
    qi = int(np.argmax(np.where(out["valid"], out["score"], -1)))
    assert ref["valid"][ri] and out["valid"][qi]
    assert np.abs(ref["xyxy"][ri] - out["xyxy"][qi]).max() < 8.0
    assert abs(float(ref["score"][ri]) - float(out["score"][qi])) < 0.15
    assert int(ref["cls"][ri]) == int(out["cls"][qi])


def test_fused_letterbox_preamble_matches_preprocess():
    """preprocess_fused (MXU matmul-form letterbox, models/yolo/model.py)
    matches the gather-based preprocess at the u8 level: identical except
    for at most one u8 step on rare pixels whose resize sum lands exactly
    on a .5 rounding boundary (reassociated float accumulation)."""
    import jax

    from cuauv_vision_pipeline_tpu.models.yolo.model import (
        preprocess,
        preprocess_fused,
    )

    rng = np.random.default_rng(0)
    for shape in [(720, 1280, 3), (600, 800, 3), (640, 640, 3),
                  (2, 123, 457, 3)]:
        img = rng.integers(0, 255, shape, np.uint8)
        a = np.asarray(jax.jit(preprocess, static_argnums=1)(img, 640))
        b = np.asarray(jax.jit(preprocess_fused, static_argnums=1)(img, 640))
        assert a.shape == b.shape
        d = np.abs(a - b)
        assert d.max() <= 1.0 / 255.0 + 1e-6  # at most one u8 step
        frac = float((d > 1e-6).mean())
        assert frac < 1e-3, f"{shape}: {frac:.2e} of pixels differ"


@pytest.mark.slow
def test_w8a8_quantized_forward_parity():
    """quantize="w8a8" (int8 x int8 MXU convs via the nn.Conv interceptor,
    dynamic activation scales): detections on the same image match the
    bf16 forward's — same top class, box within a few pixels. The
    parameter tree is untouched (kernels quantize in-graph), so both
    models share the exact same variables here."""
    import jax

    base = YoloModel(None, task="obb", image_size=160, max_det=8,
                     conf_thresh=0.0)
    quant = YoloModel(None, task="obb", image_size=160, max_det=8,
                      conf_thresh=0.0, quantize="w8a8")
    quant.variables = base.variables
    quant._infer_vars = base.variables  # identical weights, no extra tree

    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    ref = {k: np.asarray(v) for k, v in base.device_decode(img).items()}
    out = {k: np.asarray(v) for k, v in quant.device_decode(img).items()}
    ri = int(np.argmax(np.where(ref["valid"], ref["score"], -1)))
    qi = int(np.argmax(np.where(out["valid"], out["score"], -1)))
    assert ref["valid"][ri] and out["valid"][qi]
    assert np.abs(ref["xyxy"][ri] - out["xyxy"][qi]).max() < 10.0
    assert abs(float(ref["score"][ri]) - float(out["score"][qi])) < 0.2
    assert int(ref["cls"][ri]) == int(out["cls"][qi])


def test_w8a8_interceptor_respects_dilation():
    """The interceptor must forward input/kernel dilation to the int8 conv
    — yolov8 has no dilated convs, so this is pinned directly on nn.Conv:
    a dilated conv run through the interceptor matches the float conv to
    int8 quantization error, and differs from the UNdilated conv (i.e.
    dilation was not silently dropped)."""
    import flax.linen as nn
    import jax

    from cuauv_vision_pipeline_tpu.models.yolo.predictor import (
        _w8a8_conv_interceptor,
    )

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    conv_d = nn.Conv(8, (3, 3), kernel_dilation=(2, 2), padding="SAME")
    conv_1 = nn.Conv(8, (3, 3), padding="SAME")
    v = conv_d.init(rng, x)

    ref = conv_d.apply(v, x)
    with nn.intercept_methods(_w8a8_conv_interceptor):
        got = conv_d.apply(v, x)
        und = conv_1.apply(v, x)  # same weights, no dilation
    scale = float(np.abs(np.asarray(ref)).max())
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.05 * scale, f"dilated int8 conv off by {err}"
    assert np.abs(np.asarray(got) - np.asarray(und)).max() > 0.1 * scale


@pytest.mark.slow
def test_pose_pt_roundtrip_custom_nk(tmp_path):
    """A pose .pt with a custom keypoint count (nk=4 AUV targets, not
    COCO's 17) round-trips: task inferred from the 3*nk-wide cv4 branch,
    nk from its width, and decoded keypoints match the source model."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.decode import decode
    from cuauv_vision_pipeline_tpu.models.yolo.model import create_model
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        export_ultralytics_state,
        load_checkpoint,
    )

    model, variables = create_model(
        2, size="n", task="pose", image_size=128, num_keypoints=4
    )
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_ultralytics_state(variables, "pose").items()
    }
    path = tmp_path / "toy-pose.pt"
    torch.save({"model": state, "names": {0: "a", 1: "b"}}, str(path))

    model2, variables2, meta = load_checkpoint(str(path))
    assert meta["task"] == "pose"
    assert meta["num_keypoints"] == 4
    assert model2.num_keypoints == 4

    img = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (1, 128, 128, 3), np.uint8),
        jnp.float32,
    )
    d1 = decode(model.apply(variables, img), 128, max_det=4, conf_thresh=0.0)
    d2 = decode(model2.apply(variables2, img), 128, max_det=4, conf_thresh=0.0)
    assert d1["kpts"].shape == (4, 4, 3)
    for k in ("xyxy", "score", "kpts"):
        np.testing.assert_allclose(
            np.asarray(d1[k]), np.asarray(d2[k]), rtol=1e-4, atol=1e-4
        )
