"""YOLO module end-to-end: the @device_fn chain with real predictor/handlers.

Drives the module's actual hot path — detect_chain (device forward +
decode) then on_device_result (host summarize + tracker + handler
dispatch) — the same split ModuleBase's StreamExecutor uses.
"""

import time

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cuauv_vision_pipeline_tpu.core import shm


def _make_module():
    """Construct Yolo without argparse/bus plumbing."""
    from cuauv_vision_pipeline_tpu.core.handlers import HandlerMixin
    from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.modules import yolo as Y

    module = object.__new__(Y.Yolo)
    posts = {}
    module.post = lambda name, img, cs="BGR": posts.__setitem__(name, img.shape)
    module._performance_enabled = False
    values = {t.name: 0.05 for t in Y.TUNERS}

    class Tuners(dict):
        def __getitem__(self, k):
            return values[k]

    module._module_manager = Tuners()
    module.normalize = lambda c: (c[0] / 640 - 0.5, c[1] / 640 - 0.5)
    module.normalize_axis = lambda c, a: c / 640 - 0.5
    module.get_latency = lambda: 0

    HandlerMixin.__init__(module, Y.HANDLERS)
    module.model = YoloModel(None, task="obb", image_size=160, conf_thresh=0.0,
                             max_det=8)
    module.yolo_model_type = module.model.task
    module.map_fn = MAP_FN[module.yolo_model_type]
    return module, posts


def _run_chain(module, img, want_posts=True):
    """One frame through the real split: device chain -> host dispatch."""
    from cuauv_vision_pipeline_tpu.core.base import DeviceResultMeta

    decoded, chain_posts = module.detect_chain(
        img, tuners={}, want_posts=want_posts
    )
    decoded = jax.tree.map(np.asarray, decoded)
    chain_posts = jax.tree.map(np.asarray, chain_posts)
    meta = DeviceResultMeta(
        aliases=("forward",),
        acquisition_time=int(time.monotonic() * 1000),
        submit_time=time.monotonic(),
    )
    module.on_device_result(decoded, chain_posts, meta)


def test_detect_chain_dispatches_all_active_handlers():
    module, posts = _make_module()
    for flag in (
        "yolo_torpedoes_board", "yolo_slalom", "yolo_gate",
        "yolo_gate_behind", "yolo_bins", "yolo_manipulator",
    ):
        shm.active_objects.set_field(flag, True)
        shm.active_objects.set_field(f"{flag}_direction", "forward")

    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    _run_chain(module, img)

    # every active handler posted (either detections or nothing found, but
    # the handler ran and posted its annotated view)
    assert "original image" in posts
    for name in ("torpedoes", "slalom", "gate", "gate behind", "bins",
                 "manipulator"):
        assert any(name in key for key in posts), (name, list(posts))
    # telemetry lands on the status group
    assert shm.yolo_status.get_field("frames") >= 1


def test_batch_env_knobs_configure_device_fn(monkeypatch):
    """CUAUV_YOLO_BATCH / CUAUV_YOLO_LATEST_ONLY flow into the @device_fn
    spec (read at import — the knob is per-process, like --device). vmap
    mode: batched conv stacks are the point (predictor.device_decode_batch
    parity is pinned in test_yolo.py)."""
    import importlib

    from cuauv_vision_pipeline_tpu.modules import yolo as Y

    monkeypatch.setenv("CUAUV_YOLO_BATCH", "4")
    monkeypatch.setenv("CUAUV_YOLO_LATEST_ONLY", "2")
    try:
        Y2 = importlib.reload(Y)
        assert Y2.Yolo.detect_chain._device_fn_batch == 4
        assert Y2.Yolo.detect_chain._device_fn_latest_only == 2
        assert Y2.Yolo.detect_chain._device_fn_batch_mode == "vmap"
    finally:
        monkeypatch.delenv("CUAUV_YOLO_BATCH")
        monkeypatch.delenv("CUAUV_YOLO_LATEST_ONLY")
        Y3 = importlib.reload(Y)
        assert Y3.Yolo.detect_chain._device_fn_batch == 1
        assert Y3.Yolo.detect_chain._device_fn_latest_only is None


def test_inactive_detector_posts_grayscale():
    module, posts = _make_module()
    shm.active_objects.set_field("yolo_gate", False)
    shm.active_objects.set_field("yolo_gate_direction", "forward")
    img = np.random.default_rng(1).integers(0, 255, (160, 160, 3), np.uint8)
    _run_chain(module, img)
    assert any("gate handler" in k for k in posts)  # the grayscale fallback
    shm.active_objects.set_field("yolo_gate", True)


def test_wrong_direction_skips_handler():
    module, posts = _make_module()
    shm.active_objects.set_field("yolo_bins_direction", "downward")
    img = np.random.default_rng(2).integers(0, 255, (160, 160, 3), np.uint8)
    _run_chain(module, img)
    assert not any("bins" in k for k in posts)
    shm.active_objects.set_field("yolo_bins_direction", "forward")


def test_performance_mode_skips_debug_outputs():
    """want_posts=False: no image crosses back; handlers still run on the
    cached stand-in and only shm results are produced."""
    module, posts = _make_module()
    module._performance_enabled = True
    shm.active_objects.set_field("yolo_gate", True)
    shm.active_objects.set_field("yolo_gate_direction", "forward")
    img = np.random.default_rng(3).integers(0, 255, (160, 160, 3), np.uint8)
    _run_chain(module, img, want_posts=False)
    assert "original image" not in posts
    assert module._frames_processed == 1  # telemetry still flows
    assert shm.yolo_status.get_field("frames") == 1


def test_multicam_one_dispatch_two_cameras():
    """YoloMulticam: both cameras through one batched decode; per-camera
    direction gating; detections dispatch to that camera's handlers."""
    from cuauv_vision_pipeline_tpu.core.base import DeviceResultMeta
    from cuauv_vision_pipeline_tpu.core.handlers import HandlerMixin
    from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.modules import yolo as Y
    from cuauv_vision_pipeline_tpu.modules import yolo_multicam as YM

    module = object.__new__(YM.YoloMulticam)
    posts = {}
    module.post = lambda name, img, cs="BGR": posts.__setitem__(name, img.shape)
    module._performance_enabled = False
    values = {t.name: 0.05 for t in Y.TUNERS}

    class Tuners(dict):
        def __getitem__(self, k):
            return values[k]

    module._module_manager = Tuners()
    module.normalize = lambda c: (c[0] / 160 - 0.5, c[1] / 160 - 0.5)
    module.normalize_axis = lambda c, a: c / 160 - 0.5
    module.get_latency = lambda: 0
    HandlerMixin.__init__(module, Y.HANDLERS)
    module.model = YoloModel(None, task="obb", image_size=160, conf_thresh=0.0,
                             max_det=8)
    module.yolo_model_type = module.model.task
    module.map_fn = MAP_FN[module.yolo_model_type]

    # torpedoes active on the forward camera, bins on the downward one
    for flag, direction in (
        ("yolo_torpedoes_board", "forward"),
        ("yolo_bins", "downward"),
    ):
        shm.active_objects.set_field(flag, True)
        shm.active_objects.set_field(f"{flag}_direction", direction)
    for flag in ("yolo_slalom", "yolo_gate", "yolo_gate_behind",
                 "yolo_manipulator"):
        shm.active_objects.set_field(flag, False)

    rng = np.random.default_rng(1)
    fwd = rng.integers(0, 255, (120, 160, 3), np.uint8)
    flir = rng.integers(0, 255, (80, 100, 3), np.uint8)

    decoded, chain_posts = module.detect_chain(
        fwd, flir, tuners={}, want_posts=True
    )
    decoded = jax.tree.map(np.asarray, decoded)
    chain_posts = jax.tree.map(np.asarray, chain_posts)
    # one batched dispatch: every decode leaf has the camera axis in front
    assert all(v.shape[0] == 2 for v in decoded.values())
    meta = DeviceResultMeta(
        aliases=("forward", "flir"),
        acquisition_time=int(time.monotonic() * 1000),
        submit_time=time.monotonic(),
    )
    module.on_device_result(decoded, chain_posts, meta)

    assert "image_forward" in posts and posts["image_forward"] == fwd.shape
    assert "image_downward" in posts and posts["image_downward"] == flir.shape
    # per-camera track spaces exist
    assert len(module._cam_trackers) == 2
    assert shm.yolo_status.get().frames >= 1


def test_multicam_factory_three_cameras():
    """multicam_class builds an N-camera module: $i placeholder specs, one
    batched dispatch with a 3-camera axis, directions from CLI aliases,
    numbered post names for repeated directions."""
    from cuauv_vision_pipeline_tpu.core.base import DeviceResultMeta
    from cuauv_vision_pipeline_tpu.core.handlers import HandlerMixin
    from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.modules import yolo as Y
    from cuauv_vision_pipeline_tpu.modules import yolo_multicam as YM

    cls = YM.multicam_class(["zed[forward]", "flir[downward]", "aux[forward]"])
    assert cls.__name__ == "YoloMulticam"  # shm block names stay stable
    assert tuple(d for _, d in cls.CAMERAS) == ("forward", "downward", "forward")
    assert cls.POST_NAMES == ("image_forward", "image_downward", "image_forward2")
    assert cls.detect_chain._device_fn_aliases == ("$0", "$1", "$2")

    module = object.__new__(cls)
    posts = {}
    module.post = lambda name, img, cs="BGR": posts.__setitem__(name, img.shape)
    module._performance_enabled = False

    class Tuners(dict):
        def __getitem__(self, k):
            return 0.05

    module._module_manager = Tuners()
    module.normalize = lambda c: (c[0] / 160 - 0.5, c[1] / 160 - 0.5)
    module.normalize_axis = lambda c, a: c / 160 - 0.5
    module.get_latency = lambda: 0
    HandlerMixin.__init__(module, Y.HANDLERS)
    module.model = YoloModel(None, task="obb", image_size=160, conf_thresh=0.0,
                             max_det=8)
    module.yolo_model_type = module.model.task
    module.map_fn = MAP_FN[module.yolo_model_type]

    shm.active_objects.set_field("yolo_gate", True)
    shm.active_objects.set_field("yolo_gate_direction", "forward")
    for flag in ("yolo_torpedoes_board", "yolo_slalom", "yolo_bins",
                 "yolo_gate_behind", "yolo_manipulator"):
        shm.active_objects.set_field(flag, False)

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 255, hw + (3,), np.uint8)
        for hw in ((120, 160), (80, 100), (64, 64))
    ]
    decoded, chain_posts = module.detect_chain(
        *frames, tuners={}, want_posts=True
    )
    decoded = jax.tree.map(np.asarray, decoded)
    chain_posts = jax.tree.map(np.asarray, chain_posts)
    assert all(v.shape[0] == 3 for v in decoded.values())
    assert set(chain_posts) == set(cls.POST_NAMES)

    meta = DeviceResultMeta(
        aliases=("cam0", "cam1", "cam2"),
        acquisition_time=int(time.monotonic() * 1000),
        submit_time=time.monotonic(),
    )
    module.on_device_result(decoded, chain_posts, meta)
    for name, frame in zip(cls.POST_NAMES, frames):
        assert posts[name] == frame.shape
    assert len(module._cam_trackers) == 3


def test_detect_checkpoint_serves_through_obb_handlers():
    """A non-OBB (detect/pose/segment) checkpoint's detections flow
    through the six handlers: YOLOData.corners presents the box as a
    (tl, tr, br, bl) quad, so order_points/quad-area handlers work for
    every box-producing task, not only obb."""
    from cuauv_vision_pipeline_tpu.core.handlers import HandlerMixin
    from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.modules import yolo as Y

    module = object.__new__(Y.Yolo)
    posts = {}
    module.post = lambda name, img, cs="BGR": posts.__setitem__(name, img.shape)
    module._performance_enabled = False

    class Tuners(dict):
        def __getitem__(self, k):
            return 0.0  # accept every detection: handlers must RUN

    module._module_manager = Tuners()
    module.normalize = lambda c: (c[0] / 160 - 0.5, c[1] / 160 - 0.5)
    module.normalize_axis = lambda c, a: c / 160 - 0.5
    module.get_latency = lambda: 0
    HandlerMixin.__init__(module, Y.HANDLERS)
    module.model = YoloModel(None, task="detect", image_size=160,
                             conf_thresh=0.0, max_det=8)
    module.yolo_model_type = module.model.task
    module.map_fn = MAP_FN[module.yolo_model_type]

    for flag in (
        "yolo_torpedoes_board", "yolo_slalom", "yolo_gate",
        "yolo_gate_behind", "yolo_bins", "yolo_manipulator",
    ):
        shm.active_objects.set_field(flag, True)
        shm.active_objects.set_field(f"{flag}_direction", "forward")

    img = np.random.default_rng(4).integers(0, 255, (160, 160, 3), np.uint8)
    _run_chain(module, img)  # raised AttributeError('corners') before
    assert "original image" in posts
