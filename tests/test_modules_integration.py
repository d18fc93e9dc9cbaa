"""Module-level integration: import smoke for every module/handler/tool and
a full product-path run of the real red_buoy module against the synthetic
capture source."""

import importlib
import threading
import time

import numpy as np
import pytest

MODULES = [
    "cuauv_vision_pipeline_tpu.modules.red_buoy",
    "cuauv_vision_pipeline_tpu.modules.red_buoy_stereo",
    "cuauv_vision_pipeline_tpu.modules.gate",
    "cuauv_vision_pipeline_tpu.modules.bins",
    "cuauv_vision_pipeline_tpu.modules.yolo",
    "cuauv_vision_pipeline_tpu.modules.yolo_multicam",
    "cuauv_vision_pipeline_tpu.modules.lab_test",
    "cuauv_vision_pipeline_tpu.modules.test",
    "cuauv_vision_pipeline_tpu.modules.example",
    "cuauv_vision_pipeline_tpu.modules.normal",
    "cuauv_vision_pipeline_tpu.modules.normal_relay",
    "cuauv_vision_pipeline_tpu.modules.poster",
    "cuauv_vision_pipeline_tpu.modules.record",
    "cuauv_vision_pipeline_tpu.modules.calibrate",
    "cuauv_vision_pipeline_tpu.modules.auto_calibrate",
    "cuauv_vision_pipeline_tpu.modules.auto_calibrate_zed",
    "cuauv_vision_pipeline_tpu.modules.color_balance",
    "cuauv_vision_pipeline_tpu.modules.preprocessor",
    "cuauv_vision_pipeline_tpu.handlers.torpedoes",
    "cuauv_vision_pipeline_tpu.handlers.gate",
    "cuauv_vision_pipeline_tpu.handlers.gate_behind",
    "cuauv_vision_pipeline_tpu.handlers.slalom",
    "cuauv_vision_pipeline_tpu.handlers.bins",
    "cuauv_vision_pipeline_tpu.handlers.manipulator",
    "cuauv_vision_pipeline_tpu.handlers.stub",
    "cuauv_vision_pipeline_tpu.capture_sources.image_directory",
    "cuauv_vision_pipeline_tpu.capture_sources.video",
    "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
    "cuauv_vision_pipeline_tpu.capture_sources.generic_camera",
    "cuauv_vision_pipeline_tpu.capture_sources.stream_server",
    "cuauv_vision_pipeline_tpu.capture_sources.stream_client",
    "cuauv_vision_pipeline_tpu.capture_sources.zed",
    "cuauv_vision_pipeline_tpu.misc.runner",
    "cuauv_vision_pipeline_tpu.misc.yolo_shm",
    "cuauv_vision_pipeline_tpu.misc.shm_bridge",
    "cuauv_vision_pipeline_tpu.misc.log_fixer",
    "cuauv_vision_pipeline_tpu.misc.hypertune",
    "cuauv_vision_pipeline_tpu.misc.image_ordering_test",
    "cuauv_vision_pipeline_tpu.misc.webcam_latency_test",
    "cuauv_vision_pipeline_tpu.misc.resizable_tpool",
    "cuauv_vision_pipeline_tpu.vision_common",
    "cuauv_vision_pipeline_tpu.stdlib",
    "cuauv_vision_pipeline_tpu.models.yolo.train",
    "cuauv_vision_pipeline_tpu.models.yolo.weights",
    "cuauv_vision_pipeline_tpu.parallel",
    "cuauv_vision_pipeline_tpu.utils.undistort",
    "cuauv_vision_pipeline_tpu.utils.sift",
]


@pytest.mark.parametrize("name", MODULES)
def test_imports(name):
    importlib.import_module(name)


def test_red_buoy_module_full_product_path(unique_direction):
    """The real BuoyLAB module consuming the real synthetic source through
    the real bus, writing real shm results: the BASELINE config #1 path."""
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import Synthetic
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.log import log
    from cuauv_vision_pipeline_tpu.modules import red_buoy

    shm.red_buoy_results.set(visible=False, center_x=0, center_y=0, area=0)

    # the synthetic source emits a single-plane BGR frame; give the module a
    # source spec with matching aliases for its @sources handler
    source = Synthetic(unique_direction, width=256, height=144, fps=60)
    src_thread = threading.Thread(target=source.run_event_loop)
    src_thread.start()
    time.sleep(0.3)

    # the synthetic source emits one unnamed plane, addressed by direction
    # name; rebind the buoy device chain accordingly (the production zed
    # source sends named planes and uses the stock @device_fn)
    from cuauv_vision_pipeline_tpu.core.base import device_fn
    from cuauv_vision_pipeline_tpu.engine.chains import red_buoy_fused

    class Buoy(red_buoy.BuoyLAB):
        @device_fn(unique_direction)
        def buoy_chain(self, image, *, tuners, want_posts):
            threshed, cleaned, best = red_buoy_fused(
                image, tuners["thresh_min"], tuners["thresh_max"]
            )
            posts = (
                {
                    "image": image,
                    "threshed": threshed,
                    "threshed_cleaned": cleaned,
                }
                if want_posts
                else {}
            )
            return best, posts

    module = Buoy(
        [unique_direction],
        red_buoy.module_tuners,
        fps=30,
        argv=[],
    )

    quit_flag = threading.Event()
    try:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            deadline = time.monotonic() + 30
            seen = False
            while time.monotonic() < deadline:
                if shm.red_buoy_results.visible.get():
                    seen = True
                    break
                time.sleep(0.05)
            quit_flag.set()
            loop.join(timeout=10)
    finally:
        source.quit_flag.set()
        src_thread.join(timeout=10)

    assert seen, "module never detected the synthetic buoy"
    area = shm.red_buoy_results.area.get()
    assert area > 50  # the disc is ~160 px at 144p
    # normalized center within the frame
    assert abs(shm.red_buoy_results.center_x.get()) < 0.6
    assert abs(shm.red_buoy_results.center_y.get()) < 0.6


def test_red_buoy_stereo_batched_fanin(unique_direction):
    """Both ZED eyes through ONE batched device dispatch (Pallas CCL fan-in):
    the stereo module detects a disc in the left eye and none in the right."""
    import threading
    import time

    import numpy as np

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import buoy_frame
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
        BlockAccessor,
        frame_bytes,
    )
    from cuauv_vision_pipeline_tpu.core.log import log
    from cuauv_vision_pipeline_tpu.modules.red_buoy_stereo import (
        BuoyStereo,
        module_tuners,
    )

    shm.red_buoy_stereo_results.set(visible_left=False, visible_right=False)

    H, W = 120, 160
    left = buoy_frame((H, W), 0.0)  # has the red disc
    right = np.full((H, W, 3), (90, 120, 60), np.uint8)  # no red at all

    tuners = [type(t)(t.name, 140 if t.name == "thresh_min" else 255, 0, 255)
              for t in module_tuners]
    module = BuoyStereo([unique_direction], tuners, fps=30, argv=[])

    size = frame_bytes(((H, W, 3), np.uint8), ((H, W, 3), np.uint8))
    quit_flag = threading.Event()
    with BlockAccessor(unique_direction, size) as writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline:
                    writer.write_frame(
                        int(time.monotonic() * 1000),
                        [("forward", left), ("forward2", right)],
                    )
                    if shm.red_buoy_stereo_results.visible_left.get():
                        break
                    time.sleep(0.05)
            finally:
                quit_flag.set()
                loop.join(timeout=30)

    res = shm.red_buoy_stereo_results.get()
    assert res.visible_left, "left eye never detected the disc"
    assert not res.visible_right, "right eye false-positived"
    assert res.area_left > 20
    assert abs(res.center_x_left) < 0.6 and abs(res.center_y_left) < 0.6


def test_bins_module_device_path_with_wildcard_alias(unique_direction):
    """BinDetector's stock @device_fn("*") binds to whatever direction the
    command line names (BASELINE config #3 shape): synthetic source -> bus
    -> one-graph HSV mask + morphology + overlay -> single packed fetch ->
    host contours/rects -> post."""
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import Synthetic
    from cuauv_vision_pipeline_tpu.core.log import log
    from cuauv_vision_pipeline_tpu.modules import bins

    source = Synthetic(unique_direction, width=256, height=144, fps=60)
    src_thread = threading.Thread(target=source.run_event_loop)
    src_thread.start()
    time.sleep(0.3)

    posted = []

    class Bins(bins.BinDetector):
        def post(self, name, image):
            posted.append((name, np.asarray(image).copy()))

    module = Bins([unique_direction], [], fps=30, argv=[])
    quit_flag = threading.Event()
    try:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline and not posted:
                time.sleep(0.05)
            quit_flag.set()
            loop.join(timeout=10)
    finally:
        source.quit_flag.set()
        src_thread.join(timeout=10)

    assert posted, "bins module never posted through the device path"
    name, overlay = posted[0]
    assert name == "bins"
    assert overlay.shape == (144, 256, 3) and overlay.dtype == np.uint8


def test_bins_host_logic_draws_valid_rects():
    """on_device_result: contour -> minAreaRect filtering (area > 500,
    aspect in [1,3]) and the green rectangle drawn on the overlay."""
    from cuauv_vision_pipeline_tpu.modules import bins
    from cuauv_vision_pipeline_tpu.utils.draw import Color

    cleaned = np.zeros((120, 160), np.uint8)
    cleaned[30:70, 40:110] = 255  # 40x70: area 2800, aspect 1.75 -> valid
    cleaned[5:9, 5:9] = 255  # 4x4: area 16 -> filtered out
    overlay = np.zeros((120, 160, 3), np.uint8)
    overlay.setflags(write=False)  # packed-fetch views arrive read-only

    posted = []
    det = bins.BinDetector.__new__(bins.BinDetector)
    det.post = lambda name, image: posted.append((name, image))
    det.on_device_result({"cleaned": cleaned}, {"overlay": overlay}, meta=None)

    assert len(posted) == 1
    _, out = posted[0]
    green = (out == np.array(Color.GREEN.value, np.uint8)).all(-1)
    assert green.any(), "no green rectangle drawn for the valid rect"
    ys, xs = np.nonzero(green)
    assert 25 <= ys.min() <= 35 and 35 <= xs.min() <= 45


def test_color_balance_async_pipeline_posts_pairs(unique_direction):
    """ColorBalance's per-config async executor: original/balanced pairs
    post together, one frame late (depth-1 overlap)."""
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import Synthetic
    from cuauv_vision_pipeline_tpu.core.log import log
    from cuauv_vision_pipeline_tpu.modules import color_balance

    source = Synthetic(unique_direction, width=128, height=72, fps=60)
    src_thread = threading.Thread(target=source.run_event_loop)
    src_thread.start()
    time.sleep(0.3)

    posted = []

    class CB(color_balance.ColorBalance):
        def post(self, name, image):
            posted.append((name, np.asarray(image).copy()))

    module = CB([unique_direction], color_balance.module_tuners, fps=30, argv=[])
    quit_flag = threading.Event()
    try:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline and len(posted) < 4:
                time.sleep(0.05)
            quit_flag.set()
            loop.join(timeout=10)
    finally:
        source.quit_flag.set()
        src_thread.join(timeout=10)

    names = [n for n, _ in posted]
    assert "original" in names and "balanced" in names, names
    # pairs post adjacently: original immediately followed by balanced
    i = names.index("original")
    assert names[i + 1] == "balanced"
    orig = dict(posted)["original"]
    bal = dict(posted)["balanced"]
    assert orig.shape == bal.shape == (72, 128, 3)
    assert not np.array_equal(orig, bal)  # default flags change the frame


def test_device_fn_batch_drains_queued_frames(unique_direction):
    """@device_fn(batch=K): frames that queue up while the chain is busy
    ride ONE vmapped dispatch and on_device_result fires once per fresh
    frame, oldest first, each with its own acquisition time."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class Batcher(ModuleBase):
        @device_fn(unique_direction, batch=4)
        def chain(self, image, *, tuners, want_posts):
            # per-frame chain; the framework vmaps it over the batch axis
            return {"mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append((float(result["mean"]), meta.acquisition_time))

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=32 * 32 * 3, slot_count=8
    )
    module = Batcher([unique_direction], [], fps=200, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                # first frame: lets the chain bind + compile
                frame = lambda v: np.full((32, 32, 3), v, np.uint8)
                writer.write_frame(1000, frame(10))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                # burst: 3 frames land between module ticks; the batch read
                # must deliver ALL of them (a latest-wins reader would drop 2)
                writer.write_frame(2000, frame(20))
                writer.write_frame(2001, frame(30))
                writer.write_frame(2002, frame(40))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and len(seen) < 4:
                    time.sleep(0.02)
            finally:
                quit_flag.set()
                loop.join(timeout=20)

    assert len(seen) >= 4, seen
    means = [round(m) for m, _ in seen[:4]]
    acqs = [a for _, a in seen[:4]]
    assert means == [10, 20, 30, 40], means  # oldest-first, none dropped
    assert acqs == [1000, 2000, 2001, 2002], acqs  # per-lane camera stamps


def test_gate_localize_runs_full_handler(monkeypatch):
    """CUAUV_GATE_LOCALIZE=1: the gate module drives the FULL GateOBB
    localization per frame (BASELINE config 2's 'gate module +
    handlers/gate.py localization'); shm.yolo_gate gets ordered corners."""
    import numpy as np

    monkeypatch.setenv("CUAUV_GATE_LOCALIZE", "1")
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.base import VideoSourceMetadata
    from cuauv_vision_pipeline_tpu.modules.gate import GateDetector

    shm.yolo_gate.set(shark_visible=0, saw_visible=0)
    m = GateDetector(argv=[])
    img = np.zeros((720, 1280, 3), np.uint8)
    m._video_metadata["forward"] = VideoSourceMetadata()
    m._video_metadata["forward"].update(img, 0)
    m._current_direction = "forward"
    m.process("forward", img)

    g = shm.yolo_gate.get()
    assert g.shark_visible and g.saw_visible
    # normalized coordinates stay in frame
    assert abs(g.shark_center_x) < 0.6 and abs(g.shark_center_y) < 0.6
    assert g.shark_area > 0
    assert "gate handler" in m._post_queue


@pytest.mark.parametrize("detector", ["device", "cv2"])
def test_bins_sift_pose_estimation(monkeypatch, detector):
    """CUAUV_BINS_POSE_TEMPLATE=builtin: the SIFT pose path recovers the
    pasted bin plate's quad (BASELINE config 3's 'pose estimation with
    utils/feature + sift'). detector="device" (the default) runs detect +
    describe + template 2-NN INSIDE the chain (only top-2 buffers ride the
    fetch); detector="cv2" is the reference's own host SIFT over a fetched
    gray plane."""
    import math

    import jax
    import numpy as np

    monkeypatch.setenv("CUAUV_BINS_POSE_TEMPLATE", "builtin")
    monkeypatch.setenv("CUAUV_SIFT_DETECTOR", detector)
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import (
        bin_texture,
        bins_frame,
    )
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.base import (
        DeviceResultMeta,
        VideoSourceMetadata,
    )
    from cuauv_vision_pipeline_tpu.modules.bins import BinDetector

    m = BinDetector(video_sources=["forward"], tuners=[], argv=[])
    frame = bins_frame((720, 1280), 1.0)
    res, posts = m.bins_chain(jax.device_put(frame), tuners={}, want_posts=True)
    res = {k: np.asarray(v) for k, v in res.items()}
    posts = {k: np.asarray(v) for k, v in posts.items()}
    if detector == "device":
        # detect+describe+match rode the dispatch; no gray/descriptor fetch
        assert "pose_d2" in res and "kp" in res and "gray" not in res
    else:
        assert "gray" in res  # rides the packed fetch for the host detector

    m._video_metadata["forward"] = VideoSourceMetadata()
    m._video_metadata["forward"].update(frame, 0)
    m._current_direction = "forward"
    meta = DeviceResultMeta(
        aliases=("forward",), acquisition_time=0, submit_time=0.0
    )
    m.on_device_result(res, posts, meta)

    g = shm.bins_pose.get()
    assert g.visible and g.inliers >= 8
    h, w = 720, 1280
    th, tw = bin_texture().shape[:2]
    y0 = int((h - th) * (0.5 + 0.35 * math.sin(0.5)))
    x0 = int((w - tw) * (0.5 + 0.35 * math.cos(0.7)))
    assert abs(g.quad_x1 - x0) < 12 and abs(g.quad_y1 - y0) < 12
    assert abs(g.quad_x3 - (x0 + tw)) < 12 and abs(g.quad_y3 - (y0 + th)) < 12


def test_device_fn_latest_only_backlog_drops_stale(unique_direction):
    """@device_fn(batch=K, latest_only_backlog=M): when more than M unseen
    frames are queued, only the newest dispatches (reference latest-wins,
    cmf.cpp:423) instead of batching the backlog."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class LatestOnly(ModuleBase):
        @device_fn(unique_direction, batch=4, latest_only_backlog=1)
        def chain(self, image, *, tuners, want_posts):
            return {"mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append((round(float(result["mean"])), meta.acquisition_time))

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=32 * 32 * 3, slot_count=8
    )
    # fps=2: a 500 ms tick window guarantees the 3-frame burst (written
    # right after a result, i.e. right after a read) drains in ONE batch read
    module = LatestOnly([unique_direction], [], fps=2, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                frame = lambda v: np.full((32, 32, 3), v, np.uint8)
                writer.write_frame(1000, frame(10))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                # burst of 3: backlog (3) > threshold (1) -> only the
                # newest frame may be processed; 20 and 30 must be dropped
                writer.write_frame(2000, frame(20))
                writer.write_frame(2001, frame(30))
                writer.write_frame(2002, frame(40))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and len(seen) < 2:
                    time.sleep(0.02)
            finally:
                quit_flag.set()
                loop.join(timeout=20)

    assert seen[0] == (10, 1000), seen
    assert (40, 2002) in seen[1:], seen
    dropped = {20, 30} & {m for m, _ in seen}
    assert not dropped, f"stale frames {dropped} should have been dropped: {seen}"


def test_device_fn_batch_warms_all_lane_traces(unique_direction):
    """After the first batched dispatch, a background thread pre-compiles
    every OTHER fresh-lane count (each is its own trace): the first
    fall-behind event must not hit a cold compile mid-stream. The chain
    body runs once per trace, so counting executions observes the warmup
    actually reaching the jit (it is best-effort and swallows errors —
    a signature drift would otherwise silently disable it)."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []
    trace_count = [0]

    class Warmed(ModuleBase):
        @device_fn(unique_direction, batch=3)
        def chain(self, image, *, tuners, want_posts):
            trace_count[0] += 1  # trace-time only: once per (posts, nlanes)
            return {"mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append(float(result["mean"]))

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=32 * 32 * 3, slot_count=8
    )
    module = Warmed([unique_direction], [], fps=50, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                writer.write_frame(1000, np.full((32, 32, 3), 10, np.uint8))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                # keep-up path compiled nlanes=1; the warm thread owes
                # nlanes=2 and nlanes=3 (each one more chain-body trace)
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and trace_count[0] < 3:
                    time.sleep(0.05)
            finally:
                quit_flag.set()
                loop.join(timeout=20)

    assert trace_count[0] == 3, (
        f"expected 3 lane-count traces (1 live + 2 warmed), saw "
        f"{trace_count[0]} — lane warmup never reached the jit"
    )


def test_device_fn_batch_posts_newest_lane_only(unique_direction):
    """Batched deliveries carry debug posts for the NEWEST lane only: stale
    drained lanes would overwrite the same post blocks with frames no GUI
    ever shows. meta.newest marks the lane carrying the posts."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class Poster(ModuleBase):
        @device_fn(unique_direction, batch=4)
        def chain(self, image, *, tuners, want_posts):
            posts = {"dbg": image} if want_posts else {}
            return {"mean": jnp.mean(image.astype(jnp.float32))}, posts

        def on_device_result(self, result, posts, meta):
            seen.append(
                (round(float(result["mean"])), meta.newest, sorted(posts))
            )

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=32 * 32 * 3, slot_count=8
    )
    # fps=2: see test_device_fn_latest_only_backlog_drops_stale
    module = Poster([unique_direction], [], fps=2, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                frame = lambda v: np.full((32, 32, 3), v, np.uint8)
                writer.write_frame(1000, frame(10))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                writer.write_frame(2000, frame(20))
                writer.write_frame(2001, frame(30))
                writer.write_frame(2002, frame(40))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and len(seen) < 4:
                    time.sleep(0.02)
            finally:
                quit_flag.set()
                loop.join(timeout=20)

    by_mean = {m: (newest, posts) for m, newest, posts in seen}
    # stale lanes: delivered, marked stale, no posts
    for stale in (20, 30):
        assert by_mean[stale] == (False, []), seen
    # newest lane of the burst: marked newest, carries the posts
    assert by_mean[40] == (True, ["dbg"]), seen


def test_device_fn_batch_dead_source_detection(unique_direction):
    """A batch-reading module must still notice a dead camera: when the
    batch read returns no new frames the 3-strike detector runs exactly as
    on the unbatched path (round-2 advisor finding)."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class Batcher(ModuleBase):
        @device_fn(unique_direction, batch=4)
        def chain(self, image, *, tuners, want_posts):
            return {"mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append(float(result["mean"]))

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=16 * 16 * 3, slot_count=8
    )
    module = Batcher([unique_direction], [], fps=200, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                writer.write_frame(
                    1000, np.full((16, 16, 3), 10, np.uint8)
                )
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                # now the source goes silent; within a few ticks the
                # dead-source counter must saturate
                meta = module._video_metadata[unique_direction]
                deadline = time.monotonic() + 10
                while time.monotonic() < deadline and meta._dead_counter < 3:
                    time.sleep(0.02)
                assert meta._dead_counter == 3, (
                    "batched read path never marked the silent source dead"
                )
            finally:
                quit_flag.set()
                loop.join(timeout=20)


def test_wildcard_alias_binds_first_plane_of_multiplane_source(unique_direction):
    """@device_fn("*") on a multi-plane (zed-layout) source binds to the
    FIRST plane ("forward") regardless of the command-line source name."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import Synthetic
    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class FirstPlane(ModuleBase):
        @device_fn("*")
        def chain(self, image, *, tuners, want_posts):
            return {"shape0": jnp.int32(image.shape[0]),
                    "mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append((meta.aliases, int(result["shape0"])))

    source = Synthetic(unique_direction, width=96, height=54, fps=30, scene="zed")
    t = threading.Thread(target=source.run_event_loop)
    t.start()
    time.sleep(0.4)

    module = FirstPlane([unique_direction], [], fps=60, argv=[])
    quit_flag = threading.Event()
    try:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            deadline = time.monotonic() + 45
            while time.monotonic() < deadline and not seen:
                time.sleep(0.05)
            quit_flag.set()
            loop.join(timeout=15)
    finally:
        source.quit_flag.set()
        t.join(timeout=10)

    assert seen, "device chain never fired through the plane-bound wildcard"
    aliases, h = seen[0]
    assert aliases == ("forward",), aliases  # bound to the first zed plane
    assert h == 54


def test_device_fn_batch_mode_map_drains_queued_frames(unique_direction):
    """batch_mode="map": lanes run sequentially inside ONE dispatch
    (single-frame VMEM profile — the mode red_buoy ships with); delivery
    semantics are identical to the vmap mode."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.core.base import ModuleBase, device_fn
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
    from cuauv_vision_pipeline_tpu.core.log import log

    seen = []

    class MapBatcher(ModuleBase):
        @device_fn(unique_direction, batch=4, batch_mode="map")
        def chain(self, image, *, tuners, want_posts):
            return {"mean": jnp.mean(image.astype(jnp.float32))}, {}

        def on_device_result(self, result, posts, meta):
            seen.append((float(result["mean"]), meta.acquisition_time))

    writer = BlockAccessor(
        unique_direction, max_entry_size_bytes=32 * 32 * 3, slot_count=8
    )
    module = MapBatcher([unique_direction], [], fps=200, argv=[])
    quit_flag = threading.Event()
    with writer:
        with module._module_manager:
            loop = threading.Thread(target=module._loop, args=(quit_flag, log.t))
            loop.start()
            try:
                frame = lambda v: np.full((32, 32, 3), v, np.uint8)
                writer.write_frame(1000, frame(10))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and not seen:
                    time.sleep(0.02)
                assert seen, "first frame never processed"
                writer.write_frame(2000, frame(20))
                writer.write_frame(2001, frame(30))
                writer.write_frame(2002, frame(40))
                deadline = time.monotonic() + 60
                while time.monotonic() < deadline and len(seen) < 4:
                    time.sleep(0.02)
            finally:
                quit_flag.set()
                loop.join(timeout=20)

    assert len(seen) >= 4, seen
    assert [round(m) for m, _ in seen[:4]] == [10, 20, 30, 40]
    assert [a for _, a in seen[:4]] == [1000, 2000, 2001, 2002]


def test_device_fn_batch_mode_validation():
    from cuauv_vision_pipeline_tpu.core.base import device_fn

    with pytest.raises(ValueError, match="batch_mode"):
        device_fn("cam", batch=4, batch_mode="pmap")
