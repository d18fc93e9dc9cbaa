"""Core framework tests: tuners, shm store, VideoSource specs, and the
capture-source -> module -> reader end-to-end loop in one process."""

import threading
import time

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core import shm
from cuauv_vision_pipeline_tpu.core.base import (
    ModuleBase,
    ModuleReader,
    VideoSource,
    sources,
)
from cuauv_vision_pipeline_tpu.core.capture_source import CaptureSource, FpsLimiter
from cuauv_vision_pipeline_tpu.core.tuners import (
    BoolTuner,
    DoubleTuner,
    IntTuner,
    tuner_from_bytes,
)


# --- tuners -----------------------------------------------------------------


def test_int_tuner_roundtrip():
    t = IntTuner("thresh_min", 10, 0, 255)
    assert t.byte_size() == len(t.serialize())
    t2 = IntTuner("thresh_min", 0, 0, 255)
    t2.deserialize(t.serialize())
    assert t2.value == 10
    assert str(t2) == "IntTuner_thresh_min"


def test_int_tuner_clamps_out_of_range():
    t = IntTuner("x", 5, 0, 10)
    bad = IntTuner("x", 99, 0, 100)  # same name length => same format
    t.deserialize(bad.serialize())
    assert t.value == 5  # 99 > max 10 rejected by the captured validator


def test_double_and_bool_tuners():
    d = DoubleTuner("conf", 0.5, 0.0, 1.0)
    d2 = DoubleTuner("conf", 0.0, 0.0, 1.0)
    d2.deserialize(d.serialize())
    assert d2.value == pytest.approx(0.5)

    b = BoolTuner("flag", True)
    b2 = BoolTuner("flag", False)
    b2.deserialize(b.serialize())
    assert b2.value is True


def test_tuner_from_bytes_dispatch():
    t = tuner_from_bytes("IntTuner_alpha", IntTuner("alpha", 3).serialize())
    assert isinstance(t, IntTuner) and t.value == 3
    t = tuner_from_bytes("DoubleTuner_beta", DoubleTuner("beta", 2.5).serialize())
    assert isinstance(t, DoubleTuner) and t.value == 2.5
    t = tuner_from_bytes("BoolTuner_g", BoolTuner("g", True).serialize())
    assert isinstance(t, BoolTuner) and t.value is True


# --- video source specs -------------------------------------------------------


def test_video_source_spec_parsing():
    vs = VideoSource.create("zed[forward,normal]:u8:f32:f64")
    assert vs.name == "zed"
    assert vs.plane_aliases == ("forward", "normal")
    assert vs.byte_type is np.uint8
    assert vs.short_type is np.float32
    assert vs.long_type is np.float64

    vs = VideoSource.create("forward:i8:i32:i64")
    assert vs.byte_type is np.int8
    assert vs.short_type is np.int32
    assert vs.long_type is np.int64

    vs = VideoSource.create("downward")
    assert vs.name == "downward" and vs.plane_aliases == ()


def test_sources_decorator_extracts_aliases():
    @sources("zed[forward]", "zed[normal]", "downward")
    def handler(self, a, b, c):
        pass

    assert handler._sources_aliases == ("forward", "normal", "downward")


# --- shm store ---------------------------------------------------------------


def test_shm_field_roundtrip():
    shm.red_buoy_results.center_x.set(0.25)
    shm.red_buoy_results.visible.set(True)
    assert shm.red_buoy_results.center_x.get() == pytest.approx(0.25)
    assert shm.red_buoy_results.visible.get() is True


def test_shm_group_snapshot():
    g = shm.red_buoy_results
    g.set(center_x=0.1, center_y=-0.2, area=123.0)
    snap = g.get()
    assert snap.center_x == pytest.approx(0.1)
    assert snap.center_y == pytest.approx(-0.2)
    assert snap.area == pytest.approx(123.0)
    snap.center_x = 0.9
    g.set(snap)
    assert g.center_x.get() == pytest.approx(0.9)


def test_shm_define_group_and_string_field():
    g = shm.define_group(
        "test_dynamic_group", {"mode": ["string", "idle"], "count": "int"}
    )
    assert g.mode.get() == "idle"
    g.mode.set("running")
    g.count.set(42)
    assert g.mode.get() == "running"
    assert g.count.get() == 42
    shm.delete_group("test_dynamic_group")


def test_shm_watcher_fires_on_write():
    g = shm.define_group("test_watch_group", {"v": "int"})
    try:
        w = shm.watchers.watcher(poll_interval=0.001)
        w.watch(g)
        fired = []

        def waiter():
            fired.append(w.wait(timeout=15.0))

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)
        g.v.set(7)
        t.join()
        assert fired == [True]
    finally:
        shm.delete_group("test_watch_group")


def test_shm_watcher_timeout():
    g = shm.define_group("test_watch_timeout", {"v": "int"})
    try:
        w = shm.watchers.watcher(poll_interval=0.001)
        w.watch(g)
        assert w.wait(timeout=0.05) is False
    finally:
        shm.delete_group("test_watch_timeout")


# --- fps limiter ---------------------------------------------------------------


def test_fps_limiter_caps_rate():
    quit_flag = threading.Event()
    limiter = FpsLimiter("test", quit_flag).rate(100)
    it = iter(limiter)
    start = time.monotonic()
    for _ in range(10):
        next(it)
    elapsed = time.monotonic() - start
    assert elapsed >= 0.08  # ~10 ticks at 100 fps


def test_fps_limiter_stops_on_quit():
    quit_flag = threading.Event()
    limiter = FpsLimiter("test", quit_flag).rate(1000)
    it = iter(limiter)
    next(it)
    quit_flag.set()
    with pytest.raises(StopIteration):
        next(it)


# --- end-to-end: capture -> module -> reader -----------------------------------


class _OneShotSource(CaptureSource):
    """Emits a fixed number of 2-plane frames then exhausts."""

    def __init__(self, direction, n_frames):
        super().__init__()
        self.direction = direction
        self.n_frames = n_frames

        def udl(limiter, args):
            for t in limiter.rate(200):
                if self.n_frames <= 0:
                    return
                self.n_frames -= 1
                rgb = np.full((16, 24, 3), 120, dtype=np.uint8)
                depth = np.full((16, 24, 1), 2.5, dtype=np.float32)
                yield (self.direction, t, (rgb, depth), ("forward", "depth"))

        self.register_capture_udl("oneshot", udl)


def test_capture_to_module_end_to_end(unique_direction):
    """Full loop: capture source writes named planes; a ModuleBase subclass
    with an @sources handler consumes them, posts a debug image, and writes
    a result; a ModuleReader sees the post."""
    results = {}

    class DemoModule(ModuleBase):
        @sources(f"{unique_direction}[forward]", f"{unique_direction}[depth]")
        def handle(self, forward, depth):
            results["shape"] = forward.shape
            results["depth0"] = float(depth[0, 0, 0])
            results["norm"] = self.normalize((8, 12))
            self.post("echo", forward, "BGR")
            results["count"] = results.get("count", 0) + 1

    # Plenty of frames so the block outlives the whole test; stopped explicitly.
    source = _OneShotSource(unique_direction, n_frames=100_000)
    src_thread = threading.Thread(target=source.run_event_loop)
    src_thread.start()
    time.sleep(0.2)  # let the block appear

    module = DemoModule(
        [f"{unique_direction}[forward,depth]"],
        [IntTuner("thresh", 128, 0, 255)],
        fps=100,
        argv=[],
    )

    # Run the module loop in a thread; stop it after the source exhausts.
    quit_flag = threading.Event()
    from cuauv_vision_pipeline_tpu.core.log import log

    with module._module_manager:
        loop_thread = threading.Thread(
            target=module._loop, args=(quit_flag, log.test)
        )
        loop_thread.start()

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and results.get("count", 0) < 1:
            time.sleep(0.02)

        # Reader side: discover the module and its post. ModuleReader globs
        # post blocks once at construction, so wait for the first post block
        # to materialize.
        import glob as _glob

        from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BLOCK_STUB

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not _glob.glob(
            f"{BLOCK_STUB}module_{module.name}_post%*"
        ):
            time.sleep(0.02)
        assert module.name in ModuleReader.get_active_modules()
        reader = ModuleReader(module.name)
        seen_posts = []
        reader.register_post_udl(
            lambda mod, name, idx, img, cs: seen_posts.append((name, img.shape, cs))
        )
        reader.run_forever(fps=120)
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and not seen_posts:
            time.sleep(0.02)
        reader.unblock()

        quit_flag.set()
        loop_thread.join(timeout=5)

    source.quit_flag.set()
    src_thread.join(timeout=5)

    assert results["shape"] == (16, 24, 3)
    assert results["depth0"] == pytest.approx(2.5)
    # normalize: (y - h/2) / w, (x - w/2) / w  with h=16, w=24
    assert results["norm"][0] == pytest.approx((8 - 8) / 24)
    assert results["norm"][1] == pytest.approx((12 - 12) / 24)
    assert seen_posts and seen_posts[0][0] == "echo"
    assert seen_posts[0][1] == (16, 24, 3)
    assert seen_posts[0][2] == "BGR"


def test_module_tuner_update_roundtrip(unique_direction):
    """GUI-side tuner edit propagates into the module's next tick."""

    class TModule(ModuleBase):
        def process(self, direction, image):
            pass

    source = _OneShotSource(unique_direction, n_frames=100_000)
    src_thread = threading.Thread(target=source.run_event_loop)
    src_thread.start()
    time.sleep(0.2)

    module = TModule(
        [unique_direction], [IntTuner("thresh", 128, 0, 255)], fps=100, argv=[]
    )
    with module._module_manager:
        assert module.tuners["thresh"] == 128
        reader = ModuleReader(module.name)
        with reader._all_tuners["thresh"][1] as tacc:  # accessor ctx for update
            reader._all_tuners["thresh"] = (
                reader._all_tuners["thresh"][0],
                tacc,
                reader._all_tuners["thresh"][2],
            )
            reader.update_tuner_value("thresh", 42)
            deadline = time.monotonic() + 5
            value = None
            while time.monotonic() < deadline:
                module._module_manager.read_messages()
                value = module.tuners["thresh"]
                if value == 42:
                    break
                time.sleep(0.02)
            assert value == 42

    source.quit_flag.set()
    src_thread.join(timeout=5)


def test_shm_reopen_after_create_uses_identical_offsets():
    """Regression: the creator serialized the schema sorted but computed its
    own offsets in insertion order, so any attaching process decoded the
    wrong bytes for non-alphabetical schemas. Create with a deliberately
    non-alphabetical field order, write distinctive values, then attach
    fresh Group objects (same path a second process takes) and re-read."""
    name = "test_offsets_group"
    schema = {
        "zeta": ["float", 0.0],
        "alpha": ["int", 0],
        "mike": ["string", ""],
        "beta": ["bool", False],
    }
    try:
        creator = shm.Group(name, schema)
        creator.zeta.set(3.25)
        creator.alpha.set(42)
        creator.mike.set("hello")
        creator.beta.set(True)

        attacher = shm.Group(name)  # attaches via the file header
        assert attacher.zeta.get() == pytest.approx(3.25)
        assert attacher.alpha.get() == 42
        assert attacher.mike.get() == "hello"
        assert attacher.beta.get() is True
        # and writes from the attacher land where the creator reads them
        attacher.alpha.set(7)
        assert creator.alpha.get() == 7
    finally:
        shm.delete_group(name)


def test_shm_writer_reattaches_after_schema_upgrade():
    """A schema-grow upgrade replaces the group file with a new inode;
    processes still holding the old mapping must re-attach (st_ino re-stat)
    so their writes stay visible to new readers instead of landing in the
    orphaned file forever."""
    name = "test_reattach_group"
    try:
        writer = shm.Group(name, {"v": ["int", 0]})
        writer.v.set(1)
        # another process upgrades: declared schema grew -> unlink+recreate
        upgraded = shm.Group(name, {"v": ["int", 0], "extra": ["int", 7]})
        assert upgraded.extra.get() == 7
        # the old writer's next write (after the 0.5s stat throttle) must
        # land in the NEW file
        writer._last_stat = 0.0  # bypass the throttle for the test
        writer.v.set(42)
        assert upgraded.v.get() == 42
        # and reads see the upgraded file's state too
        upgraded.v.set(9)
        writer._last_stat = 0.0
        assert writer.get().v == 9
    finally:
        shm.delete_group(name)


def test_shm_cross_process_offsets():
    """Same regression, but with a genuinely separate process attaching."""
    import subprocess
    import sys

    name = "test_xproc_group"
    schema = {"zz_last": ["float", 0.0], "aa_first": ["int", 0]}
    try:
        g = shm.Group(name, schema)
        g.zz_last.set(9.5)
        g.aa_first.set(-3)
        code = (
            "from cuauv_vision_pipeline_tpu.core import shm\n"
            f"g = shm.Group({name!r})\n"
            "assert g.zz_last.get() == 9.5, g.zz_last.get()\n"
            "assert g.aa_first.get() == -3, g.aa_first.get()\n"
            "g.aa_first.set(11)\n"
        )
        subprocess.run(
            [sys.executable, "-c", code], check=True, timeout=60,
            cwd="/root/repo",
        )
        assert g.aa_first.get() == 11
    finally:
        shm.delete_group(name)


def test_shm_schema_upgrade_replaces_stale_file(tmp_path):
    """A group file created with an older (smaller) schema is replaced on
    attach when the declared schema grew — new fields become writable
    instead of raising, and old fields keep working."""
    import json as _json
    import os
    import struct as _struct

    from cuauv_vision_pipeline_tpu.core import shm as _shm

    name = "upgrade_test_group"
    path = _shm.SHM_STUB + name
    if path in list(_shm._group_cache):
        del _shm._group_cache[path]
    # hand-craft an old-layout file with only field 'a'
    old_schema = {"a": "float"}
    blob = _json.dumps(old_schema).encode()
    with open(path, "wb") as f:
        f.write(_struct.pack(_shm._HEADER_FMT, _shm._MAGIC, 0, len(blob)))
        f.write(blob)
        f.write(_struct.pack("<d", 7.5))
    try:
        g = _shm.Group(name, {"a": "float", "b": ["int", 3]})
        assert g.get_field("b") == 3  # new field present with default
        g.set_field("b", 9)
        assert g.get_field("b") == 9
        g2 = _shm.Group(name, {"a": "float", "b": ["int", 3]})
        assert g2.get_field("b") == 9  # attacher sees the upgraded layout
    finally:
        os.unlink(path)


def test_module_reader_rediscovers_new_blocks(unique_direction):
    """Post/tune blocks created AFTER ModuleReader construction are picked
    up by the poll loop (the reference discovered only at construction,
    reference base.py:325-364)."""
    import time

    import numpy as np

    from cuauv_vision_pipeline_tpu.core.base import ModuleReader
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor

    mod = f"Fake-on-{unique_direction}"
    base = f"module_{mod}"
    img = np.zeros(16, np.uint8)
    seen = set()
    with BlockAccessor(f"{base}_post%0%first#GRAY", 64) as p0:
        p0.write_frame(1, img)
        reader = ModuleReader(mod, rediscover_every_s=0.05)
        reader.register_post_udl(lambda m, n, i, data, cs: seen.add(n))
        reader.run_forever(fps=100)
        try:
            deadline = time.monotonic() + 5
            while "first" not in seen and time.monotonic() < deadline:
                p0.write_frame(int(time.monotonic() * 1000), img)
                time.sleep(0.02)
            assert "first" in seen
            assert reader.known_posts == ["first"]
            # the module grows a new post block mid-run
            with BlockAccessor(f"{base}_post%1%second#BGR", 64) as p1:
                deadline = time.monotonic() + 5
                while "second" not in seen and time.monotonic() < deadline:
                    p1.write_frame(int(time.monotonic() * 1000), img)
                    time.sleep(0.02)
        finally:
            reader.unblock()
    assert {"first", "second"} <= seen
    assert set(reader.known_posts) == {"first", "second"}
