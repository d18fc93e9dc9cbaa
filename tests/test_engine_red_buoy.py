"""End-to-end test of the fused red_buoy chain and the stream executor."""

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.capture_sources.synthetic import buoy_frame
from cuauv_vision_pipeline_tpu.engine.chains import red_buoy_chain
from cuauv_vision_pipeline_tpu.engine.executor import DevicePipeline, StreamExecutor


def test_chain_detects_synthetic_buoy():
    frame = buoy_frame((216, 384), t=0.0)
    pipe = DevicePipeline(red_buoy_chain)
    threshed, cleaned, best = pipe.run_sync(
        frame, np.int32(140), np.int32(255)
    )
    assert bool(best["found"])
    # the buoy is a red disc of radius 0.08*216 ~ 17px -> area ~ pi*r^2
    area = float(best["area"])
    assert 700 < area < 1200
    cy, cx = (float(v) for v in best["centroid"])
    # at t=0 the disc orbits to (h/2 + 0, w/2 + 0.3w)
    assert abs(cy - 216 / 2) < 3
    assert abs(cx - (384 / 2 + 0.3 * 384)) < 3
    assert threshed.dtype == np.uint8 and cleaned.dtype == np.uint8


def test_chain_matches_cv2_reference_path():
    """The fused chain equals the step-by-step OpenCV chain on the mask."""
    cv2 = pytest.importorskip("cv2")
    frame = buoy_frame((108, 192), t=1.0)
    tmin, tmax = 135, 255

    lab = cv2.cvtColor(frame, cv2.COLOR_BGR2LAB)
    ref_mask = cv2.inRange(lab[..., 1], tmin, tmax)
    k = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    ref_clean = cv2.morphologyEx(
        cv2.morphologyEx(ref_mask, cv2.MORPH_OPEN, k), cv2.MORPH_CLOSE, k
    )

    pipe = DevicePipeline(red_buoy_chain)
    threshed, cleaned, _ = pipe.run_sync(frame, np.int32(tmin), np.int32(tmax))
    np.testing.assert_array_equal(np.asarray(threshed), ref_mask)
    np.testing.assert_array_equal(np.asarray(cleaned), ref_clean)


def test_tuner_change_does_not_recompile():
    frame = buoy_frame((64, 96), t=0.0)
    pipe = DevicePipeline(red_buoy_chain)
    pipe.warmup(frame, np.int32(100), np.int32(255))
    import jax

    before = pipe._fn._cache_size()
    pipe.run_sync(frame, np.int32(10), np.int32(200))
    pipe.run_sync(frame, np.int32(77), np.int32(128))
    assert pipe._fn._cache_size() == before


def test_stream_executor_pipelines_in_order():
    pipe = DevicePipeline(lambda x: x.astype(np.float32) * 2.0)
    stream = StreamExecutor(pipe)
    outs = []
    for i in range(5):
        frame = np.full((4, 4), i, dtype=np.uint8)
        outs.extend(stream.submit((frame,), meta=i))
    outs.extend(stream.flush())
    assert [meta for _, meta in outs] == [0, 1, 2, 3, 4]
    for arr, meta in outs:
        assert (np.asarray(arr) == meta * 2.0).all()


def test_stream_executor_depth_n():
    pipe = DevicePipeline(lambda x: x.astype(np.float32) + 1.0)
    stream = StreamExecutor(pipe, depth=3)
    outs = []
    for i in range(8):
        outs.extend(stream.submit((np.full((2, 2), i, dtype=np.uint8),), meta=i))
        assert stream.pending <= 3
    # first 3 submits fill the queue; the rest each pop the oldest
    assert [meta for _, meta in outs] == [0, 1, 2, 3, 4]
    outs.extend(stream.flush())
    assert [meta for _, meta in outs] == list(range(8))
    assert stream.pending == 0


def test_stream_executor_async_fetch_ordered():
    pipe = DevicePipeline(lambda x: x.astype(np.float32) - 1.0)
    stream = StreamExecutor(pipe, depth=2, async_fetch=True)
    outs = []
    for i in range(10):
        outs.extend(stream.submit((np.full((2, 2), i, dtype=np.uint8),), meta=i))
        assert stream.pending <= 3  # depth + the one being fetched
    outs.extend(stream.flush())
    stream.close()
    assert [meta for _, meta in outs] == list(range(10))
    for arr, meta in outs:
        assert (np.asarray(arr) == meta - 1.0).all()


def test_stream_executor_poll_exception_keeps_count(monkeypatch):
    """A worker-delivered chain exception raised out of poll() must still
    decrement the in-flight count for every item popped — otherwise a later
    flush() blocks forever on _done.get() during module shutdown
    (round-2 advisor finding)."""
    import pytest

    pipe = DevicePipeline(lambda x: x.astype(np.float32))
    stream = StreamExecutor(pipe, depth=2, async_fetch=True)
    try:
        # simulate the fetch worker delivering a failure
        stream._done.put((RuntimeError("boom"), None))
        stream._n_inflight += 1
        with pytest.raises(RuntimeError, match="boom"):
            stream.poll()
        assert stream._n_inflight == 0
        assert stream.flush() == []  # must not hang
    finally:
        stream.close()


def test_stream_executor_flush_timeout_abandons_wedged_result(monkeypatch):
    """flush(timeout_s) must return instead of hanging shutdown when the
    fetch worker never delivers (wedged device/link): the result stays in
    pending for the caller to abandon."""
    import threading as _threading
    import time

    from cuauv_vision_pipeline_tpu.engine import executor as ex

    release = _threading.Event()
    monkeypatch.setattr(
        ex, "_materialize", lambda fut: (release.wait(30), fut)[1]
    )
    pipe = DevicePipeline(lambda x: x.astype(np.float32))
    stream = StreamExecutor(pipe, depth=2, async_fetch=True)
    try:
        stream.submit((np.zeros((2, 2), np.uint8),), meta=0)
        t0 = time.monotonic()
        out = stream.flush(timeout_s=0.5)
        elapsed = time.monotonic() - t0
        assert out == []
        assert stream.pending == 1  # abandoned, not lost track of
        assert elapsed < 5
    finally:
        release.set()
        stream.close()


def test_pack_unpack_result_roundtrip():
    import jax
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.engine.executor import (
        pack_result,
        unpack_result,
    )

    spec_cell = {}

    def fn(x):
        result = {
            "area": jnp.int32(2_073_600),
            "neg": jnp.int32(-7),
            "centroid": jnp.asarray([1.5, -2.25], jnp.float32),
            "found": jnp.bool_(True),
            "small": jnp.uint8(200),
            "half": jnp.float16(0.5),
            "bbox": jnp.asarray([[1, 2], [3, 4]], jnp.int32),
        }
        return pack_result(result, spec_cell)

    packed = np.asarray(jax.jit(fn)(jnp.zeros(1)))
    out = unpack_result(packed, spec_cell["spec"])
    assert out["area"] == 2_073_600 and out["area"].dtype == np.int32
    assert out["neg"] == -7
    np.testing.assert_array_equal(out["centroid"], [1.5, -2.25])
    assert bool(out["found"]) is True
    assert out["small"] == 200 and out["small"].dtype == np.uint8
    assert out["half"] == np.float16(0.5)
    np.testing.assert_array_equal(out["bbox"], [[1, 2], [3, 4]])


def test_pack_unpack_native_width_images():
    """Sub-word leaves pack at native width (4 u8 per word, zero-padded),
    so a u8 image rides the single packed fetch without 4x widening."""
    import jax
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.engine.executor import (
        pack_result,
        unpack_result,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), np.uint8)  # odd count: padding
    shorts = rng.integers(-30000, 30000, (17,), np.int16)
    halves = rng.random((9,), np.float32).astype(np.float16)
    bools = rng.random((11,)) > 0.5
    spec_cell = {}

    def fn(im, sh, hf, bl):
        return pack_result(
            {"img": im, "sh": sh, "hf": hf, "bl": bl}, spec_cell
        )

    packed = np.asarray(jax.jit(fn)(img, shorts, halves, bools))
    # native width: img words ~ ceil(n/4), not n
    n = img.size
    assert packed.size < n, f"widened? {packed.size} words for {n} u8"
    out = unpack_result(packed, spec_cell["spec"])
    np.testing.assert_array_equal(out["img"], img)
    np.testing.assert_array_equal(out["sh"], shorts)
    np.testing.assert_array_equal(out["hf"], halves)
    np.testing.assert_array_equal(out["bl"], bools)


def test_pack_unpack_f64_and_empty_leaves():
    import jax
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.engine.executor import (
        pack_result,
        unpack_result,
    )

    spec_cell = {}

    def fn(x):
        return pack_result(
            {
                "wide": jnp.asarray([1.5e300, -2.25e-100], jnp.float64)
                if jax.config.jax_enable_x64
                else jnp.asarray([1.5, -2.25], jnp.float32),
                "empty_u8": jnp.zeros((0,), jnp.uint8),
                "empty_f32": jnp.zeros((0, 4), jnp.float32),
                "scalar_bool": jnp.bool_(False),
                "x": x,
            },
            spec_cell,
        )

    packed = np.asarray(jax.jit(fn)(np.float32(3.0)))
    out = unpack_result(packed, spec_cell["spec"])
    assert out["empty_u8"].shape == (0,)
    assert out["empty_f32"].shape == (0, 4)
    assert bool(out["scalar_bool"]) is False
    assert float(out["x"]) == 3.0
    np.testing.assert_array_equal(
        out["wide"], [1.5, -2.25]
    )


def test_batched_pipeline_lane_parity():
    """RedBuoyPipeline.run_async_batched ([B,H,W,3] one vmapped dispatch —
    the @device_fn(batch=K) dispatch shape and the bench headline's batched
    lane) matches the per-frame lane exactly on every output."""
    import jax

    from cuauv_vision_pipeline_tpu.engine.chains import RedBuoyPipeline

    p = RedBuoyPipeline()
    frames = np.stack([buoy_frame((64, 96), t / 9.0) for t in range(4)])
    tmin, tmax = np.int32(130), np.int32(255)
    tb, cb, bestb = p.run_async_batched(jax.device_put(frames), tmin, tmax)
    for lane in range(4):
        t1, c1, b1 = p.run_async(jax.device_put(frames[lane]), tmin, tmax)
        np.testing.assert_array_equal(np.asarray(tb)[lane], np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(cb)[lane], np.asarray(c1))
        for k in b1:
            np.testing.assert_allclose(
                np.asarray(bestb[k])[lane], np.asarray(b1[k]), err_msg=k
            )
