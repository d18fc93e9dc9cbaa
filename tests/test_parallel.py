"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuauv_vision_pipeline_tpu.parallel import (
    data_parallel_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(8, dp=4, tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(8, dp=3, tp=2)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    batch = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.is_equivalent_to(
        data_parallel_sharding(mesh), ndim=2
    )
    np.testing.assert_array_equal(np.asarray(sharded), batch)


def test_param_shardings_rule():
    mesh = make_mesh(8, dp=4, tp=2)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 128))},  # wide: tp-sharded
        "small": {"kernel": jnp.zeros((3, 3, 4, 8))},  # narrow: replicated
    }
    shardings = param_shardings(mesh, params, min_channels=64)
    assert shardings["conv"]["kernel"].spec == P(None, None, None, "model")
    assert shardings["small"]["kernel"].spec == P()


def test_dp_frame_fanout_mask_chain():
    """The P2 fan-out story: a batch of frames sharded over 8 devices runs
    the mask chain data-parallel; results match the single-device path."""
    from cuauv_vision_pipeline_tpu.ops import color as C
    from cuauv_vision_pipeline_tpu.ops import threshold as T

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 32, 48, 3), dtype=np.uint8)

    def chain(batch):
        lab = C.bgr_to_lab(batch)
        return T.in_range(lab[..., 1], 120, 255)

    sharded = shard_batch(mesh, frames)
    with mesh:
        out_spec = NamedSharding(mesh, P("data"))
        fn = jax.jit(chain, out_shardings=out_spec)
        out = np.asarray(fn(sharded))

    ref = np.asarray(jax.jit(chain)(frames))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_tp_sharded_yolo_forward():
    """Tensor-parallel conv channels: the YOLO forward under a (2, 4) mesh
    produces the same outputs as unsharded."""
    from cuauv_vision_pipeline_tpu.models.yolo.model import create_model

    mesh = make_mesh(8, dp=2, tp=4)
    model, variables = create_model(
        num_classes=3, size="n", task="detect", image_size=64
    )
    x = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)

    ref = jax.jit(lambda v, x: model.apply(v, x))(variables, x)

    p_shard = param_shardings(mesh, variables, min_channels=32)
    sharded_vars = jax.tree.map(jax.device_put, variables, p_shard)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        out = jax.jit(lambda v, x: model.apply(v, x))(sharded_vars, xs)

    for key in ("box", "cls"):
        for a, b in zip(ref[key], out[key]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


@pytest.mark.slow
def test_shard_map_full_chain_fanout():
    """Module fan-out (parallel/fanout.py): the FULL detection
    chain — morphology + CCL + blob stats, not just the mask — runs per
    device under shard_map; each camera's result matches the single-image
    chain exactly."""
    import jax.numpy as jnp
    from cuauv_vision_pipeline_tpu.parallel.fanout import chain_one, make_fanout

    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:48, 0:64]
    for cam in range(8):
        disc = (yy - 10 - 3 * cam) ** 2 + (xx - 12 - 5 * cam) ** 2 < 36
        frames[cam][disc] = (40, 40, 220)

    tmin = jnp.asarray(140, jnp.uint8)
    tmax = jnp.asarray(255, jnp.uint8)
    sharded = jax.device_put(frames, NamedSharding(mesh, P("data")))
    with mesh:
        out = jax.tree.map(np.asarray, make_fanout(mesh)(sharded, tmin, tmax))

    single = jax.jit(chain_one)
    for cam in range(8):
        ref = jax.tree.map(np.asarray, single(frames[cam], tmin, tmax))
        assert out["area"][cam] == ref["area"], cam
        np.testing.assert_allclose(out["centroid"][cam], ref["centroid"])
        np.testing.assert_array_equal(out["bbox"][cam], ref["bbox"])
        assert out["area"][cam] > 20  # the disc was actually found


def test_cross_camera_nms_single_device():
    """Stacked per-camera lists merge to one consensus list: cross-view
    duplicates suppressed keeping the highest-confidence view, unique
    objects all kept, padding (conf<=0) never selected."""
    from cuauv_vision_pipeline_tpu.parallel.crosscam import cross_camera_nms

    dets = np.zeros((3, 4, 6), np.float32)
    for cam in range(3):
        dets[cam, 0] = (50, 50, 90, 90, 0.5 + 0.1 * cam, 0)  # shared object
        dets[cam, 1] = (200 + 30 * cam, 10, 212 + 30 * cam, 22, 0.8, 1)
    merged = np.asarray(cross_camera_nms(jnp.asarray(dets), max_det=8))
    kept = merged[merged[:, 4] > 0]
    assert len(kept) == 4  # 1 shared + 3 unique
    shared = kept[kept[:, 5] == 0]
    assert len(shared) == 1
    np.testing.assert_allclose(shared[0, 4], 0.7, atol=1e-6)


def test_cross_camera_merge_collective_on_mesh():
    """The mesh form: each device's consensus output contains boxes ONLY
    other devices held (all_gather over the camera axis) and is identical
    on every device."""
    from jax.sharding import Mesh

    from cuauv_vision_pipeline_tpu.parallel.crosscam import (
        make_cross_camera_merge,
    )

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    dets = np.zeros((n, 2, 6), np.float32)
    for cam in range(n):
        dets[cam, 0] = (10, 10, 30, 30, 0.4 + 0.05 * cam, 0)
        dets[cam, 1] = (40 * cam, 100, 40 * cam + 16, 116, 0.9, 1)
    merge = make_cross_camera_merge(mesh, max_det=16)
    out = np.asarray(
        merge(jax.device_put(dets, NamedSharding(mesh, P("data"))))
    )
    assert out.shape == (n, 16, 6)
    for cam in range(1, n):
        np.testing.assert_array_equal(out[cam], out[0])
    kept = out[0][out[0][:, 4] > 0]
    assert len(kept) == n + 1
    # cam0 could not have produced the other cameras' unique boxes alone
    assert kept[:, 0].max() >= 40 * (n - 1)


def test_multicam_merge_unletterboxes_mixed_resolutions():
    """The single-chip consensus twin must suppress the SAME physical
    object seen by cameras of DIFFERENT native resolutions: boxes arrive
    in each camera's letterboxed model frame (different scale/pad), so a
    raw-coordinate merge would keep both copies (round-4 advisor
    finding). _merged_dets un-letterboxes into normalized [0,1] frames
    first."""
    from cuauv_vision_pipeline_tpu.models.yolo.model import letterbox_params
    from cuauv_vision_pipeline_tpu.modules.yolo_multicam import _merged_dets

    S = 640
    cam_hw = ((720, 1280), (600, 800))  # zed 720p + flir 600p
    # one shared object at the same NORMALIZED position in both views,
    # plus one unique object in camera 1
    # near the top of frame, where the two letterbox pads diverge most
    # (16:9 pads y by 140/640, 4:3 by 80/640 at S=640)
    shared_n = (0.05, 0.05, 0.20, 0.20)  # x1, y1, x2, y2 normalized
    unique_n = (0.70, 0.60, 0.80, 0.75)

    def to_model(box_n, hw):
        h, w = hw
        scale, left, top, _, _ = letterbox_params(h, w, S)
        x1, y1, x2, y2 = box_n
        return (
            x1 * w * scale + left,
            y1 * h * scale + top,
            x2 * w * scale + left,
            y2 * h * scale + top,
        )

    K = 4
    xyxy = np.zeros((2, K, 4), np.float32)
    score = np.zeros((2, K), np.float32)
    cls = np.zeros((2, K), np.int32)
    xyxy[0, 0] = to_model(shared_n, cam_hw[0])
    score[0, 0] = 0.6
    xyxy[1, 0] = to_model(shared_n, cam_hw[1])
    score[1, 0] = 0.9
    xyxy[1, 1] = to_model(unique_n, cam_hw[1])
    score[1, 1] = 0.8
    cls[1, 1] = 1

    # sanity: the two model-frame copies of the shared object do NOT
    # overlap enough to merge raw (different letterbox scale/pad)
    a, b = xyxy[0, 0], xyxy[1, 0]
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    iou_raw = inter / (area(a) + area(b) - inter)
    assert iou_raw < 0.55, "fixture must exercise the scale/pad divergence"

    decoded = {
        "xyxy": jnp.asarray(xyxy),
        "score": jnp.asarray(score),
        "cls": jnp.asarray(cls),
    }
    merged = np.asarray(_merged_dets(decoded, cam_hw, S))
    kept = merged[merged[:, 4] > 0]
    assert len(kept) == 2, f"expected shared+unique, got {kept}"
    shared = kept[kept[:, 5] == 0]
    assert len(shared) == 1
    # highest-confidence view survives, coords normalized
    np.testing.assert_allclose(shared[0, 4], 0.9, atol=1e-6)
    np.testing.assert_allclose(shared[0, :4], shared_n, atol=0.02)
