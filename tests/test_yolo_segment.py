"""Segment-task YOLO: Proto head, on-device mask composition, ultralytics
weight mapping (incl. the ConvTranspose2d layout), and the serving surface.

The reference's ultralytics backend supports -seg checkpoints but its
modules only exercised detect/obb/pose (reference modules/yolo.py:54-55);
this pins the beyond-reference segment path end to end.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuauv_vision_pipeline_tpu.models.yolo.decode import (  # noqa: E402
    compose_masks,
    decode,
    summarize,
)
from cuauv_vision_pipeline_tpu.models.yolo.model import create_model  # noqa: E402
from cuauv_vision_pipeline_tpu.models.yolo.weights import (  # noqa: E402
    export_ultralytics_state,
    map_ultralytics_state,
)

SIZE = 128  # model square small enough for the 1-core CPU host


def test_convtranspose_layout_matches_torch():
    """The weights.py 'convT' mapping (IOHW -> HWIO + spatial flip) must
    reproduce torch's ConvTranspose2d exactly — flax's conv_transpose does
    not flip kernels, torch's conv gradient does; a wrong convention still
    round-trips import/export, so only a torch comparison pins it."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)  # NHWC
    w_t = rng.standard_normal((3, 4, 2, 2)).astype(np.float32)  # IOHW
    b = rng.standard_normal((4,)).astype(np.float32)

    yt = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w_t),
        torch.from_numpy(b),
        stride=2,
    ).numpy().transpose(0, 2, 3, 1)

    k = np.flip(np.transpose(w_t, (2, 3, 0, 1)), axis=(0, 1)).copy()
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    yf = mod.apply(
        {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(yt, np.asarray(yf), rtol=1e-5, atol=1e-5)


def test_segment_forward_shapes():
    model, variables = create_model(3, size="p", task="segment", image_size=SIZE)
    out = model.apply(variables, jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    assert out["proto"].shape == (1, SIZE // 4, SIZE // 4, 32)
    for i, s in enumerate((8, 16, 32)):
        assert out["mcoef"][i].shape == (1, SIZE // s, SIZE // s, 32)
    d = decode(out, SIZE, max_det=8)
    assert d["mask"].shape == (8, SIZE // 4, SIZE // 4)
    # decode stays jittable with the mask branch in the graph
    jitted = jax.jit(lambda o: decode(o, SIZE, max_det=8))
    d2 = jitted(out)
    np.testing.assert_allclose(
        np.asarray(d["mask"]), np.asarray(d2["mask"]), rtol=1e-6, atol=1e-6
    )


def test_compose_masks_crop_and_combination():
    """Masks are sigmoid(proto @ coef) zeroed outside the (prototype-space)
    box, matching ultralytics crop_mask's >= left/top, < right/bottom."""
    hp = 8
    proto = np.zeros((hp, hp, 2), np.float32)
    proto[..., 0] = 4.0  # saturates sigmoid -> ~1
    proto[..., 1] = -4.0
    coefs = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    # boxes in MODEL pixels; image_size 32 -> proto cell = 4 px
    boxes = np.array([[8, 8, 16, 16], [0, 0, 32, 32]], np.float32)
    m = np.asarray(
        compose_masks(jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes), 32)
    )
    # det 0: rows/cols 2..3 inside, ~sigmoid(4)
    inside = m[0, 2:4, 2:4]
    assert np.all(inside > 0.95)
    outside = m[0].copy()
    outside[2:4, 2:4] = 0
    assert np.all(outside == 0)
    # det 1: full frame, coef selects the negative prototype
    assert np.all(m[1] < 0.05)


def test_segment_pt_roundtrip_and_task_inference(tmp_path):
    """export -> torch.save -> load_checkpoint infers 'segment' (proto key
    beats the 32-wide cv4 that would read as 'pose') and decodes masks
    identical to the source model."""
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.weights import load_checkpoint

    model, variables = create_model(
        2, size="n", task="segment", image_size=SIZE
    )
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_ultralytics_state(variables, "segment").items()
    }
    path = tmp_path / "toy-seg.pt"
    torch.save(
        {"model": state, "names": {0: "a", 1: "b"}, "task": None}, str(path)
    )

    model2, variables2, meta = load_checkpoint(str(path))
    assert meta["task"] == "segment"
    assert meta["num_masks"] == 32
    assert model2.task == "segment"

    img = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (1, SIZE, SIZE, 3), np.uint8),
        jnp.float32,
    )
    d1 = decode(model.apply(variables, img), SIZE, max_det=4, conf_thresh=0.0)
    d2 = decode(model2.apply(variables2, img), SIZE, max_det=4, conf_thresh=0.0)
    for k in ("xyxy", "score", "mask"):
        np.testing.assert_allclose(
            np.asarray(d1[k]), np.asarray(d2[k]), rtol=1e-4, atol=1e-4
        )


def test_summarize_segment_polygon():
    """Segment entries carry ultralytics-summary-style segments: {x, y}
    polygons in ORIGINAL frame coordinates (letterbox undone)."""
    hp = 16
    image_size = 64
    mask = np.zeros((1, hp, hp), np.float32)
    mask[0, 4:8, 4:12] = 1.0  # a 4x8 block in prototype space
    decoded = {
        "valid": np.array([True]),
        "xyxy": np.array([[16.0, 16.0, 48.0, 32.0]]),
        "score": np.array([0.9]),
        "cls": np.array([0]),
        "mask": mask,
    }
    res = summarize(
        decoded, ["thing"], scale=(2.0, 2.0), task="segment",
        pad=(0.0, 0.0), image_size=image_size,
    )
    assert len(res) == 1
    seg = res[0]["segments"]
    assert len(seg["x"]) >= 4
    # mask pixel centers * (image_size/hp=4) * scale 2: x spans ~[36, 94]
    assert min(seg["x"]) == pytest.approx((4 + 0.5) * 4 * 2, abs=4.1)
    assert max(seg["x"]) == pytest.approx((11 + 0.5) * 4 * 2, abs=4.1)
    assert min(seg["y"]) == pytest.approx((4 + 0.5) * 4 * 2, abs=4.1)
    assert max(seg["y"]) == pytest.approx((7 + 0.5) * 4 * 2, abs=4.1)


def test_predictor_segment_serving():
    """YoloModel(task='segment') serves summary dicts with segments through
    the same jitted forward+decode path as the other tasks."""
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    m = YoloModel(
        None, task="segment", class_names=["a", "b"], size="p",
        image_size=SIZE, conf_thresh=0.0, max_det=4, half_precision=False,
    )
    img = np.random.default_rng(2).integers(
        0, 255, (SIZE, SIZE, 3), np.uint8
    )
    out = m.predict(img)
    assert isinstance(out, list)
    for entry in out:
        assert "segments" in entry
        assert set(entry["segments"]) == {"x", "y"}
        for v in entry["segments"]["x"] + entry["segments"]["y"]:
            assert np.isfinite(v)


@pytest.mark.slow
def test_segment_train_step_learns_masks():
    """A few optimizer steps on one fixed scene drive the mask loss down
    and the decoded mask toward the gt rectangle (the coefficients + proto
    branches get real gradients, not just the detect terms)."""
    import optax

    from cuauv_vision_pipeline_tpu.models.yolo.train import (
        create_train_state,
        make_train_step,
        segment_loss,
    )

    S = 64
    model, variables = create_model(1, size="p", task="segment", image_size=S)
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, S, S, 3)), jnp.float32)
    t_xyxy = jnp.asarray([[[16.0, 24.0, 48.0, 56.0]]])  # [1, 1, 4]
    t_cls = jnp.asarray([[0]], jnp.int32)
    hp = S // 4
    gt_mask = np.zeros((1, 1, hp, hp), np.float32)
    gt_mask[0, 0, 6:14, 4:12] = 1.0  # the box region on the proto grid
    t_masks = jnp.asarray(gt_mask)

    def mask_term(st):
        # train-mode apply: after a handful of steps the BN running stats
        # (momentum 0.97) still sit near init, so eval-mode outputs lag the
        # actual learning signal the step optimizes
        out, _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            img, train=True, mutable=["batch_stats"],
        )
        return float(
            segment_loss(out, t_xyxy, t_masks, t_cls >= 0, S)
        )

    before = mask_term(state)
    losses = []
    for _ in range(25):
        state, loss = step(state, img, t_xyxy, t_cls, t_masks)
        losses.append(float(loss))
    after = mask_term(state)
    assert np.isfinite(losses).all()
    assert after < before, (before, after)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_segment_multicam_batched_matches_single():
    """device_decode_multi (N cameras, one batched MXU dispatch) carries
    the mask leaves with a leading camera axis and agrees with the
    single-camera path on identical input."""
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    m = YoloModel(
        None, task="segment", class_names=["a", "b"], size="p",
        image_size=SIZE, conf_thresh=0.0, max_det=4, half_precision=False,
    )
    rng = np.random.default_rng(3)
    cam0 = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
    cam1 = rng.integers(0, 255, (SIZE // 2, SIZE, 3), np.uint8)  # letterboxed
    multi = jax.tree.map(
        np.asarray, m.device_decode_multi([jnp.asarray(cam0), jnp.asarray(cam1)])
    )
    assert multi["mask"].shape == (2, 4, SIZE // 4, SIZE // 4)
    single = jax.tree.map(np.asarray, m.device_decode(jnp.asarray(cam0)))
    np.testing.assert_allclose(
        multi["mask"][0], single["mask"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        multi["xyxy"][0], single["xyxy"], rtol=2e-4, atol=2e-3
    )
