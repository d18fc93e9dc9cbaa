"""Classify-task YOLO: cls backbone head, -cls.pt weight mapping (Dense
layout), serving surface, and training.

Beyond the reference (its modules consume detect/obb/pose only, reference
modules/yolo.py:54-55); completes the ultralytics v8 task family so any
published yolov8*-cls.pt drops in.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuauv_vision_pipeline_tpu.models.yolo.model import create_model  # noqa: E402
from cuauv_vision_pipeline_tpu.models.yolo.weights import (  # noqa: E402
    export_ultralytics_state,
    map_ultralytics_state,
)

SIZE = 96


@pytest.mark.slow
def test_classify_forward_and_roundtrip():
    model, variables = create_model(7, size="p", task="classify", image_size=SIZE)
    out = model.apply(variables, jnp.zeros((2, SIZE, SIZE, 3), jnp.float32))
    assert out["logits"].shape == (2, 7)

    state = export_ultralytics_state(variables, "classify")
    assert "model.9.linear.weight" in state
    assert state["model.9.linear.weight"].shape == (7, 1280)
    # no detect-head or neck keys may leak into a cls export
    assert not any(k.startswith("model.22.") for k in state)
    assert not any(k.startswith("model.12.") for k in state)

    zeroed = jax.tree.map(lambda a: np.zeros_like(a), variables)
    v2, rep = map_ultralytics_state(state, zeroed, "classify")
    assert rep["missing"] == 0 and rep["mismatched"] == 0
    ok = all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(v2), jax.tree.leaves(variables))
    )
    assert ok


def test_classify_pt_inference_and_serving(tmp_path):
    torch = pytest.importorskip("torch")
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.models.yolo.weights import load_checkpoint

    model, variables = create_model(3, size="n", task="classify", image_size=SIZE)
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_ultralytics_state(variables, "classify").items()
    }
    path = tmp_path / "toy-cls.pt"
    torch.save({"model": state, "names": {0: "fish", 1: "rock", 2: "kelp"}}, str(path))

    model2, variables2, meta = load_checkpoint(str(path))
    assert meta["task"] == "classify"
    assert model2.num_classes == 3

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, SIZE, SIZE, 3), np.uint8),
        jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, img)["logits"]),
        np.asarray(model2.apply(variables2, img)["logits"]),
        rtol=1e-4, atol=1e-4,
    )

    # serving surface: top-k summary entries, probabilities sum to 1
    m = YoloModel(str(path), image_size=SIZE, half_precision=False)
    assert m.task == "classify"
    frame = np.random.default_rng(1).integers(0, 255, (SIZE, SIZE, 3), np.uint8)
    out = m.predict(frame)
    assert 0 < len(out) <= 5
    assert out[0]["confidence"] >= out[-1]["confidence"]  # sorted desc
    assert {e["name"] for e in out} <= {"fish", "rock", "kelp"}
    total = sum(e["confidence"] for e in out)
    assert total == pytest.approx(1.0, abs=1e-3)
    # .track must not feed whole-frame labels to the box tracker
    res = m.track(frame)
    assert res[0].summary() == m.predict(frame)


@pytest.mark.slow
def test_classify_train_step_learns():
    import optax

    from cuauv_vision_pipeline_tpu.models.yolo.train import (
        create_train_state,
        make_train_step,
    )

    S = 64
    model, variables = create_model(4, size="p", task="classify", image_size=S)
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(0)
    # 4 fixed scenes, one per label: constant-color frames
    images = jnp.asarray(
        np.stack([np.full((S, S, 3), v, np.float32) for v in (0.1, 0.4, 0.7, 0.9)])
    )
    labels = jnp.arange(4, dtype=jnp.int32)
    losses = []
    for _ in range(20):
        state, loss = step(state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
