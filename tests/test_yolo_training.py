"""Training smoke: the YOLO train step reduces the loss on a fixed batch."""

import numpy as np
import pytest

import jax

from cuauv_vision_pipeline_tpu.models.yolo.model import create_model
from cuauv_vision_pipeline_tpu.models.yolo.train import (
    create_train_state,
    make_train_step,
)


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch():
    model, variables = create_model(
        num_classes=3, size="n", task="detect", image_size=64
    )
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(0)
    images = rng.random((2, 64, 64, 3)).astype(np.float32)
    t_xyxy = np.array(
        [[[8, 8, 24, 24], [32, 32, 56, 56], [0, 0, 0, 0]],
         [[16, 4, 40, 28], [0, 0, 0, 0], [0, 0, 0, 0]]],
        np.float32,
    )
    t_cls = np.array([[0, 2, -1], [1, -1, -1]], np.int32)

    losses = []
    for _ in range(12):
        state, loss = step(state, images, t_xyxy, t_cls)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses}"


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from cuauv_vision_pipeline_tpu.models.yolo.weights import (
        load_checkpoint,
        save_checkpoint,
    )

    model, variables = create_model(
        num_classes=4, size="n", task="obb", image_size=64
    )
    path = str(tmp_path / "model.msgpack")
    save_checkpoint(path, model, variables, {"names": ["a", "b", "c", "d"]})
    model2, variables2, meta = load_checkpoint(path)
    assert meta["names"] == ["a", "b", "c", "d"]
    assert model2.task == "obb"
    a = jax.tree.leaves(variables)
    b = jax.tree.leaves(variables2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
