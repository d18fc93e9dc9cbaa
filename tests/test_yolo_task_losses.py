"""Task-branch training losses: obb angle L1 and pose keypoint L1+BCE.

Each test optimizes a pico model on one fixed synthetic scene for a
handful of steps and asserts the task branch's own quality signal moves
— the branch gets real gradients, not just the shared box/cls/DFL terms.
(The trained-to-convergence numbers live in ROADMAP.md, produced by
examples/train_synthetic.py --task obb|pose.)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuauv_vision_pipeline_tpu.models.yolo.model import create_model  # noqa: E402
from cuauv_vision_pipeline_tpu.models.yolo.synth import (  # noqa: E402
    render_obb_scene,
    render_pose_scene,
    to_model_input,
)
from cuauv_vision_pipeline_tpu.models.yolo.train import (  # noqa: E402
    create_train_state,
    make_train_step,
    obb_angle_loss,
    pose_kpt_loss,
)

S = 64


def _train_mode_outputs(model, st, img):
    out, _ = model.apply(
        {"params": st.params, "batch_stats": st.batch_stats},
        img, train=True, mutable=["batch_stats"],
    )
    return out


def test_obb_scene_contract():
    rng = np.random.default_rng(0)
    img, boxes, cls, angles = render_obb_scene(rng, size=96)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    live = cls >= 0
    assert live.any()
    assert np.all(angles[live] > -np.pi / 4) and np.all(
        angles[live] < 3 * np.pi / 4
    )
    # extents encode center +- w/2, h/2 inside the frame
    assert np.all(boxes[live][:, 2] > boxes[live][:, 0])


def test_pose_scene_contract():
    rng = np.random.default_rng(1)
    img, boxes, cls, kpts = render_pose_scene(rng, size=96)
    live = cls >= 0
    assert live.any()
    k = kpts[live]
    assert np.all(k[..., 2] == 1.0)
    # center keypoint = box center; rim points at radius r
    cx = (boxes[live][:, 0] + boxes[live][:, 2]) / 2
    r = (boxes[live][:, 2] - boxes[live][:, 0]) / 2
    np.testing.assert_allclose(k[:, 0, 0], cx, atol=1e-5)
    np.testing.assert_allclose(k[:, 2, 0], cx + r, atol=1e-5)


@pytest.mark.slow
def test_obb_train_step_learns_angle():
    model, variables = create_model(1, size="p", task="obb", image_size=S)
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(2)
    img_u8, boxes, cls, angles = render_obb_scene(rng, size=S, max_objects=1)
    img = jnp.asarray(to_model_input(img_u8[None]))
    t_xyxy = jnp.asarray(boxes[None])
    t_cls = jnp.asarray(cls[None])
    t_angle = jnp.asarray(angles[None])

    def angle_term(st):
        out = _train_mode_outputs(model, st, img)
        return float(obb_angle_loss(out, t_xyxy, t_angle, t_cls >= 0))

    before = angle_term(state)
    for _ in range(25):
        state, loss = step(state, img, t_xyxy, t_cls, t_angle)
    after = angle_term(state)
    assert np.isfinite(after)
    assert after < before, (before, after)


@pytest.mark.slow
def test_pose_train_step_learns_keypoints():
    model, variables = create_model(
        1, size="p", task="pose", image_size=S, num_keypoints=5
    )
    state, tx = create_train_state(model, variables, learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(3)
    img_u8, boxes, cls, kpts = render_pose_scene(rng, size=S, max_objects=1)
    img = jnp.asarray(to_model_input(img_u8[None]))
    t_xyxy = jnp.asarray(boxes[None])
    t_cls = jnp.asarray(cls[None])
    t_kpts = jnp.asarray(kpts[None])

    def kpt_term(st):
        out = _train_mode_outputs(model, st, img)
        return float(pose_kpt_loss(out, t_xyxy, t_kpts, t_cls >= 0))

    before = kpt_term(state)
    for _ in range(25):
        state, loss = step(state, img, t_xyxy, t_cls, t_kpts)
    after = kpt_term(state)
    assert np.isfinite(after)
    assert after < before, (before, after)
