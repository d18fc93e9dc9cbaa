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
