"""Mesh + sharding helpers (dp over frames, tp over conv channels).

Design (SURVEY.md §2.8): the frame pipeline is embarrassingly data-parallel
across chips — each chip takes a slice of the frame batch (dp); the model
dimension shards wide conv output channels (tp) so a big detector fits and
its matmul-heavy layers split across ICI neighbors. XLA GSPMD inserts the
collectives; nothing here issues explicit psums.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With only ``n_devices`` given, all of it goes to data parallelism
    (the natural layout for frame streams)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names)


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with its leading axis split across 'data'."""
    sharding = data_parallel_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def param_shardings(mesh: Mesh, params: Any, min_channels: int = 64) -> Any:
    """Tensor-parallel rule for a conv net: shard the output-channel axis of
    large conv kernels (and matching biases/scales) over 'model'; replicate
    everything else. GSPMD propagates the activation shardings.
    """
    tp = mesh.shape["model"]

    def rule(path, leaf):
        shape = getattr(leaf, "shape", ())
        if tp <= 1 or not shape or shape[-1] < min_channels or shape[-1] % tp:
            return NamedSharding(mesh, P())
        # only conv/dense KERNELS shard over 'model'; 1-D leaves (biases,
        # BN scales/stats) stay replicated — sharding them saves nothing
        # and forces GSPMD to re-gather around every batch-norm
        names = {getattr(k, "key", getattr(k, "name", "")) for k in path}
        if len(shape) >= 2 and "kernel" in names:
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def place(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(jax.device_put, tree, shardings)
