"""Multi-chip streaming fan-out: N cameras -> N chips, one dispatch.

The reference scales by pinning each vision module process to one GPU
(reference core/module_toggler.py:78-127 + per-process device selection);
the TPU-native equivalent offers both:

* process-level pinning — ``ModuleBase --device N`` / the toggler's
  ``module_devices`` vehicle-config map place whole module processes on
  specific chips;
* SPMD fan-out (this module) — ONE process shard_maps the whole detection
  chain over a device mesh, each chip running the full chain on its own
  camera's frame with zero collectives and one XLA dispatch for the fleet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import ccl
from ..ops import color as C
from ..ops import morphology as M
from ..ops import threshold as T


def chain_one(frame: jnp.ndarray, tmin: jnp.ndarray, tmax: jnp.ndarray):
    """Full red_buoy chain on ONE [H, W, 3] frame (engine/chains.py), using
    the pure-XLA labeler (shard_map-friendly on every backend)."""
    kernel = M.rect_kernel(5)
    mask = T.in_range(C.bgr_to_lab(frame)[..., 1], tmin, tmax)
    cleaned = M.close_morph(M.open_morph(mask, kernel), kernel)
    labels = ccl.label_fast(cleaned > 0)
    stats = ccl.component_stats(labels, max_components=8)
    best = jnp.argmax(stats["area"])
    return {
        "area": stats["area"][best],
        "centroid": stats["centroid"][best],
        "bbox": stats["bbox"][best],
    }


def make_fanout(mesh, axis: str = "data"):
    """jit(shard_map(chain_one)) — each device gets one camera's frame.

    Input: frames [n_cameras, H, W, 3] sharded over ``axis``; output: blob
    stats [n_cameras, ...] with the same sharding.
    """

    def per_device(frames, tmin, tmax):
        # block shape [1, H, W, 3]: this device's single camera
        return jax.tree.map(lambda x: x[None], chain_one(frames[0], tmin, tmax))

    fan = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return jax.jit(fan)
