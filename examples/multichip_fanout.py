#!/usr/bin/env python3
"""Multi-chip module fan-out: N cameras -> N chips, one dispatch.

The reference scales by pinning each vision module process to one GPU
(reference module_toggler + per-process CUDA devices); the TPU-native
equivalent keeps ONE process and shard_maps the whole detection chain over
a device mesh — each chip runs the full red_buoy chain (LAB -> inRange ->
morphology -> connected components -> blob stats) on its own camera's
frame, with zero collectives (the work is embarrassingly parallel) and one
XLA dispatch for the whole fleet.

Run on real hardware, or demo on N virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_fanout.py --cameras 8 --size 128

On a v5e-8 each chip sustains the same per-chip fps as the single-chip
bench (the chains never talk), so throughput scales linearly with chips.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
    # re-assert so the virtual-device demo actually runs on host CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cuauv_vision_pipeline_tpu.parallel.fanout import make_fanout
from cuauv_vision_pipeline_tpu.parallel.mesh import make_mesh


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cameras", type=int, default=len(jax.devices()))
    ap.add_argument("--size", type=int, default=1080)
    ap.add_argument("--rounds", type=int, default=100)
    args = ap.parse_args(argv)

    n = args.cameras
    H = args.size
    W = args.size * 16 // 9
    mesh = make_mesh(n)
    print(f"mesh: {n} x {jax.devices()[0].platform} over axis 'data'")

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n, H, W, 3), dtype=np.uint8)
    r = max(6, min(H, W) // 12)
    yy, xx = np.mgrid[0:H, 0:W]
    for cam in range(n):  # one red disc per camera, different spots
        y = r + 2 + (cam * 7 * r) % (H - 2 * r - 4)
        x = r + 2 + (cam * 13 * r) % (W - 2 * r - 4)
        disc = (yy - y) ** 2 + (xx - x) ** 2 < r**2
        frames[cam][disc] = (40, 40, 220)

    sharded = jax.device_put(frames, NamedSharding(mesh, P("data")))
    tmin = jnp.asarray(140, jnp.uint8)
    tmax = jnp.asarray(255, jnp.uint8)

    fan = make_fanout(mesh)
    out = fan(sharded, tmin, tmax)  # compile
    jax.block_until_ready(out)

    # Time BEFORE any host readback: on remote-attached backends (axon) the
    # first output fetch permanently drops the client out of pipelined
    # dispatch — every later call pays per-dispatch RPC latency (measured
    # ~1 ms plain jit / ~87 ms shard_map vs 0.03-0.05 ms pipelined).
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        out = fan(sharded, tmin, tmax)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.rounds

    out = jax.tree.map(np.asarray, out)
    for cam in range(n):
        cy, cx = out["centroid"][cam]
        print(
            f"cam{cam}: area={out['area'][cam]:6d} "
            f"centroid=({cy:7.1f},{cx:7.1f}) bbox={out['bbox'][cam].tolist()}"
        )
    print(
        f"{n} cameras/chips: {dt * 1e3:.3f} ms/round = "
        f"{n / dt:,.0f} aggregate fps ({1 / dt:,.0f} fps/chip)"
    )


if __name__ == "__main__":
    main()
