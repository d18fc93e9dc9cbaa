"""Cross-camera detection merge: the mesh's collective exchange stage.

Cameras with overlapping fields of view (the zed stereo pair, forward +
downward overlap bands) each produce a fixed-shape detection list from the
per-device forward (parallel/fanout.py, modules/yolo_multicam.py). Merging
those lists is a GENUINE cross-device data dependency: every device needs
every camera's detections. One ``jax.lax.all_gather`` over the camera axis
rides ICI (SURVEY §2.8 P7 — ICI is the on-pod exchange; DCN never sees
per-frame data), then a class-aware greedy NMS in the shared coordinate
frame suppresses cross-view duplicates, keeping the highest-confidence
view of each object. Every device returns the same merged consensus list,
so any camera's host can post/act on the fleet-wide result without a
second exchange.

Detections are ``[K, 6]`` rows ``(x1, y1, x2, y2, conf, cls)`` in a SHARED
frame (callers apply their camera extrinsics first); padding rows carry
conf <= 0 and are never selected (models/yolo/decode.nms_fixed).

The single-chip twin ``cross_camera_nms`` is the same merge as one jitted
op over a stacked ``[n_cam, K, 6]`` array — modules/yolo_multicam.py uses
it behind ``CUAUV_CROSSCAM_MERGE=1`` when its cameras overlap; the mesh
form is asserted by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.yolo.decode import nms_fixed


def _merge_flat(
    flat: jnp.ndarray, iou_thresh: float, max_det: int
) -> jnp.ndarray:
    """Greedy class-aware NMS over a flat [N, 6] list -> [max_det, 6]
    (suppressed/padding rows zeroed)."""
    idx, valid = nms_fixed(
        flat[:, :4],
        flat[:, 4],
        flat[:, 5].astype(jnp.int32),
        iou_thresh=iou_thresh,
        max_det=max_det,
    )
    return jnp.where(valid[:, None], flat[jnp.maximum(idx, 0)], 0.0)


def cross_camera_nms(
    dets: jnp.ndarray, iou_thresh: float = 0.55, max_det: int = 32
) -> jnp.ndarray:
    """Single-device twin: [n_cam, K, 6] stacked per-camera lists ->
    [max_det, 6] merged consensus list."""
    return _merge_flat(dets.reshape(-1, dets.shape[-1]), iou_thresh, max_det)


def make_cross_camera_merge(
    mesh: Mesh,
    axis: str = "data",
    iou_thresh: float = 0.55,
    max_det: int = 32,
):
    """Mesh form: per-device [1, K, 6] shards -> per-device [1, max_det, 6]
    merged lists (identical content on every device). The all_gather is the
    only collective; everything after runs replicated per device, which is
    cheaper than electing a merger device and broadcasting back."""
    from jax import shard_map

    def stage(local):
        gathered = jax.lax.all_gather(local[0], axis)  # [n_cam, K, 6]
        merged = _merge_flat(
            gathered.reshape(-1, gathered.shape[-1]), iou_thresh, max_det
        )
        return merged[None]

    # check_vma=False (jax.shard_map's rename of check_rep): after the
    # all_gather every device computes on IDENTICAL data, but the NMS
    # fori_loop seeds its picked/valid carries from unvarying constants —
    # the varying-axis checker can't see that the loop output is
    # replicated-by-construction and rejects the carry. The merge's
    # replication is asserted by tests/test_parallel.py
    # (test_cross_camera_merge_collective_on_mesh: out[cam] == out[0] for
    # every device) and the multichip dryrun instead — keep both pinned
    # when jax upgrades.
    return shard_map(
        stage, mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_vma=False
    )
