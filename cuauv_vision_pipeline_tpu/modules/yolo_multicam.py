#!/usr/bin/env python3
"""Multi-camera YOLO: every camera through ONE batched device dispatch.

Beyond the reference (its yolo consumed only zed[forward],
modules/yolo.py:101-165): the ZED forward eye and the FLIR (downward)
camera letterbox into one ``[2, S, S, 3]`` batch and share a single
MXU conv-stack dispatch + fused decode/NMS — two cameras for the price
of one round trip. Detections dispatch to the same six OBB handlers,
gated per camera direction ("forward" / "downward") exactly like the
reference's ``*_direction`` flags intend.

Run: ``python -m cuauv_vision_pipeline_tpu.modules.yolo_multicam zed flir``
— or ANY number of cameras, with directions as aliases
(``zed[forward] flir[downward] aux[forward]``): ``multicam_class`` builds
the N-lane chain at launch, so every added camera adds one batch lane to
the same dispatch, not another round trip.
"""

from __future__ import annotations

import os

from .yolo import HANDLERS, TUNERS, Yolo
from ..core import shm
from ..core.base import device_fn

# CUAUV_CROSSCAM_MERGE=1: append a cross-camera consensus list to the same
# dispatch — each camera's detections are un-letterboxed to its native
# normalized frame, stacked, class-aware NMS'd (co-registered rigs like
# the zed stereo pair; other rigs apply extrinsics upstream), and the
# merged [max_det, 6] list (normalized coords) rides the packed fetch. On a multi-chip mesh the same merge is the
# all_gather stage (parallel/crosscam.make_cross_camera_merge, asserted by
# __graft_entry__.dryrun_multichip).
CROSSCAM_MERGE = os.environ.get("CUAUV_CROSSCAM_MERGE", "") == "1"


def _merged_dets(decoded, cam_hw, image_size):
    """Per-camera decode output -> one consensus list.

    Boxes arrive in each camera's LETTERBOXED model frame; cameras with
    different native resolutions letterbox with different scale/pad, so
    the same physical object lands at different model-frame coords and
    cross-view suppression would misfire (round-4 advisor finding). Each
    camera's boxes are therefore un-letterboxed (scale/pad are trace-time
    constants from the static shapes) and normalized to its native
    [0,1]x[0,1] frame — for co-registered same-FOV rigs the normalized
    frames coincide regardless of resolution, and IoU is invariant under
    the normalization. Rigs that are NOT co-registered still apply
    extrinsics upstream. Merged rows are (x1, y1, x2, y2, conf, cls) in
    NORMALIZED coordinates."""
    import jax.numpy as jnp

    from ..models.yolo.model import letterbox_params
    from ..parallel.crosscam import cross_camera_nms

    xy = decoded["xyxy"]  # [n_cam, K, 4] model-frame pixels
    rows = []
    for i, (h, w) in enumerate(cam_hw):
        scale, left, top, _, _ = letterbox_params(h, w, image_size)
        b = xy[i]
        rows.append(
            jnp.stack(
                [
                    (b[:, 0] - left) / (scale * w),
                    (b[:, 1] - top) / (scale * h),
                    (b[:, 2] - left) / (scale * w),
                    (b[:, 3] - top) / (scale * h),
                ],
                axis=-1,
            )
        )
    dets = jnp.concatenate(
        [
            jnp.stack(rows),
            decoded["score"][..., None],
            decoded["cls"].astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # [n_cam, K, 6]
    return cross_camera_nms(dets)


class YoloMulticam(Yolo):
    # (alias, reference direction string) per camera, batch order
    CAMERAS = (("forward", "forward"), ("flir", "downward"))
    # post name per camera (index-matched with CAMERAS)
    POST_NAMES = ("image_forward", "image_downward")

    @device_fn("zed[forward]", "flir", depth=1, async_fetch=True)
    def detect_chain(self, fwd, flir, *, tuners, want_posts):
        """One graph: letterbox both cameras, one batched forward, fused
        decode+NMS per camera; the [2, ...] decode dict rides one packed
        fetch. (Overrides the single-camera chain from Yolo.)"""
        self._cam_hw = (fwd.shape[:2], flir.shape[:2])  # static at trace
        decoded = dict(self.model.device_decode_multi((fwd, flir)))
        if CROSSCAM_MERGE:
            decoded["crosscam_merged"] = _merged_dets(
                decoded, self._cam_hw, self.model.image_size
            )
        posts = (
            {"image_forward": fwd, "image_downward": flir}
            if want_posts
            else {}
        )
        return decoded, posts

    def on_device_result(self, decoded, posts, meta):
        from ..models.yolo.tracker import ByteTracker

        if not hasattr(self, "_cam_trackers"):  # one track space per camera
            self._cam_trackers = [ByteTracker() for _ in self.CAMERAS]
        merged = decoded.pop("crosscam_merged", None)
        if merged is not None:
            # fleet-wide consensus list (rows zeroed when suppressed);
            # kept on the instance for consumers/tests — per-camera
            # handler dispatch below is unchanged (additive surface)
            import numpy as np

            self.last_merged = np.asarray(merged)
            self.last_merged_count = int((self.last_merged[:, 4] > 0).sum())
        cam_hw = self._cam_hw
        post_names = self.POST_NAMES
        for i, (alias, direction) in enumerate(self.CAMERAS):
            cam = {k: v[i] for k, v in decoded.items()}
            results = self.model.summarize_decoded(cam, cam_hw[i])
            self._cam_trackers[i].update(results)

            image = posts.get(post_names[i])
            if image is None:
                image = self._dummy_frame(cam_hw[i])
            else:
                self.post(post_names[i], image)
            self._dispatch_detections(direction, image, results)

        self._frames_processed = getattr(self, "_frames_processed", 0) + 1
        shm.yolo_status.set(
            latency_ms=float(meta.latency_ms()),
            frames=self._frames_processed,
        )


def multicam_class(source_specs):
    """Build an N-camera YoloMulticam subclass bound to ``source_specs``
    (the CLI positional source strings): every camera letterboxes into
    the SAME single batched dispatch via ``$i`` placeholder specs, so
    adding a camera adds one lane, not one round trip. Each camera's
    reference direction string comes from its first declared alias
    (``zed[forward] flir[downward] aux[forward]``); without aliases the
    first two default to the classic forward/downward pair. Repeated
    directions get numbered post names (image_forward, image_forward2)."""
    dirs = []
    for i, spec in enumerate(source_specs):
        if "[" in spec:
            dirs.append(spec.split("[", 1)[1].split(",")[0].split("]")[0].strip())
        else:
            dirs.append("downward" if i == 1 else "forward")
    post_names, seen = [], {}
    for d in dirs:
        seen[d] = seen.get(d, 0) + 1
        post_names.append(
            f"image_{d}" if seen[d] == 1 else f"image_{d}{seen[d]}"
        )
    specs = tuple(f"${i}" for i in range(len(source_specs)))
    cameras = tuple((f"cam{i}", d) for i, d in enumerate(dirs))

    class MulticamN(YoloMulticam):
        CAMERAS = cameras
        POST_NAMES = tuple(post_names)

        @device_fn(*specs, depth=1, async_fetch=True)
        def detect_chain(self, *frames, tuners, want_posts):
            self._cam_hw = tuple(f.shape[:2] for f in frames)
            decoded = dict(self.model.device_decode_multi(frames))
            if CROSSCAM_MERGE:
                decoded["crosscam_merged"] = _merged_dets(
                    decoded, self._cam_hw, self.model.image_size
                )
            posts = (
                dict(zip(self.POST_NAMES, frames)) if want_posts else {}
            )
            return decoded, posts

    # keep the shm module name (and its post/tuner block names) stable
    # across camera counts: class names may not contain "_" (ModuleBase)
    MulticamN.__name__ = "YoloMulticam"
    MulticamN.__qualname__ = "YoloMulticam"
    return MulticamN


if __name__ == "__main__":
    import sys

    cli_sources = [a for a in sys.argv[1:] if not a.startswith("-")]
    sources = cli_sources or ["zed", "flir"]
    cls = multicam_class(sources)
    cls(video_sources=sources, tuners=TUNERS, handlers=HANDLERS)()
