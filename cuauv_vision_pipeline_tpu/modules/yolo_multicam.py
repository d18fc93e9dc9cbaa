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
"""

from __future__ import annotations

from .yolo import HANDLERS, TUNERS, Yolo
from ..core import shm
from ..core.base import device_fn


class YoloMulticam(Yolo):
    # (alias, reference direction string) per camera, batch order
    CAMERAS = (("forward", "forward"), ("flir", "downward"))

    @device_fn("zed[forward]", "flir", depth=1, async_fetch=True)
    def detect_chain(self, fwd, flir, *, tuners, want_posts):
        """One graph: letterbox both cameras, one batched forward, fused
        decode+NMS per camera; the [2, ...] decode dict rides one packed
        fetch. (Overrides the single-camera chain from Yolo.)"""
        self._cam_hw = (fwd.shape[:2], flir.shape[:2])  # static at trace
        decoded = dict(self.model.device_decode_multi((fwd, flir)))
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
        cam_hw = self._cam_hw
        post_names = ("image_forward", "image_downward")
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


if __name__ == "__main__":
    YoloMulticam(video_sources=["zed", "flir"], tuners=TUNERS, handlers=HANDLERS)()
