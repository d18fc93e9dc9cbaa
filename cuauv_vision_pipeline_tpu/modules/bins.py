#!/usr/bin/env python3
"""Bin detector: beige HSV mask -> morphology -> minAreaRect + SIFT pose.

Parity target: reference modules/bins.py:10-81 — HSV inRange for the beige
background, overlay visualization, open-morphology denoise, outer contours,
minAreaRect candidates filtered by area > 500 and aspect ratio in [1, 3],
all drawn on the overlay. BASELINE config 3 adds "pose estimation with
utils/feature + sift" (reference utils/sift.py:14-142): set
``CUAUV_BINS_POSE_TEMPLATE`` to an image path (or ``builtin`` for the
synthetic bin texture) and each frame is SIFT-matched against the template
— descriptor matching and RANSAC consensus on the MXU — with the projected
quad written to ``shm.bins_pose``.

TPU re-design: HSV mask + open morphology + the 0.7/0.3 overlay blend run
as ONE device graph on the module's @device_fn fast path (pipelined, one
packed fetch per frame); contour tracing + rotated rectangles stay on host
where they feed drawing only. With pose enabled the grayscale frame rides
the same packed fetch for the host-side keypoint detector.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.base import ModuleBase, device_fn
from ..utils.draw import Color, draw_polylines
from ..utils.feature import min_enclosing_rect, outer_contours

LOWER_BEIGE = np.array([10, 20, 60], np.uint8)
UPPER_BEIGE = np.array([30, 100, 255], np.uint8)


def box_points(rect) -> np.ndarray:
    """cv2.boxPoints equivalent for our min_enclosing_rect tuples."""
    import math

    (cx, cy), (w, h), angle = rect
    rad = math.radians(angle)
    c, s = math.cos(rad), math.sin(rad)
    hw, hh = w / 2.0, h / 2.0
    pts = []
    for dx, dy in ((-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)):
        pts.append((cx + dx * c - dy * s, cy + dx * s + dy * c))
    return np.array(pts, np.float32)


def _load_template(spec: str) -> np.ndarray:
    if spec == "builtin":
        from ..capture_sources.synthetic import bin_texture

        return np.asarray(bin_texture())
    from PIL import Image

    return np.asarray(Image.open(spec).convert("RGB"))[..., ::-1]  # BGR


class BinDetector(ModuleBase):
    # class default so chain-only instances (bench, tests) skip pose
    _pose_sift = None

    @classmethod
    def prewarm(cls, shape=(720, 1280, 3), log=None):
        """AOT-compile the bins chain — including the in-chain SIFT pose
        graphs when ``CUAUV_BINS_POSE_TEMPLATE`` is set (the template
        descriptors are trace-time constants, so the cache entry is
        template-specific) — into the shared persistent cache
        (engine/prewarm.py). ``SIFT.warm`` inside ``_init_pose`` also
        compiles the host-side match/score buckets."""
        from ..engine.prewarm import prewarm_chain

        mod = cls.__new__(cls)
        mod._init_pose()
        return prewarm_chain(
            cls, shape, tuners=(), want_posts=(True,), module=mod, log=log
        )

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._init_pose()

    def _init_pose(self) -> None:
        """Build the SIFT pose path when ``CUAUV_BINS_POSE_TEMPLATE`` is
        set (shared by the live module and :meth:`prewarm`)."""
        template_spec = os.environ.get("CUAUV_BINS_POSE_TEMPLATE", "")
        if template_spec:
            from ..ops.color_np import bgr_to_gray_np
            from ..utils.sift import SIFT

            # "device" (default): keypoints + descriptors computed INSIDE
            # the bins chain (ops/feature.detect_describe) and shipped on
            # the packed fetch — no host cv2.SIFT pass (236 ms/frame at
            # 720p measured) and no gray-frame fetch. "cv2" restores the
            # reference's exact detector (reference utils/sift.py:24-30).
            self._pose_detector = os.environ.get(
                "CUAUV_SIFT_DETECTOR", "device"
            )
            template = _load_template(template_spec)
            self._pose_sift = SIFT(detector=self._pose_detector)
            kp_t, _ = self._pose_sift.add_source(
                "bin", bgr_to_gray_np(template)
            )
            if self._pose_sift.sources["bin"]["des_prep"] is None:
                # featureless template: the host path degrades gracefully
                # (match_with_features' <2-descriptors guard) but the
                # device chain would dereference des_prep — disable pose
                # loudly instead of dying on the first frame
                from ..core.log import log

                log.vision.modules.bins(
                    f"pose template {template_spec!r} yielded "
                    f"{len(kp_t)} keypoint(s); pose estimation DISABLED "
                    "(need >= 2 — use a textured template)",
                    True,
                )
                self._pose_sift = None
                return
            # compile every match/score bucket NOW: a lazy bucket compile
            # mid-loop (match count crossing a power of 2) stalls the loop
            # for the remote-compile latency and has deadlocked against
            # the chain executor's in-flight dispatch (see SIFT.warm)
            self._pose_sift.warm(
                scene_max_keypoints=0
                if self._pose_detector == "device"
                else 1024
            )
            from ..core import shm

            shm.bins_pose.set(visible=False, matches=0, inliers=0, seq_frames=0)

    @device_fn("*", depth=1, async_fetch=True)
    def bins_chain(self, img, *, tuners, want_posts):
        """HSV inRange + open morphology + the reference's 0.7/0.3 overlay
        blend as one device graph; one packed fetch carries the cleaned
        mask (for host contours), the overlay image, and — when SIFT pose
        is on — the grayscale frame for the keypoint detector."""
        import jax.numpy as jnp

        from ..ops import color as C
        from ..ops import morphology as M
        from ..ops import threshold as T

        hsv = C.bgr_to_hsv(img)
        mask = T.in_range(hsv, LOWER_BEIGE, UPPER_BEIGE)
        cleaned = M.open_morph(mask, M.rect_kernel(5))
        result = {"cleaned": cleaned}
        if self._pose_sift is not None:  # trace-time constant
            gray = C.bgr_to_gray(img)
            if self._pose_detector == "device":
                # keypoint detect + describe + template 2-NN match all in
                # the SAME dispatch as the mask (ops/feature.detect_describe
                # + utils/sift.device_match_topk with the template closed
                # into the graph): the packed fetch carries keypoints [K,2]
                # + top-2 buffers (~6 KB) instead of the 921 KB gray frame
                # a host detector needs; host work is ratio test + RANSAC
                from ..ops.feature import detect_describe
                from ..utils.sift import device_match_topk

                kp, des, n = detect_describe(gray)
                d2, idx = device_match_topk(
                    self._pose_sift.sources["bin"]["des_prep"], des, n
                )
                result["kp"] = kp
                result["pose_d2"] = d2
                result["pose_idx"] = idx
            else:
                result["gray"] = gray
        posts = {}
        if want_posts:
            # overlay = 0.7*img + 0.3*mask_bgr (the reference's viz)
            blend = (
                img.astype(jnp.float32) * jnp.float32(0.7)
                + mask[..., None].astype(jnp.float32) * jnp.float32(0.3)
            )
            posts["overlay"] = blend.astype(jnp.uint8)
        return result, posts

    def on_device_result(self, result, posts, meta):
        cleaned = result["cleaned"]
        valid_rects = []
        for contour in outer_contours(cleaned):
            rect = min_enclosing_rect(contour)
            (_, (w, h), _) = rect
            if w * h < 500 or min(w, h) == 0:
                continue
            aspect = max(w, h) / min(w, h)
            if 1.0 <= aspect <= 3.0:
                valid_rects.append(rect)

        pose_quad = None
        if self._pose_sift is not None and (
            "gray" in result or "pose_d2" in result
        ):
            pose_quad = self._estimate_pose(result, meta)

        overlayed = posts.get("overlay")
        if overlayed is not None:
            if not overlayed.flags.writeable:  # packed-fetch views are RO
                overlayed = overlayed.copy()
            for rect in valid_rects:
                pts = box_points(rect).astype(np.int32)
                draw_polylines(overlayed, [pts], True, Color.GREEN, 4)
            if pose_quad is not None:
                draw_polylines(
                    overlayed, [pose_quad.astype(np.int32)], True, Color.RED, 3
                )
            self.post("bins", overlayed)

    def _estimate_pose(self, result, meta):
        """SIFT template match -> homography quad -> shm.bins_pose."""
        from ..core import shm

        grp = shm.bins_pose
        if "pose_d2" in result:  # device detector: match rode the fetch
            matches = self._pose_sift.match_device_topk(
                "bin",
                result["pose_d2"],
                result["pose_idx"],
                np.asarray(result["kp"]),
                min_match=8,
            )
        else:
            matches = self._pose_sift.match(
                np.asarray(result["gray"]), min_match=8
            )
        # ONE group write (= one seq bump) per frame: bench config 3 counts
        # pose results as seq changes, so a second write would double-count
        seq_frames = grp.seq_frames.get() + 1
        if not matches:
            grp.set(visible=False, seq_frames=seq_frames)
            return None
        m = matches[0]
        quad = np.asarray(m["quad"], np.float64)
        grp.set(
            visible=True,
            seq_frames=seq_frames,
            matches=m["matches"],
            inliers=m["inliers"],
            quad_x1=quad[0, 0],
            quad_y1=quad[0, 1],
            quad_x2=quad[1, 0],
            quad_y2=quad[1, 1],
            quad_x3=quad[2, 0],
            quad_y3=quad[2, 1],
            quad_x4=quad[3, 0],
            quad_y4=quad[3, 1],
            center_x=float(quad[:, 0].mean()),
            center_y=float(quad[:, 1].mean()),
            latency_ms=float(meta.latency_ms()),
        )
        return quad


if __name__ == "__main__":
    BinDetector(video_sources=["forward"], tuners=[])()
