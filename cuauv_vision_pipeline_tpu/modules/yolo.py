#!/usr/bin/env python3
"""YOLO detection module: device inference -> class buckets -> OBB handlers.

Parity target: reference modules/yolo.py:38-237 — loads a weight (the
reference hardcodes obb_v14.pt and picks cpu/cuda by CUAUV_LOCALE,
yolo.py:44-55; here the weight path comes from $CUAUV_YOLO_WEIGHT or
defaults, and inference always runs on the TPU as one jitted
forward+decode+NMS graph), maps each detection via MAP_FN, buckets
detections per handler class, gates on shm.active_objects flags and
per-detector direction, and dispatches to the registered handlers —
torpedoes AND the slalom/gate/gate_behind/bins/manipulator handlers the
reference scaffolded but left commented out (yolo.py:131-233) are all live
here.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Union

import numpy as np

from ..core import shm, tuners
from ..core.base import ModuleBase, device_fn
from ..core.handlers import HandlerMixin
from ..handlers.bins import BinsOBB
from ..handlers.gate import GateOBB
from ..handlers.gate_behind import GateBehindOBB
from ..handlers.manipulator import ManipulatorOBB
from ..handlers.slalom import SlalomOBB
from ..handlers.torpedoes import TorpedoesOBB
from ..models.yolo.data import MAP_FN, OBBData, PoseData, SegmentData, YOLOData
from ..models.yolo.predictor import YoloModel

DEFAULT_WEIGHT = os.environ.get("CUAUV_YOLO_WEIGHT", "obb_v14.msgpack")

HANDLERS = [
    TorpedoesOBB("torpedoes"),
    SlalomOBB("slalom"),
    GateOBB("gate"),
    GateBehindOBB("gate_behind"),
    BinsOBB("bins"),
    ManipulatorOBB("manipulator"),
]

TUNERS = [
    tuners.DoubleTuner("torpedo_threshold", 0.1, 0, 1),
    tuners.DoubleTuner("slalom_threshold", 0.0, 0, 1),
    tuners.DoubleTuner("gate_threshold", 0.1, 0, 1),
    tuners.DoubleTuner("gate_behind_threshold", 0.7, 0, 1),
    tuners.DoubleTuner("bins_threshold", 0.4, 0, 1),
    tuners.DoubleTuner("manipulator_threshold", 0.4, 0, 1),
]

DetectionData = Union[YOLOData, OBBData, PoseData, SegmentData]

# detector -> (class names it consumes, handler arg order)
DETECTORS: Dict[str, List[str]] = {
    "torpedoes": ["torpedo_board", "shark_hole", "saw_hole"],
    "slalom": ["pole_red", "pole_white"],
    "gate": ["shark", "saw"],
    "gate_behind": ["gate_behind"],
    "bins": ["bin_shark", "bin_saw", "bin"],
    "manipulator": ["spoon", "cup", "pink_basket", "yellow_basket"],
}

_ACTIVE_FLAG = {
    "torpedoes": "yolo_torpedoes_board",
    "slalom": "yolo_slalom",
    "gate": "yolo_gate",
    "gate_behind": "yolo_gate_behind",
    "bins": "yolo_bins",
    "manipulator": "yolo_manipulator",
}


class Yolo(ModuleBase, HandlerMixin):
    @classmethod
    def prewarm(cls, shape=(720, 1280, 3), weight=None, log=None):
        """AOT-compile the detect chain for one frame shape + weight set
        into the shared persistent cache (engine/prewarm.py).

        The chain closes the model variables into the graph, so the cache
        entry is weight-specific: pass the SAME ``weight`` path the
        spawned module will resolve (default: the module's own
        ``DEFAULT_WEIGHT`` / random-init fallback, which is seed-
        deterministic and therefore byte-identical across processes)."""
        import warnings

        from ..engine.prewarm import prewarm_chain

        mod = cls.__new__(cls)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            mod.model = YoloModel(weight or DEFAULT_WEIGHT, task="obb")
        return prewarm_chain(
            cls,
            shape,
            tuners=TUNERS,
            want_posts=(True,),
            module=mod,
            log=log,
        )

    def __init__(self, video_sources, tuners, handlers, weight=None, **kwargs):
        ModuleBase.__init__(self, video_sources, tuners, **kwargs)
        HandlerMixin.__init__(self, handlers)

        self.weight_path = weight or DEFAULT_WEIGHT
        # an EXPLICITLY configured weight that is missing must fail fast —
        # a typo'd CUAUV_YOLO_WEIGHT would otherwise serve random-init
        # detections while the module looks healthy (frames/latency in
        # shm.yolo_status keep updating). The un-set default path still
        # falls back (dev machines run random weights on purpose).
        explicit = weight is not None or bool(os.environ.get("CUAUV_YOLO_WEIGHT"))
        if explicit and not os.path.exists(self.weight_path):
            raise FileNotFoundError(
                f"configured YOLO weight '{self.weight_path}' does not exist "
                f"(weight arg / CUAUV_YOLO_WEIGHT)"
            )
        self.model = YoloModel(self.weight_path, task="obb")
        self.model.to("tpu")  # parity shim; jax owns placement
        self.yolo_model_type = self.model.task
        if self.yolo_model_type not in MAP_FN:
            raise ValueError(
                f"weight '{self.weight_path}' is a '{self.yolo_model_type}' "
                f"model; the detection modules consume box-producing tasks "
                f"({sorted(MAP_FN)}). Whole-frame classifiers serve via "
                f"YoloModel.predict instead."
            )
        self.map_fn: Callable[[dict], DetectionData] = MAP_FN[self.yolo_model_type]

        print("YOLO MODEL INITIALIZED:")
        print(f"weight: \t{self.weight_path}")
        print(f"device: \t{'tpu (jax default)'}")
        print(f"model type: \t{self.yolo_model_type}")

    @staticmethod
    def _active(detector: str) -> bool:
        return bool(shm.active_objects.get_field(_ACTIVE_FLAG[detector]))

    @staticmethod
    def _direction_matches(detector: str, direction: str) -> bool:
        return (
            shm.active_objects.get_field(f"{_ACTIVE_FLAG[detector]}_direction")
            == direction
        )

    # depth=1: the detection headline is LATENCY (<5 ms p50 target); with
    # async_fetch the fetch of frame N still overlaps the H2D+compute of
    # frame N+1, so depth 1 keeps full throughput on the fetch-bound path
    # while holding only one frame of queueing delay (depth 2 adds a whole
    # extra fetch interval of latency for no throughput gain).
    # CUAUV_YOLO_BATCH=K (default 1) turns on queue-depth batching: when
    # the module falls behind, up to K drained frames run as ONE K-batch
    # conv stack. Measured (device_step_yolo_batch8 in bench.py): batch=8
    # costs ~2x per-frame device compute (0.375 -> 0.747 ms — at 640^2 the
    # convs already fill the MXU at batch 1), but the tick drains K frames
    # per device round trip, so it multiplies e2e throughput wherever the
    # round trip dominates the step (high-RTT links). Keep 1 on PCIe-class
    # hosts. vmap mode: no VMEM-hungry custom call in this chain, and map
    # would serialize the convs.
    # CUAUV_YOLO_LATEST_ONLY=M instead drops stale frames beyond a
    # backlog of M (the reference's latest-wins, cmf.cpp:423).
    # "*": bind to the FIRST source's first-arriving alias — the zed
    # 4-plane layout binds its forward plane, and single-plane cameras
    # (a gatecam mp4 replay, a flir, an image directory) bind their only
    # plane, so the module serves ANY camera named on the command line
    # (the reference module's direction-agnostic contract, reference
    # modules/yolo.py:101-116; a fixed "zed[forward]" spec silently
    # never fired on single-plane sources).
    @device_fn(
        "*",
        depth=1,
        async_fetch=True,
        batch=int(os.environ.get("CUAUV_YOLO_BATCH", "1")),
        latest_only_backlog=(
            int(os.environ["CUAUV_YOLO_LATEST_ONLY"])
            if os.environ.get("CUAUV_YOLO_LATEST_ONLY")
            else None
        ),
    )
    def detect_chain(self, image, *, tuners, want_posts):
        """Forward + DFL decode + NMS as one device graph; the fixed-shape
        decode dict rides back in a single packed fetch. Host keeps the
        tracker, class bucketing, and handlers (on_device_result)."""
        import jax.numpy as jnp  # deferred: keep module import host-only

        decoded = dict(self.model.device_decode(image))
        h, w = image.shape[:2]
        decoded["orig_h"] = jnp.int32(h)
        decoded["orig_w"] = jnp.int32(w)
        posts = {"image": image} if want_posts else {}
        return decoded, posts

    def on_device_result(self, decoded, posts, meta):
        direction = "forward"
        h = int(decoded.pop("orig_h"))
        w = int(decoded.pop("orig_w"))
        results = self.model.summarize_decoded(decoded, (h, w))
        self.model._tracker.update(results)

        image = posts.get("image")
        if image is None:  # performance mode: handlers never post, so a
            image = self._dummy_frame((h, w))  # cached stand-in suffices
        else:
            self.post("original image", image)

        self._dispatch_detections(direction, image, results)

        # camera-to-detection telemetry: seq on this group counts processed
        # frames; latency covers capture -> bus -> H2D -> infer -> handlers
        self._frames_processed = getattr(self, "_frames_processed", 0) + 1
        lat = float(meta.latency_ms())
        fields = dict(
            latency_ms=lat,
            frames=self._frames_processed,
            lanes=len(meta.lane_acqs) if meta.lane_acqs else 1,
        )
        if meta.newest:
            fields["latency_newest_ms"] = lat
            # one bump per device round trip (this is the dispatch's final
            # lane): frames/dispatches = exact mean drain depth
            self._dispatches = getattr(self, "_dispatches", 0) + 1
            fields["dispatches"] = self._dispatches
        shm.yolo_status.set(**fields)

    def _dummy_frame(self, hw) -> np.ndarray:
        cached = getattr(self, "_dummy", None)
        if cached is None or cached.shape[:2] != hw:
            self._dummy = np.zeros((*hw, 3), np.uint8)
        return self._dummy

    def _dispatch_detections(self, direction, image, results) -> None:
        buckets: Dict[str, Dict[str, List[DetectionData]]] = {
            det: {cls: [] for cls in classes}
            for det, classes in DETECTORS.items()
            if self._active(det)
        }
        for result in results:
            data = self.map_fn(result)
            for det, classes in DETECTORS.items():
                if data.name in classes and det in buckets:
                    buckets[det][data.name].append(data)
                    break

        for det, classes in DETECTORS.items():
            if not self._direction_matches(det, direction):
                continue
            if self._active(det):
                args = [buckets[det][cls] for cls in classes]
                # handlers annotate their copy; in performance mode nothing
                # draws or posts, so skip the 2.7 MB copy too
                frame = image if self._performance_enabled else image.copy()
                self.handlers[det].process(direction, frame, *args)
            elif not self._performance_enabled:
                self.handlers[det].post_grayscale(image)


if __name__ == "__main__":
    Yolo(video_sources=["zed"], tuners=TUNERS, handlers=HANDLERS)()
