"""YOLO on TPU: flax model, fused decode+NMS, data classes, tracking.

Replaces the reference's ultralytics/torch dependency (reference
modules/yolo.py:7, 44-55) and reconstructs the missing ``vision.yolo.data``
/ ``vision.yolo.utils`` package (imported by yolo.py:15 and every handler
but absent from the reference tree — SURVEY.md §1 external deps).
"""

from .data import MAP_FN, OBBData, PoseData, YOLOData
from .utils import order_points

__all__ = ["MAP_FN", "OBBData", "PoseData", "YOLOData", "order_points"]
