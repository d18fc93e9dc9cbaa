"""The TPU execution engine.

Bridges the host frame bus and the device: staging buffers, async dispatch,
software pipelining (H2D of frame N+1 overlaps compute of frame N — the
TPU-native successor of the reference's double-buffered ZED pipeline,
reference capture_sources/zed.py:129-253), and pre-fused per-module chains.
"""

from .executor import DevicePipeline, StreamExecutor
from . import chains

__all__ = ["DevicePipeline", "StreamExecutor", "chains"]
