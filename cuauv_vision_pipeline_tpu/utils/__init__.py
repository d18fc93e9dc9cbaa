"""Reference-compatible vision op API (color/feature/transform/draw/sift),
built on the TPU ops layer where device-friendly and numpy/PIL on host for
drawing and polyline work."""
