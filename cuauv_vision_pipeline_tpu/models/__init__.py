"""JAX model families (currently: YOLO detect/OBB/pose)."""
