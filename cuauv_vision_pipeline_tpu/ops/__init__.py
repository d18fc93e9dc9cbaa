"""Batched JAX/Pallas vision ops — the TPU compute substrate.

Every per-pixel loop in the reference's OpenCV chain (reference utils/ and
modules/) maps to a batched, jit-compatible function here. All functions take
arrays shaped ``[..., H, W, C]`` (leading batch dims optional) and compose
freely under ``jax.jit``; the u8 paths reproduce OpenCV's fixed-point
semantics bit-exactly (verified exhaustively over the 256^3 color cube in
tests/test_ops_color.py).
"""
