"""Morphological ops, batched for TPU, bit-exact vs OpenCV.

Covers the reference's morphology layer (reference utils/transform.py:27-164):
structuring elements (rect/ellipse/cross), erode/dilate, and the OPEN/CLOSE/
GRADIENT compounds used by every threshold-based module
(e.g. reference modules/red_buoy.py:32-35).

Design: rectangular kernels lower to ``lax.reduce_window`` (XLA emits a
separable sliding min/max); arbitrary 0/1 kernels lower to a static stack of
shifted slices reduced with min/max — both fuse cleanly on TPU. Border
semantics match cv2's default BORDER_CONSTANT with the morphology identity
(+inf for erode, -inf for dilate), i.e. out-of-image pixels never win.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

KernelLike = Union[np.ndarray, Tuple[int, int], int]


def rect_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """All-ones structuring element (cv2.MORPH_RECT)."""
    if isinstance(size, int):
        size = (size, size)
    return np.ones(size, dtype=np.uint8)


def ellipse_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """Elliptical structuring element matching cv2.getStructuringElement
    (cv2.MORPH_ELLIPSE)'s rasterization."""
    if isinstance(size, int):
        size = (size, size)
    rows, cols = size
    # cv2's algorithm: per row, horizontal span from the ellipse equation.
    r = rows // 2
    c = cols // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((rows, cols), dtype=np.uint8)
    for i in range(rows):
        j1, j2 = 0, 0
        dy = i - r
        if abs(dy) <= r:
            if r == 0:
                dx = c
            else:
                dx = int(round(c * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, cols)
        kernel[i, j1:j2] = 1
    return kernel


def cross_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """Cross-shaped structuring element (cv2.MORPH_CROSS)."""
    if isinstance(size, int):
        size = (size, size)
    rows, cols = size
    kernel = np.zeros((rows, cols), dtype=np.uint8)
    kernel[rows // 2, :] = 1
    kernel[:, cols // 2] = 1
    return kernel


def _as_kernel(kernel: KernelLike) -> np.ndarray:
    if isinstance(kernel, (int, tuple)):
        return rect_kernel(kernel)
    return np.asarray(kernel)


def _morph_rect(image: jnp.ndarray, kh: int, kw: int, is_erode: bool) -> jnp.ndarray:
    """Full-rectangle kernel via reduce_window (identity-padded borders)."""
    if np.issubdtype(image.dtype, np.integer):
        info = jnp.iinfo(image.dtype)
        init = info.max if is_erode else info.min
    else:
        init = jnp.inf if is_erode else -jnp.inf
    op = jax.lax.min if is_erode else jax.lax.max
    nd = image.ndim
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    return jax.lax.reduce_window(
        image,
        jnp.array(init, image.dtype),
        op,
        window_dimensions=(1,) * (nd - 2) + (kh, kw),
        window_strides=(1,) * nd,
        padding=[(0, 0)] * (nd - 2)
        + [(pad_h, kh - 1 - pad_h), (pad_w, kw - 1 - pad_w)],
    )


def _morph_mask(image: jnp.ndarray, kernel: np.ndarray, is_erode: bool) -> jnp.ndarray:
    """Arbitrary 0/1 kernel via a static reduction over shifted slices."""
    kh, kw = kernel.shape
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    if np.issubdtype(image.dtype, np.integer):
        info = jnp.iinfo(image.dtype)
        fill = info.max if is_erode else info.min
    else:
        fill = jnp.inf if is_erode else -jnp.inf
    nd = image.ndim
    pad_widths = [(0, 0)] * (nd - 2) + [
        (pad_h, kh - 1 - pad_h),
        (pad_w, kw - 1 - pad_w),
    ]
    padded = jnp.pad(image, pad_widths, constant_values=fill)
    H, W = image.shape[-2], image.shape[-1]

    out = None
    reduce = jnp.minimum if is_erode else jnp.maximum
    for dy in range(kh):
        for dx in range(kw):
            if not kernel[dy, dx]:
                continue
            window = padded[..., dy : dy + H, dx : dx + W]
            out = window if out is None else reduce(out, window)
    assert out is not None, "empty structuring element"
    return out


def _morph(image: jnp.ndarray, kernel: KernelLike, is_erode: bool,
           iterations: int = 1) -> jnp.ndarray:
    k = _as_kernel(kernel)
    assert k.ndim == 2, "structuring element must be 2-D"
    full = bool(k.all())
    out = image
    for _ in range(max(1, iterations)):
        if full:
            out = _morph_rect(out, k.shape[0], k.shape[1], is_erode)
        else:
            out = _morph_mask(out, k, is_erode)
    return out


def erode(image: jnp.ndarray, kernel: KernelLike, iterations: int = 1) -> jnp.ndarray:
    """cv2.erode (reference utils/transform.py:80-95)."""
    return _morph(image, kernel, is_erode=True, iterations=iterations)


def dilate(image: jnp.ndarray, kernel: KernelLike, iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate (reference utils/transform.py:98-112)."""
    return _morph(image, kernel, is_erode=False, iterations=iterations)


def open_morph(image: jnp.ndarray, kernel: KernelLike) -> jnp.ndarray:
    """cv2.MORPH_OPEN = erode then dilate (noise removal,
    reference utils/transform.py:115-130)."""
    return dilate(erode(image, kernel), kernel)


def close_morph(image: jnp.ndarray, kernel: KernelLike) -> jnp.ndarray:
    """cv2.MORPH_CLOSE = dilate then erode (hole filling,
    reference utils/transform.py:133-147)."""
    return erode(dilate(image, kernel), kernel)


def gradient(image: jnp.ndarray, kernel: KernelLike) -> jnp.ndarray:
    """cv2.MORPH_GRADIENT = dilate - erode (borders,
    reference utils/transform.py:150-164)."""
    d = dilate(image, kernel).astype(jnp.int32)
    e = erode(image, kernel).astype(jnp.int32)
    return jnp.clip(d - e, 0, 255).astype(image.dtype)
