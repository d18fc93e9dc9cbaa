"""Geometric & filtering transforms, batched for TPU.

Covers the reference's transform layer (reference utils/transform.py:5-233):
Gaussian blur, resize, rotate, translate, plus warp_affine (the primitive
under rotate/translate) and decode_normal. Float paths are tolerance-matched
to OpenCV (these feed display/debug and geometry, not the bit-exact mask
contract).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .threshold import _gaussian_kernel_1d


def gaussian_blur(
    image: jnp.ndarray, kernel_size: int, sigma: float = 0.0
) -> jnp.ndarray:
    """cv2.GaussianBlur with BORDER_REFLECT_101
    (reference utils/transform.py:5-25 simple_gaussian_blur).

    u8 inputs with kernel_size <= 9 reproduce cv2.GaussianBlur bit-exactly
    (OpenCV's hardcoded binary-fraction kernels in 8-bit fixed point — the
    table extends through ksize 9). For ksize >= 11 cv2 derives kernels
    with its softdouble software-float exp and filters in private fixed
    point; without its source that sequence is not reproducible, and the
    target itself is build-dependent (IPP vs HAL dispatch). This path
    instead matches cv2.sepFilter2D(f32) with the getGaussianKernel
    formula; measured vs cv2.GaussianBlur: |d| <= 1 for ksize 11-31 on
    ~12-17% of pixels, |d| <= 2 at ksize 101 (tests pin these bounds)."""
    assert kernel_size % 2 == 1, "kernel size must be odd"
    kf = _gaussian_kernel_1d(kernel_size, sigma)
    pad = kernel_size // 2

    is_u8 = image.dtype == jnp.uint8 and kernel_size <= 9 and sigma <= 0
    if is_u8:
        ki = np.round(kf * (1 << 8)).astype(np.int32)
        k = jnp.asarray(ki, jnp.int32)
        x = image.astype(jnp.int32)
    else:
        k = jnp.asarray(kf, jnp.float32)
        x = image.astype(jnp.float32)

    chan_last = x.ndim >= 3
    nd = x.ndim
    h_axis = nd - 3 if chan_last else nd - 2
    w_axis = nd - 2 if chan_last else nd - 1

    pad_widths = [(0, 0)] * nd
    pad_widths[h_axis] = (pad, pad)
    pad_widths[w_axis] = (pad, pad)
    x = jnp.pad(x, pad_widths, mode="reflect")  # REFLECT_101

    def conv1d(arr, axis):
        n = arr.shape[axis]
        acc = None
        for i in range(kernel_size):
            sl = jax.lax.slice_in_dim(arr, i, n - (kernel_size - 1 - i), axis=axis)
            term = k[i] * sl
            acc = term if acc is None else acc + term
        return acc

    out = conv1d(conv1d(x, h_axis), w_axis)
    if is_u8:
        out = jnp.clip((out + (1 << 15)) >> 16, 0, 255)
    elif np.issubdtype(image.dtype, np.integer):
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
    return out.astype(image.dtype)


def resize(
    image: jnp.ndarray,
    dsize: Tuple[int, int],
    interpolation: str = "linear",
) -> jnp.ndarray:
    """cv2.resize semantics; dsize is (width, height) like OpenCV
    (reference utils/transform.py:167-183)."""
    out_w, out_h = dsize
    chan_last = image.ndim >= 3
    in_h = image.shape[-3] if chan_last else image.shape[-2]
    in_w = image.shape[-2] if chan_last else image.shape[-1]

    if interpolation == "nearest":
        # cv2 INTER_NEAREST: src = floor(dst * scale)
        ys = jnp.clip(
            jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32),
            0,
            in_h - 1,
        )
        xs = jnp.clip(
            jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32),
            0,
            in_w - 1,
        )
        if chan_last:
            return image[..., ys[:, None], xs[None, :], :]
        return image[..., ys[:, None], xs[None, :]]

    # INTER_LINEAR with pixel-center alignment: src = (dst+0.5)*scale - 0.5
    fy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (in_h / out_h) - 0.5
    fx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (in_w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, in_h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, in_w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    wy = jnp.clip(fy - y0.astype(jnp.float32), 0.0, 1.0)
    wx = jnp.clip(fx - x0.astype(jnp.float32), 0.0, 1.0)

    img = image.astype(jnp.float32)

    def gather(ys, xs):
        if chan_last:
            return img[..., ys[:, None], xs[None, :], :]
        return img[..., ys[:, None], xs[None, :]]

    wy_b = wy[:, None, None] if chan_last else wy[:, None]
    wx_b = wx[None, :, None] if chan_last else wx[None, :]
    top = gather(y0, x0) * (1 - wx_b) + gather(y0, x1) * wx_b
    bot = gather(y1, x0) * (1 - wx_b) + gather(y1, x1) * wx_b
    out = top * (1 - wy_b) + bot * wy_b
    if np.issubdtype(image.dtype, np.integer):
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
    return out.astype(image.dtype)


def warp_affine(
    image: jnp.ndarray,
    matrix: jnp.ndarray,
    dsize: Optional[Tuple[int, int]] = None,
    border_value: float = 0.0,
) -> jnp.ndarray:
    """cv2.warpAffine with INTER_LINEAR + BORDER_CONSTANT.

    ``matrix`` is the 2x3 forward map (dst <- src uses its inverse, computed
    here, matching cv2's default WARP semantics).
    """
    chan_last = image.ndim >= 3
    in_h = image.shape[-3] if chan_last else image.shape[-2]
    in_w = image.shape[-2] if chan_last else image.shape[-1]
    out_w, out_h = dsize if dsize is not None else (in_w, in_h)

    M = jnp.asarray(matrix, jnp.float32)
    # invert the affine map: [A|b] -> [A^-1 | -A^-1 b]
    A = M[:, :2]
    b = M[:, 2]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv_det = 1.0 / det
    Ai = (
        jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]], jnp.float32)
        * inv_det
    )
    bi = -Ai @ b

    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    sx = Ai[0, 0] * xs + Ai[0, 1] * ys + bi[0]
    sy = Ai[1, 0] * xs + Ai[1, 1] * ys + bi[1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img = image.astype(jnp.float32)

    def sample(yi, xi):
        inside = (yi >= 0) & (yi < in_h) & (xi >= 0) & (xi < in_w)
        yc = jnp.clip(yi, 0, in_h - 1)
        xc = jnp.clip(xi, 0, in_w - 1)
        if chan_last:
            vals = img[..., yc, xc, :]
            return jnp.where(inside[..., None], vals, border_value)
        vals = img[..., yc, xc]
        return jnp.where(inside, vals, border_value)

    if chan_last:
        wxe = wx[..., None]
        wye = wy[..., None]
    else:
        wxe, wye = wx, wy
    top = sample(y0i, x0i) * (1 - wxe) + sample(y0i, x0i + 1) * wxe
    bot = sample(y0i + 1, x0i) * (1 - wxe) + sample(y0i + 1, x0i + 1) * wxe
    out = top * (1 - wye) + bot * wye
    if np.issubdtype(image.dtype, np.integer):
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
    return out.astype(image.dtype)


def rotation_matrix(
    center: Tuple[float, float], angle_deg: float, scale: float = 1.0
) -> np.ndarray:
    """cv2.getRotationMatrix2D."""
    a = math.radians(angle_deg)
    alpha = scale * math.cos(a)
    beta = scale * math.sin(a)
    cx, cy = center
    return np.array(
        [
            [alpha, beta, (1 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1 - alpha) * cy],
        ],
        dtype=np.float32,
    )


def rotate(image: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
    """Rotate about the image center (reference utils/transform.py:186-200)."""
    chan_last = image.ndim >= 3
    h = image.shape[-3] if chan_last else image.shape[-2]
    w = image.shape[-2] if chan_last else image.shape[-1]
    M = rotation_matrix((w / 2.0, h / 2.0), angle_deg)
    return warp_affine(image, M)


def translate(image: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """Translate by (dx, dy) pixels (reference utils/transform.py:203-216)."""
    M = np.array([[1.0, 0.0, dx], [0.0, 1.0, dy]], dtype=np.float32)
    return warp_affine(image, M)


def decode_normal(image: jnp.ndarray) -> jnp.ndarray:
    """u8-encoded normal map -> float32 in [-1, 1]
    (reference utils/transform.py:218-233)."""
    return image.astype(jnp.float32) * (2.0 / 255.0) - 1.0


def encode_normal(normals: jnp.ndarray) -> jnp.ndarray:
    """float [-1, 1] normals -> u8 (inverse of decode_normal; used by the
    ZED postprocess path, reference capture_sources/zed.cpp:84-91)."""
    return jnp.clip(
        jnp.rint((normals + 1.0) * (255.0 / 2.0)), 0, 255
    ).astype(jnp.uint8)
