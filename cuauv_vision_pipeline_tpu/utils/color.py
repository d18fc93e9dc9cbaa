"""Reference-compatible color API (numpy in / numpy out).

Parity target: reference utils/color.py — colorspace conversions returning
``(converted, split_channels)``, the threshold family, color-distance
thresholds, k-means color clustering, and gray-world white balance. The
conversions and u8 thresholds are the bit-exact JAX ops from ops/color.py /
ops/threshold.py, executed on the default backend.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color as C
from ..ops import threshold as T
from ._jit import cached_jit as _cached_jit

_Converted = Tuple[np.ndarray, Tuple[np.ndarray, ...]]


def _convert(fn, mat: np.ndarray) -> _Converted:
    out = np.asarray(_cached_jit(("cvt", fn.__name__), lambda: fn)(np.asarray(mat)))
    if out.ndim == 2:
        return out, (out,)
    return out, tuple(out[..., i] for i in range(out.shape[-1]))


def bgr_to_lab(mat: np.ndarray) -> _Converted:
    """BGR -> LAB, returns (lab, (l, a, b)) (reference utils/color.py:11-32)."""
    return _convert(C.bgr_to_lab, mat)


def bgr_to_hsv(mat: np.ndarray) -> _Converted:
    return _convert(C.bgr_to_hsv, mat)


def bgr_to_hls(mat: np.ndarray) -> _Converted:
    return _convert(C.bgr_to_hls, mat)


def bgr_to_ycrcb(mat: np.ndarray) -> _Converted:
    return _convert(C.bgr_to_ycrcb, mat)


def bgr_to_luv(mat: np.ndarray) -> _Converted:
    return _convert(C.bgr_to_luv, mat)


def bgr_to_gray(mat: np.ndarray) -> _Converted:
    return _convert(C.bgr_to_gray, mat)


def gray_to_bgr(mat: np.ndarray) -> _Converted:
    return _convert(C.gray_to_bgr, mat)


def lab_to_bgr(mat: np.ndarray) -> _Converted:
    return _convert(C.lab_to_bgr, mat)


def hsv_to_bgr(mat: np.ndarray) -> _Converted:
    return _convert(C.hsv_to_bgr, mat)


def color_dist(mat: np.ndarray, c: Tuple[int, int, int]) -> np.ndarray:
    """Per-pixel euclidean distance to a color (reference color.py:35-63)."""
    c = tuple(c)
    f = _cached_jit(("cdist", c), lambda: (lambda m: T.color_distance(m, c)))
    return np.asarray(f(np.asarray(mat)))


def thresh_color_distance(
    split: List[np.ndarray],
    color: Tuple[int, int, int],
    distance: float,
    auto_distance_percentile: Optional[float] = None,
    ignore_channels: List[int] = [],
    weights: Tuple[float, float, float] = (1, 1, 1),
) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted color-distance threshold over split channels
    (reference color.py:66-103)."""
    color = tuple(color)
    ignore = tuple(ignore_channels)
    weights = tuple(weights)
    f = _cached_jit(
        ("tcdist", color, float(distance), auto_distance_percentile, ignore, weights),
        lambda: (
            lambda im: T.thresh_color_distance(
                im, color, distance, auto_distance_percentile, list(ignore), weights
            )
        ),
    )
    image = np.stack([np.asarray(ch) for ch in split], axis=-1)
    mask, dists = f(image)
    return np.asarray(mask), np.asarray(dists)


def range_threshold(mat: np.ndarray, min: int, max: int) -> np.ndarray:
    """cv2.inRange (reference color.py:105-121). Bit-exact."""
    f = _cached_jit(("inrange", min, max), lambda: (lambda m: T.in_range(m, min, max)))
    return np.asarray(f(np.asarray(mat)))


def _thresh_shim(name: str, op, mat, threshold) -> np.ndarray:
    f = _cached_jit((name, threshold), lambda: (lambda m: op(m, threshold)))
    return np.asarray(f(np.asarray(mat)))


def binary_threshold(mat: np.ndarray, threshold: int) -> np.ndarray:
    return _thresh_shim("binary", T.binary, mat, threshold)


def binary_threshold_inv(mat: np.ndarray, threshold: int) -> np.ndarray:
    return _thresh_shim("binary_inv", T.binary_inv, mat, threshold)


def max_threshold(mat: np.ndarray, threshold: float) -> np.ndarray:
    return _thresh_shim("truncate", T.truncate, mat, threshold)


def above_threshold(mat: np.ndarray, threshold: float) -> np.ndarray:
    return _thresh_shim("to_zero", T.to_zero, mat, threshold)


def below_threshold(mat: np.ndarray, threshold: float) -> np.ndarray:
    return _thresh_shim("to_zero_inv", T.to_zero_inv, mat, threshold)


def otsu_threshold(mat: np.ndarray) -> Tuple[float, np.ndarray]:
    t, mask = _cached_jit(("otsu",), lambda: T.otsu)(np.asarray(mat))
    return float(t), np.asarray(mask)


def _adaptive_shim(op, mat, neighborhood_size: int, bias: float, inverse: bool):
    f = _cached_jit(
        (op.__name__, neighborhood_size, float(bias), inverse),
        lambda: (lambda m: op(m, neighborhood_size, bias, inverse=inverse)),
    )
    return np.asarray(f(np.asarray(mat)))


def adaptive_threshold_mean(
    mat: np.ndarray, neighborhood_size: int, bias: float = 0
) -> np.ndarray:
    return _adaptive_shim(T.adaptive_mean, mat, neighborhood_size, bias, False)


def adaptive_threshold_mean_inv(
    mat: np.ndarray, neighborhood_size: int, bias: float = 0
) -> np.ndarray:
    return _adaptive_shim(T.adaptive_mean, mat, neighborhood_size, bias, True)


def adaptive_threshold_gaussian(
    mat: np.ndarray, neighborhood_size: int, bias: float = 0
) -> np.ndarray:
    return _adaptive_shim(T.adaptive_gaussian, mat, neighborhood_size, bias, False)


def adaptive_threshold_gaussian_inv(
    mat: np.ndarray, neighborhood_size: int, bias: float = 0
) -> np.ndarray:
    return _adaptive_shim(T.adaptive_gaussian, mat, neighborhood_size, bias, True)


def kmeans(
    mat: np.ndarray,
    num_centeroids: int,
    iterations: int = 10,
    epsilon: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """K-means color clustering (reference color.py:295-368).

    Returns (compactness, labels[H*W], centers[k, C]) like cv2.kmeans.
    Device-side Lloyd iterations with kmeans++-free random init seeded
    deterministically (cv2 uses PP centers; cluster IDs may permute)."""
    data = np.asarray(mat).reshape(-1, mat.shape[-1] if mat.ndim == 3 else 1)
    k = num_centeroids

    def make():
        def run(data_j):
            key = jax.random.PRNGKey(0)
            idx = jax.random.choice(key, data_j.shape[0], (k,), replace=False)
            centers = data_j[idx]

            def step(centers, _):
                d = jnp.sum(
                    (data_j[:, None, :] - centers[None, :, :]) ** 2, axis=-1
                )
                labels = jnp.argmin(d, axis=-1)
                onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
                counts = onehot.sum(axis=0)
                sums = onehot.T @ data_j
                new_centers = jnp.where(
                    counts[:, None] > 0,
                    sums / jnp.maximum(counts[:, None], 1),
                    centers,
                )
                return new_centers, None

            centers, _ = jax.lax.scan(step, centers, None, length=iterations)
            d = jnp.sum((data_j[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            labels = jnp.argmin(d, axis=-1)
            compactness = jnp.sum(jnp.min(d, axis=-1))
            return compactness, labels, centers

        return run

    compactness, labels, centers = _cached_jit(("kmeans", k, iterations), make)(
        data.astype(np.float32)
    )
    return (
        float(compactness),
        np.asarray(labels).astype(np.int32).reshape(-1, 1),
        np.asarray(centers),
    )


def kmeans_mask(labels: np.ndarray, shape: Tuple[int, int], which: int) -> np.ndarray:
    """255 mask of one k-means cluster (the working version of the
    reference's partially-broken helper, reference color.py:320-322)."""
    return (labels.reshape(shape) == which).astype(np.uint8) * 255


def white_balance_bgr(mat: np.ndarray, blur_kernel: int = 0) -> np.ndarray:
    """Gray-world white balance via LAB a/b recentering
    (reference color.py:370-392)."""

    def make():
        def run(img):
            lab = C.bgr_to_lab(img).astype(jnp.float32)
            l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
            if blur_kernel and blur_kernel > 1:
                from ..ops.transform import gaussian_blur

                a_mean = gaussian_blur(a, blur_kernel | 1)
                b_mean = gaussian_blur(b, blur_kernel | 1)
            else:
                a_mean = jnp.mean(a)
                b_mean = jnp.mean(b)
            # recenter a/b toward neutral (128), scaled by luminance
            a2 = a - (a_mean - 128.0) * (l / 255.0) * 1.1
            b2 = b - (b_mean - 128.0) * (l / 255.0) * 1.1
            balanced = jnp.stack(
                [l, jnp.clip(a2, 0, 255), jnp.clip(b2, 0, 255)], axis=-1
            ).astype(jnp.uint8)
            return C.lab_to_bgr(balanced)

        return run

    return np.asarray(
        _cached_jit(("wb", int(blur_kernel)), make)(np.asarray(mat))
    )
