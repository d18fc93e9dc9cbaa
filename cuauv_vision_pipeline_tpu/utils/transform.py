"""Reference-compatible transform API (numpy in / numpy out).

Parity target: reference utils/transform.py — Gaussian blur, structuring
elements, erode/dilate, the morphology compounds, resize/rotate/translate,
and normal-map decoding. Thin wrappers over the bit-exact JAX ops.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops import morphology as M
from ..ops import transform as X


def simple_gaussian_blur(
    mat: np.ndarray, kernel_size: int, sigma: float = 0.0
) -> np.ndarray:
    """Gaussian blur (reference utils/transform.py:5-25)."""
    return np.asarray(X.gaussian_blur(jnp.asarray(mat), kernel_size, sigma))


def rect_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """Rectangular structuring element (reference transform.py:56-77)."""
    return M.rect_kernel(size)


def elliptic_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    """Elliptical structuring element (reference transform.py:27-54)."""
    return M.ellipse_kernel(size)


def cross_kernel(size: Union[int, Tuple[int, int]]) -> np.ndarray:
    return M.cross_kernel(size)


def erode(mat: np.ndarray, kernel: np.ndarray, iterations: int = 1) -> np.ndarray:
    """cv2.erode (reference transform.py:80-95)."""
    return np.asarray(M.erode(jnp.asarray(mat), kernel, iterations))


def dilate(mat: np.ndarray, kernel: np.ndarray, iterations: int = 1) -> np.ndarray:
    """cv2.dilate (reference transform.py:98-112)."""
    return np.asarray(M.dilate(jnp.asarray(mat), kernel, iterations))


def morph_remove_noise(mat: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """MORPH_OPEN (reference transform.py:115-130)."""
    return np.asarray(M.open_morph(jnp.asarray(mat), kernel))


def morph_close_holes(mat: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """MORPH_CLOSE (reference transform.py:133-147)."""
    return np.asarray(M.close_morph(jnp.asarray(mat), kernel))


def morph_borders(mat: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """MORPH_GRADIENT (reference transform.py:150-164)."""
    return np.asarray(M.gradient(jnp.asarray(mat), kernel))


def resize(
    mat: np.ndarray, dsize: Tuple[int, int], interpolation: str = "linear"
) -> np.ndarray:
    """cv2.resize, dsize = (width, height) (reference transform.py:167-183)."""
    return np.asarray(X.resize(jnp.asarray(mat), dsize, interpolation))


def rotate(mat: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the center (reference transform.py:186-200)."""
    return np.asarray(X.rotate(jnp.asarray(mat), angle_deg))


def translate(mat: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Translate (reference transform.py:203-216)."""
    return np.asarray(X.translate(jnp.asarray(mat), dx, dy))


def decode_normal(mat: np.ndarray) -> np.ndarray:
    """u8 normal map -> float [-1, 1] (reference transform.py:218-233)."""
    return np.asarray(X.decode_normal(jnp.asarray(mat)))


def encode_normal(normals: np.ndarray) -> np.ndarray:
    """float [-1, 1] normals -> u8."""
    return np.asarray(X.encode_normal(jnp.asarray(normals)))
