"""Small array helpers.

Parity target: reference utils/helpers.py — odd-size helpers and the
UMat/Mat conversions. The reference used OpenCV's T-API UMat for optional
GPU offload (reference helpers.py:31-68); in the TPU rebuild the device
array type is jax.Array, so ``to_umat``/``from_umat`` map host numpy <->
device jax arrays with the same call shape.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def next_odd(n: int) -> int:
    """Smallest odd integer >= n (kernel sizes must be odd)."""
    n = int(n)
    return n if n % 2 == 1 else n + 1


def make_odd(n: int) -> int:
    return next_odd(n)


def to_umat(mat: np.ndarray) -> jax.Array:
    """Host array -> device array (the UMat analog: compute-resident)."""
    return jnp.asarray(mat)


def from_umat(mat: Union[jax.Array, np.ndarray]) -> np.ndarray:
    """Device array -> host numpy array."""
    return np.asarray(mat)


def as_mat(mat: Union[jax.Array, np.ndarray]) -> np.ndarray:
    """Anything -> host numpy array (reference helpers.py as_mat)."""
    return np.asarray(mat)
