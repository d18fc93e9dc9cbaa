"""Cached jax.jit wrappers for the numpy-in / numpy-out utils shims.

The utils layer mirrors the reference's cv2-call API: host arrays in, host
arrays out. Executing the underlying ops graphs eagerly costs a per-op
dispatch-compile cascade — ~50 ms/op on a cold CPU backend and ~87 ms/op
through a tunnel-attached TPU — so every shim routes through ONE fused jit
per parameter set instead (parameters like kernel sizes, thresholds-as-
constants, or structuring-element bytes are part of the cache key because
they are trace-time constants of the ops).
"""

from __future__ import annotations

from typing import Callable

_JITS: dict = {}


def cached_jit(key: tuple, make: Callable[[], Callable]):
    """Return (building once) the jitted callable for ``key``.

    ``make`` is only invoked on a cache miss and must return the function to
    jit; closures over host constants (kernels, thresholds) are the intended
    pattern. jax.jit itself re-specializes per input shape/dtype, so one
    entry serves all image sizes.
    """
    fn = _JITS.get(key)
    if fn is None:
        import jax

        fn = jax.jit(make())
        _JITS[key] = fn
    return fn
