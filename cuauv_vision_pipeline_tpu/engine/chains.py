"""Pre-fused per-module device chains.

Each chain is ONE jittable function covering a module's whole hot loop, so
XLA fuses colorspace + threshold + morphology (+ CCL) into as few HBM passes
as possible — the TPU-native replacement for the reference's sequence of
OpenCV calls (reference modules/red_buoy.py:18-52, bins.py:10-81).
Thresholds arrive as traced scalars so tuner changes do NOT recompile.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import ccl
from ..ops import color as C
from ..ops import morphology as M
from ..ops import threshold as T


def red_buoy_chain(
    image: jnp.ndarray,
    thresh_min: jnp.ndarray,
    thresh_max: jnp.ndarray,
    max_components: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The canonical threshold+contour chain (reference modules/red_buoy.py):
    BGR -> LAB A channel -> inRange(tuners) -> open+close with a 5x5 rect
    kernel -> connected components + stats on the *un*-cleaned mask (the
    reference runs outer_contours on `threshed`, red_buoy.py:38).

    Returns (threshed, cleaned, stats-of-largest-blob).
    """
    lab = C.bgr_to_lab(image)
    a_channel = lab[..., 1]
    threshed = T.in_range(a_channel, thresh_min, thresh_max)

    kernel = M.rect_kernel(5)
    cleaned = M.open_morph(threshed, kernel)
    cleaned = M.close_morph(cleaned, kernel)

    labels = ccl.label_fast(threshed)
    stats = ccl.component_stats(labels, max_components=max_components)
    i = jnp.argmax(stats["area"])
    best = {
        "area": stats["area"][i],
        "centroid": stats["centroid"][i],
        "bbox": stats["bbox"][i],
        "found": stats["valid"][i],
    }
    return threshed, cleaned, best


def hsv_mask_chain(
    image: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    kernel_size: int = 5,
    max_components: int = 32,
):
    """HSV inRange + open + per-component stats (the bins-module shape,
    reference modules/bins.py:10-81)."""
    hsv = C.bgr_to_hsv(image)
    mask = T.in_range(hsv, lower, upper)
    cleaned = M.open_morph(mask, M.rect_kernel(kernel_size))
    labels = ccl.label_fast(cleaned)
    stats = ccl.component_stats(labels, max_components=max_components)
    return mask, cleaned, stats


def grayscale_post_chain(image: jnp.ndarray) -> jnp.ndarray:
    """BGR -> gray -> back to BGR (the yolo module's inactive-object
    fallback post, reference modules/yolo.py post_grayscale)."""
    return C.gray_to_bgr(C.bgr_to_gray(image))


class HsvMaskPipeline:
    """The bins-module hot path in the same three-dispatch structure as
    RedBuoyPipeline: HSV inRange + open morphology fused, the Pallas CCL
    kernel, then component stats (reference modules/bins.py:10-81)."""

    def __init__(self, lower, upper, kernel_size: int = 5,
                 max_components: int = 32):
        import numpy as np

        from ..ops.pallas.ccl_kernel import label_pallas

        kernel = M.rect_kernel(kernel_size)
        lower = np.asarray(lower, np.uint8)
        upper = np.asarray(upper, np.uint8)

        @jax.jit
        def mask_and_clean(image):
            hsv = C.bgr_to_hsv(image)
            mask = T.in_range(hsv, lower, upper)
            cleaned = M.open_morph(mask, kernel)
            return mask, cleaned

        @jax.jit
        def stats(labels):
            return ccl.component_stats(labels, max_components)

        self._mask_and_clean = mask_and_clean
        self._label = label_pallas
        self._stats = stats

    def run_sync(self, image):
        import numpy as np

        mask, cleaned = self._mask_and_clean(image)
        labels = self._label(cleaned)
        stats = self._stats(labels)
        return (
            np.asarray(mask),
            np.asarray(cleaned),
            jax.tree.map(np.asarray, stats),
        )


def red_buoy_fused(
    image: jnp.ndarray,
    thresh_min: jnp.ndarray,
    thresh_max: jnp.ndarray,
    max_components: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The red_buoy hot path as one fused graph with the Pallas strip-CCL
    kernel (the production variant of ``red_buoy_chain`` above, which uses
    the pure-XLA fixpoint labeler): colorspace -> inRange -> open/close
    morphology -> Pallas CCL -> blob reductions -> argmax. Stats run on the
    UN-cleaned mask: the reference runs outer_contours on `threshed`
    (reference modules/red_buoy.py:38); `cleaned` is for the debug post.
    """
    from ..ops.pallas.ccl_kernel import label_pallas

    lab = C.bgr_to_lab(image)
    threshed = T.in_range(lab[..., 1], thresh_min, thresh_max)
    if os.environ.get("CUAUV_FUSED_MORPH", "0") == "1":
        # one-HBM-pass Pallas open+close (ops/pallas/morph_kernel.py):
        # bit-exact vs the composed path (tests/test_pallas_morph.py),
        # default-off until a real-chip headline run proves it faster
        # than XLA's four reduce_windows (ROADMAP round-4 queue)
        from ..ops.pallas.morph_kernel import fused_morph

        cleaned = fused_morph(threshed, "open_close")
    else:
        kernel = M.rect_kernel(5)
        cleaned = M.close_morph(M.open_morph(threshed, kernel), kernel)
    labels = label_pallas(threshed)
    stats = ccl.component_stats(labels, max_components)
    i = jnp.argmax(stats["area"])
    best = {
        "area": stats["area"][i],
        "centroid": stats["centroid"][i],
        "bbox": stats["bbox"][i],
        "found": stats["valid"][i],
    }
    return threshed, cleaned, best


class RedBuoyPipeline:
    """The red_buoy hot path split into exactly three device dispatches.

    Per-op eager dispatch is expensive on a remote-attached TPU (tens of ms
    per call through the transport); the whole hot path is ONE cached
    executable — ``red_buoy_fused`` — with the tuner thresholds as traced
    scalars (live tuning never recompiles; the full graph compiles in ~15 s
    and is persisted in the jax compilation cache).

    Steady state on one v5e chip: 0.04-0.08 ms/frame at 1080p
    device-resident (13,000-26,000 fps across runs).
    """

    def __init__(self, max_components: int = 8):
        self._one_shot = jax.jit(
            lambda image, tmin, tmax: red_buoy_fused(
                image, tmin, tmax, max_components
            )
        )

        # NOTE: a lax.scan-of-the-chain "run N frames in one dispatch"
        # variant was tried and REMOVED: (a) without threading the carry
        # into the body XLA proves only the final iteration live and
        # deletes the rest (400 "chains" in 0.2 ms); (b) with the
        # dependence fixed, scans with the Pallas CCL while_loop inside
        # destabilize this remote-attached backend at high trip counts
        # (34 s at 400 iters, device UNAVAILABLE fault at 1600). Per-frame
        # async dispatch of this executable is the supported fast path.

        # batched lane: [B, H, W, 3] frames through ONE dispatch — the same
        # shape @device_fn(batch=K) dispatches when a module drains K queued
        # frames (core/base.py). One dispatch RPC carries B frames, so
        # transport per-dispatch overhead amortizes B-fold. lax.map (not
        # vmap): vmapping this chain multiplies component_stats' top_k
        # scoped VMEM by B — batch=8 at 1080p needs 189 MB against the
        # ~128 MB budget — while map keeps the single-frame VMEM profile
        # and amortizes the dispatch identically (trip count B is far below
        # the ~400-iter scan instability documented above).
        self._batched = jax.jit(
            lambda images, tmin, tmax: jax.lax.map(
                lambda image: red_buoy_fused(
                    image, tmin, tmax, max_components
                ),
                images,
            )
        )

    def __call__(self, image, tmin, tmax):
        """Returns (threshed, cleaned, best) as device arrays (async)."""
        threshed, cleaned, best = self.run_async(image, tmin, tmax)
        return threshed, cleaned, best

    def run_async(self, image, tmin, tmax):
        return self._one_shot(image, tmin, tmax)

    def run_async_batched(self, images, tmin, tmax):
        """[B, H, W, 3] -> per-lane (threshed, cleaned, best), one dispatch."""
        return self._batched(images, tmin, tmax)

    def run_sync(self, image, tmin, tmax):
        import numpy as np

        threshed, cleaned, best = self.run_async(image, tmin, tmax)
        return (
            np.asarray(threshed),
            np.asarray(cleaned),
            jax.tree.map(np.asarray, best),
        )

