"""Connected-component labeling + per-blob statistics on device.

This replaces the reference's host-side ``cv2.findContours`` feature path
(reference utils/feature.py:5-40, modules/red_buoy.py:38-45): instead of
downloading the mask and tracing polygons, the mask stays on the TPU; labels
and per-component reductions (area, centroid, bbox) come back as a small
fixed-size tensor. Polyline tracing for drawing stays on host
(utils/feature.py) and is only needed for debug posts.

Algorithm (TPU-friendly, no data-dependent shapes):

1. every foreground pixel starts labeled with its own raster index;
2. iterate until fixpoint: an 8-neighborhood min (3x3 dilate-style pass to
   carry labels across diagonal links), then full row and column *run-min*
   sweeps implemented with ``associative_scan`` over (value, reset) pairs —
   one sweep propagates a label across an entire horizontal/vertical run,
   so convergence takes O(spirals) iterations (2-4 for convex-ish blobs),
   not O(image diameter);
3. the fixpoint labels each component with the raster index of its topmost-
   leftmost pixel, giving a deterministic raster ordering;
4. components are compacted to ids [0, max_components) by a cumsum over
   root indicators, and statistics are computed with segment reductions.

Related technique: coarse-to-fine / run-based parallel CCL (PAPERS.md,
arxiv 1712.09789, 2105.09658); the run-min sweep here is the 1-D run pass
expressed as an XLA scan.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# "no label" sentinel (background); > any raster index. A plain python int:
# a jnp scalar here becomes a captured device-constant argument of every
# consuming jit, which (on remote-attached backends) adds a synchronous
# host round-trip per call — measured 87 ms/frame vs 0.05 ms/frame on v5e.
_SENTINEL = 2**30


def _runmin_scan(labels: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min-propagate labels along `axis` within contiguous foreground runs.

    Uses an associative (value, reset) scan: reset marks run starts
    (background pixels), so the running min never crosses a run boundary.
    Applied forward and backward for a full within-run min.
    """

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), jnp.logical_or(ar, br)

    reset = jnp.logical_not(fg)

    fwd, _ = jax.lax.associative_scan(combine, (labels, reset), axis=axis)
    bwd, _ = jax.lax.associative_scan(
        combine, (labels, reset), axis=axis, reverse=True
    )
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, _SENTINEL)


def _neighbor_min(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """3x3 min over foreground labels (8-connectivity hop)."""
    nd = labels.ndim
    out = -jax.lax.reduce_window(
        -labels,
        -_SENTINEL,
        jax.lax.max,
        window_dimensions=(1,) * (nd - 2) + (3, 3),
        window_strides=(1,) * nd,
        padding=[(0, 0)] * (nd - 2) + [(1, 1), (1, 1)],
    )
    return jnp.where(fg, jnp.minimum(labels, out), _SENTINEL)


def propagate_min(
    values: jnp.ndarray,
    fg: jnp.ndarray,
    max_iters: int = 64,
    connectivity: int = 8,
    jump_mask: int | None = None,
) -> jnp.ndarray:
    """Min-propagate per-pixel ``values`` across connected components of
    ``fg`` (``label()`` is the ``values = raster index`` special case).

    Background pixels return the sentinel. With ``jump_mask`` set, every
    value must carry a raster index in its low bits (``v & jump_mask ==
    y*W + x`` of a pixel inside the same component); each iteration then
    adds a pointer-jumping hop — every pixel gathers the current value at
    the pixel its own value points to — which squares the propagation
    distance per pass, so snaking/diagonal structures (Canny edge chains)
    converge in O(log diameter) passes instead of O(diameter).
    """
    fg = fg != 0
    vals = jnp.where(fg, values.astype(jnp.int32), _SENTINEL)
    HW = vals.shape[-2] * vals.shape[-1]

    def jump(labels):
        flat = labels.reshape(*labels.shape[:-2], HW)
        idx = jnp.clip(flat & jump_mask, 0, HW - 1)
        got = jnp.take_along_axis(flat, idx, axis=-1)
        out = jnp.minimum(flat, got).reshape(labels.shape)
        return jnp.where(fg, out, _SENTINEL)

    def step(labels):
        if connectivity == 8:
            labels = _neighbor_min(labels, fg)
        labels = _runmin_scan(labels, fg, axis=labels.ndim - 1)
        labels = _runmin_scan(labels, fg, axis=labels.ndim - 2)
        if jump_mask is not None:
            labels = jump(labels)
        return labels

    def cond(state):
        labels, prev_changed, it = state
        return jnp.logical_and(prev_changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = step(labels)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (step(vals), jnp.bool_(True), jnp.int32(1))
    )
    return labels


def label(
    mask: jnp.ndarray,
    max_iters: int = 64,
    connectivity: int = 8,
) -> jnp.ndarray:
    """Label connected components of a binary mask.

    Args:
        mask: ``[..., H, W]`` u8/bool; nonzero = foreground.
        max_iters: fixpoint iteration cap (each iteration propagates across
            whole runs, so this bounds *spiral complexity*, not diameter).
        connectivity: 8 (cv2.findContours-compatible) or 4.

    Returns:
        int32 ``[..., H, W]``: background pixels hold a large sentinel;
        each component's pixels hold the raster index (y*W + x) of its
        first (topmost, then leftmost) pixel.
    """
    fg = mask != 0
    W = mask.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 1)
    return propagate_min(
        ys * W + xs, fg, max_iters=max_iters, connectivity=connectivity
    )


def component_stats(
    labels: jnp.ndarray,
    max_components: int = 32,
) -> Dict[str, jnp.ndarray]:
    """Per-component reductions over a label map from :func:`label`.

    Only supports unbatched ``[H, W]`` label maps (batch with ``jax.vmap``).

    TPU-first design: no scatters and no big gathers (both are slow on TPU).
    The K root labels are extracted with ``top_k`` (smallest raster indices
    = raster order), every pixel is matched to the K roots with a broadcast
    compare, and all per-component sums/extrema come from ONE masked
    reduction over the [N, K] match matrix — which XLA fuses with the
    comparison, so the matrix is never materialized in HBM.

    Returns a dict of fixed-shape arrays (components in raster order of
    their first pixel; excess components beyond ``max_components`` are
    dropped):
        count:     [] int32, number of components (clamped to capacity)
        area:      [K] int32 pixel counts
        centroid:  [K, 2] float32 (y, x) pixel-mass centroids
        bbox:      [K, 4] int32 (x, y, w, h), cv2.boundingRect convention
        first_pixel: [K] int32 raster index (the component's label value)
        valid:     [K] bool
    """
    K = max_components
    H, W = labels.shape[-2], labels.shape[-1]
    n = H * W

    fg2d = labels < _SENTINEL
    idx2d_y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    idx2d_x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    is_root2d = jnp.logical_and(fg2d, labels == idx2d_y * W + idx2d_x)

    count = jnp.sum(is_root2d.astype(jnp.int32))

    # K smallest root raster-indices, in order (top_k of the negated values).
    root_vals = jnp.where(is_root2d, labels, _SENTINEL).reshape(-1)
    neg_topk, _ = jax.lax.top_k(-root_vals, K)
    roots = -neg_topk  # ascending raster order; padding = _SENTINEL

    # Match matrix [H, W, K]: pixel belongs to component k. XLA fuses this
    # broadcast-compare into the downstream reductions.
    #
    # A hand-written Pallas strip kernel for these reductions was tried and
    # REJECTED: this op is VPU-compute-bound (~5 fused reductions over
    # H*W*K compares), and XLA's reduction emitter already runs it near
    # VPU peak (0.08 ms @1080p/K=16 on v5e); the Pallas version's
    # per-root reduce-to-scalar loops serialized 36x slower (2.9 ms).
    # Further gains here must come from shrinking K, not from a kernel.
    match = labels[..., None] == roots[None, None, :]

    ones = match.astype(jnp.float32)
    area_f = jnp.sum(ones, axis=(0, 1))
    sum_y = jnp.sum(ones * idx2d_y[..., None].astype(jnp.float32), axis=(0, 1))
    sum_x = jnp.sum(ones * idx2d_x[..., None].astype(jnp.float32), axis=(0, 1))

    # Bounding boxes from row/col projections collapsed with FLOAT sums
    # (f32 sum-reductions lower to the fast VPU path; bool any() and masked
    # int min/max over [H, W, K] measure ~150x slower on v5e), then the
    # extrema reduce tiny [H, K]/[W, K] arrays.
    big = _SENTINEL  # python int: avoid captured device constants (see top)
    row_has = jnp.sum(ones, axis=1) > 0  # [H, K]
    col_has = jnp.sum(ones, axis=0) > 0  # [W, K]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, row_has.shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, col_has.shape, 0)
    min_y = jnp.min(jnp.where(row_has, row_ids, big), axis=0)
    max_y = jnp.max(jnp.where(row_has, row_ids, -1), axis=0)
    min_x = jnp.min(jnp.where(col_has, col_ids, big), axis=0)
    max_x = jnp.max(jnp.where(col_has, col_ids, -1), axis=0)

    area = area_f.astype(jnp.int32)
    valid = jnp.logical_and(area > 0, roots < _SENTINEL)
    area = jnp.where(valid, area, 0)
    safe_area = jnp.maximum(area_f, 1.0)
    centroid = jnp.stack([sum_y / safe_area, sum_x / safe_area], axis=-1)
    bbox = jnp.stack(
        [
            jnp.where(valid, min_x, 0),
            jnp.where(valid, min_y, 0),
            jnp.where(valid, max_x - min_x + 1, 0),
            jnp.where(valid, max_y - min_y + 1, 0),
        ],
        axis=-1,
    )
    return {
        "count": jnp.minimum(count, K),
        "area": area,
        "centroid": centroid,
        "bbox": bbox,
        "first_pixel": roots,
        "valid": valid,
    }


def label_fast(mask: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Fastest available labeling: the Pallas strip kernel on TPU (~700x
    faster than the XLA fixpoint at 1080p), the XLA fixpoint otherwise.

    Batched ``[B, H, W]`` masks on TPU run as ONE kernel dispatch: the
    images are stacked vertically with a background separator row (no
    8-neighborhood can bridge it), labeled as a single tall image, and the
    tall raster labels are remapped to per-image raster indices — so
    multi-camera fan-in pays one fixpoint, not B.
    """
    if jax.default_backend() == "tpu":
        from .pallas.ccl_kernel import label_pallas, label_pallas_batched

        if mask.ndim == 2:
            return label_pallas(mask, connectivity=connectivity)
        if mask.ndim == 3:
            return label_pallas_batched(mask, connectivity=connectivity)
    return label(mask, connectivity=connectivity)


@partial(jax.jit, static_argnames=("max_components", "connectivity"))
def connected_components_with_stats(
    mask: jnp.ndarray,
    max_components: int = 32,
    connectivity: int = 8,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """label_fast() + component_stats() in one jitted graph ([H, W] masks)."""
    labels = label_fast(mask, connectivity=connectivity)
    return labels, component_stats(labels, max_components)


def largest_component(
    mask: jnp.ndarray, connectivity: int = 8
) -> Dict[str, jnp.ndarray]:
    """Stats of the largest blob (the red_buoy fast path:
    centroid/area of the most likely contour, reference
    modules/red_buoy.py:40-50). Jit-compatible; returns scalars."""
    _, stats = connected_components_with_stats(
        mask, max_components=32, connectivity=connectivity
    )
    i = jnp.argmax(stats["area"])
    return {
        "area": stats["area"][i],
        "centroid": stats["centroid"][i],
        "bbox": stats["bbox"][i],
        "found": stats["valid"][i],
    }
