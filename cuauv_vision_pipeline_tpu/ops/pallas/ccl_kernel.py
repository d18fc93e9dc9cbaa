"""Pallas TPU kernel for connected-component labeling.

Why a kernel: the pure-XLA fixpoint in ops/ccl.py re-reads the full label
map from HBM on every associative-scan step (~26 ms per 1080p frame). This
kernel instead pulls a full-width strip of rows into VMEM once and iterates
the propagation *in VMEM* to a local fixpoint (segmented Hillis-Steele
run-min scans along rows and columns, 3x3 neighbor min for 8-connectivity)
— one HBM read + one HBM write per strip per *global* iteration, with
global iterations bounded by the strip-graph diameter (2-3 for real masks).

Two-level scheme (strip-local solve + iterated boundary merge) follows the
block-based parallel CCL literature (PAPERS.md: arxiv 1708.08180,
2105.09658), re-shaped for the TPU memory hierarchy: strips = VMEM tiles,
merge = halo rows re-read from HBM each global pass (Jacobi-style).

Label convention matches ops/ccl.label: each component's pixels carry the
raster index (y*W + x) of its topmost-leftmost pixel; background carries a
large sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = 2**30  # python int: pallas kernels cannot capture array constants

STRIP_ROWS = 32  # rows per grid program (one halo row above and below); VMEM-sized


# NOTE: all shifted arrays are int32 — Mosaic cannot lane-shift i1 vregs,
# so run-break flags travel as 0/1 int32.


def _shift_cols_k(arr, k: int, forward: bool, fill: int = _SENTINEL):
    filler = jnp.full((arr.shape[0], k), fill, arr.dtype)
    if forward:  # bring values from smaller column indices
        return jnp.concatenate([filler, arr[:, :-k]], axis=1)
    return jnp.concatenate([arr[:, k:], filler], axis=1)


def _shift_rows_k(arr, k: int, forward: bool, fill: int = _SENTINEL):
    filler = jnp.full((k, arr.shape[1]), fill, arr.dtype)
    if forward:
        return jnp.concatenate([filler, arr[:-k]], axis=0)
    return jnp.concatenate([arr[k:], filler], axis=0)


def _neighbor_min8(lbl: jnp.ndarray) -> jnp.ndarray:
    up = _shift_rows_k(lbl, 1, forward=False)
    dn = _shift_rows_k(lbl, 1, forward=True)
    best_v = jnp.minimum(lbl, jnp.minimum(up, dn))
    left = _shift_cols_k(best_v, 1, forward=False)
    right = _shift_cols_k(best_v, 1, forward=True)
    return jnp.minimum(best_v, jnp.minimum(left, right))


def _neighbor_min4(lbl: jnp.ndarray) -> jnp.ndarray:
    up = _shift_rows_k(lbl, 1, forward=False)
    dn = _shift_rows_k(lbl, 1, forward=True)
    lf = _shift_cols_k(lbl, 1, forward=False)
    rt = _shift_cols_k(lbl, 1, forward=True)
    return jnp.minimum(lbl, jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt)))


def _segmented_runmin(lbl: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min within contiguous fg runs along `axis` (both directions),
    segmented Hillis-Steele over static power-of-two shifts (VMEM-local)."""
    size = lbl.shape[axis]
    shift = _shift_cols_k if axis == 1 else _shift_rows_k

    def one_direction(val, brk, forward: bool):
        k = 1
        while k < size:
            shifted_v = shift(val, k, forward)
            shifted_b = shift(brk, k, forward, fill=1)
            val = jnp.where(brk > 0, val, jnp.minimum(val, shifted_v))
            brk = jnp.maximum(brk, shifted_b)
            k *= 2
        return val

    brk0 = jnp.where(fg, 0, 1).astype(jnp.int32)
    fwd = one_direction(lbl, brk0, forward=True)
    bwd = one_direction(lbl, brk0, forward=False)
    return jnp.minimum(fwd, bwd)


def _make_kernel(connectivity: int, max_local_iters: int):
    def kernel(
        mask_ref, mtop_ref, mbot_ref, lbl_ref, ltop_ref, lbot_ref,
        out_ref, chg_ref,
    ):
        # halo refs are 8-row tiles (TPU tiling minimum); only row 0 is real
        fg = (
            jnp.concatenate(
                [mtop_ref[0:1], mask_ref[:], mbot_ref[0:1]], axis=0
            )
            != 0
        )
        raw = jnp.concatenate(
            [ltop_ref[0:1], lbl_ref[:], lbot_ref[0:1]], axis=0
        )
        lbl0 = jnp.where(fg, raw, _SENTINEL)

        nb = _neighbor_min8 if connectivity == 8 else _neighbor_min4

        def step(lbl):
            lbl = jnp.where(fg, nb(lbl), _SENTINEL)
            lbl = _segmented_runmin(lbl, fg, axis=1)
            lbl = _segmented_runmin(lbl, fg, axis=0)
            return lbl

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_local_iters)

        def body(state):
            lbl, _, it = state
            new = step(lbl)
            changed = jnp.sum((new != lbl).astype(jnp.int32)) > 0
            return new, changed, it + 1

        lbl, _, _ = jax.lax.while_loop(
            cond, body, (step(lbl0), jnp.bool_(True), jnp.int32(1))
        )

        core = lbl[1:-1]
        chg_ref[0, 0, 0] = jnp.sum((core != lbl0[1:-1]).astype(jnp.int32))
        out_ref[:] = core

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "max_global_iters", "interpret"),
)
def label_pallas(
    mask: jnp.ndarray,
    connectivity: int = 8,
    max_global_iters: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas-accelerated drop-in for ops.ccl.label on [H, W] masks.

    Runs in interpret mode automatically off-TPU (tests run it on the CPU
    backend; results are identical, just slow).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    H, W = mask.shape
    S = STRIP_ROWS
    Wp = int(np.ceil(W / 128) * 128)
    Hp = int(np.ceil(H / S) * S)
    n_strips = Hp // S

    mask_p = jnp.zeros((Hp, Wp), jnp.int32).at[:H, :W].set(
        (mask != 0).astype(jnp.int32)
    )
    fg = mask_p != 0
    ys = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    init = jnp.where(fg, ys * Wp + xs, _SENTINEL)

    kernel = _make_kernel(connectivity, max_local_iters=S + 4)

    zero_row = jnp.zeros((1, Wp), jnp.int32)
    sent_row = jnp.full((1, Wp), _SENTINEL, jnp.int32)

    def halos(arr, fill_row):
        """Rows above / below each strip, expanded to 8-row tiles so the
        halo block shape satisfies the TPU (8, 128) tiling minimum."""
        top = jnp.concatenate([fill_row, arr[S - 1 :: S][: n_strips - 1]], 0)
        bot = jnp.concatenate([arr[S::S][: n_strips - 1], fill_row], 0)
        return jnp.repeat(top, 8, axis=0), jnp.repeat(bot, 8, axis=0)

    mtop, mbot = halos(mask_p, zero_row)

    strip_spec = pl.BlockSpec((S, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((8, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def call(labels):
        ltop, lbot = halos(labels, sent_row)
        out, chg = pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=[
                strip_spec, halo_spec, halo_spec,
                strip_spec, halo_spec, halo_spec,
            ],
            out_specs=[
                strip_spec,
                pl.BlockSpec(
                    (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
                jax.ShapeDtypeStruct((n_strips, 1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(mask_p, mtop, mbot, labels, ltop, lbot)
        return out, jnp.sum(chg)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed > 0, it < max_global_iters)

    def body(state):
        labels, _, it = state
        new, changed = call(labels)
        return new, changed, it + 1

    first, chg = call(init)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, chg, jnp.int32(1)))

    # Un-pad and remap root raster indices from padded to true width
    # (monotone in (y, x), so component ordering is preserved).
    core = labels[:H, :W]
    ly = core // Wp
    lx = core % Wp
    return jnp.where(core < _SENTINEL, ly * W + lx, _SENTINEL)


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "max_global_iters", "interpret"),
)
def label_pallas_batched(
    mask: jnp.ndarray,
    connectivity: int = 8,
    max_global_iters: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[B, H, W] labeling as ONE kernel dispatch (multi-camera fan-in).

    Images are stacked vertically with one background separator row (no
    8-neighborhood crosses it), labeled as a single tall image, and the
    tall raster labels are remapped to per-image raster indices — exactly
    the values per-image :func:`label_pallas` would produce, for one
    fixpoint instead of B.
    """
    B, H, W = mask.shape
    GAP = 1  # one background row fully separates 8-connectivity
    padded = jnp.pad(
        (mask != 0).astype(jnp.int32), ((0, 0), (0, GAP), (0, 0))
    )
    tall = padded.reshape(B * (H + GAP), W)
    lab = label_pallas(
        tall,
        connectivity=connectivity,
        max_global_iters=max_global_iters,
        interpret=interpret,
    )
    # tall raster -> per-image raster: strip the b*(H+GAP) row bias
    ly = lab // W
    lx = lab % W
    local = (ly % (H + GAP)) * W + lx
    lab = jnp.where(lab < _SENTINEL, local, _SENTINEL)
    return lab.reshape(B, H + GAP, W)[:, :H]
