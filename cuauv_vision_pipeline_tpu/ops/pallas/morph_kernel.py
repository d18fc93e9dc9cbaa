"""Pallas TPU kernel: fused open+close morphology in one HBM pass.

Why a kernel: the XLA lowering of ``close_morph(open_morph(x))`` is four
``reduce_window`` ops (erode5, dilate5, dilate5, erode5), each a full
HBM read + write of the mask — on a chain that already runs within
~1.35x of its input-traffic floor (BENCH_NOTES "speed-of-light"
section), those intermediate round trips are the remaining headroom.
This kernel pulls a row strip into VMEM once, applies all four stages
(each separable: a 5-tap running min/max along rows then columns) on the
VMEM tile, and writes the cleaned strip once: one read + one write total.

Halo arithmetic: each 5x5 stage corrupts a 2-pixel ring at the strip
boundary, so an 8-row halo (2 x 4 stages) keeps the core rows exact —
the standard iterated-halo scheme (same idea as the CCL strip kernel's
merge rows, ccl_kernel.py). cv2 border semantics (BORDER_CONSTANT with
the morphology identity) are reproduced by forcing out-of-image pixels
to the CURRENT stage's identity before each stage — exactly what the
composed ``ops.morphology`` calls do by re-padding per op. Exactness vs
the XLA path is pinned by tests/test_pallas_morph.py over sizes that
exercise strip seams and ragged edges.

DEFAULT-OFF in the production chain (CUAUV_FUSED_MORPH=1 enables), and
now MEASURED on the real chip (round 3): the fused kernel is SLOWER than
XLA's four reduce_windows — 0.059 vs 0.038 ms standalone at 1080p, and
16,071 vs 18,295 fps inside the dependence-chained headline in the same
window. Per-program overhead dominates both variants at this size and
XLA's lowering already runs near its HBM floor, so the projected ~25%
was never there to take. Kept as a bit-exact, tested reference of the
strip/halo Pallas pattern; the round-1 lesson (a hand kernel for blob
stats lost 36x to XLA's fusion, ROADMAP.md) holds a second time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP_ROWS = 64
_HALO = 8  # 2 px per stage x 4 stages
_R = 2  # 5x5 rect kernel radius


def _shift_cols(arr, k: int, forward: bool, fill):
    filler = jnp.full((arr.shape[0], abs(k)), fill, arr.dtype)
    if forward:
        return jnp.concatenate([filler, arr[:, : -abs(k)]], axis=1)
    return jnp.concatenate([arr[:, abs(k) :], filler], axis=1)


def _shift_rows(arr, k: int, forward: bool, fill):
    filler = jnp.full((abs(k), arr.shape[1]), fill, arr.dtype)
    if forward:
        return jnp.concatenate([filler, arr[: -abs(k)]], axis=0)
    return jnp.concatenate([arr[abs(k) :], filler], axis=0)


def _stage(v, inside, is_erode: bool):
    """One separable 5x5 erode/dilate with cv2 identity borders."""
    ident = jnp.int32(255 if is_erode else 0)
    op = jnp.minimum if is_erode else jnp.maximum
    v = jnp.where(inside, v, ident)
    for axis_shift in (_shift_rows, _shift_cols):
        acc = v
        for k in range(1, _R + 1):
            acc = op(acc, axis_shift(v, k, True, ident))
            acc = op(acc, axis_shift(v, k, False, ident))
        v = acc
    return v


def _make_kernel(H: int, W: int, stages):
    def kernel(top_ref, strip_ref, bot_ref, out_ref):
        work = jnp.concatenate(
            [top_ref[:], strip_ref[:].astype(jnp.int32), bot_ref[:]], axis=0
        )
        s = pl.program_id(0)
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
            + s * STRIP_ROWS
            - _HALO
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
        inside = (rows >= 0) & (rows < H) & (cols < W)

        for is_erode in stages:
            work = _stage(work, inside, is_erode)

        out_ref[:] = work[_HALO:-_HALO].astype(jnp.uint8)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("operation", "interpret")
)
def fused_morph(
    mask: jnp.ndarray,
    operation: str = "open_close",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused 5x5-rect morphology on a [H, W] u8 mask, one HBM pass.

    operation: "open_close" (the red_buoy chain's
    ``close_morph(open_morph(x))``), "open", or "close". Bit-exact vs the
    composed ops.morphology calls (tests/test_pallas_morph.py). Runs in
    interpret mode automatically off-TPU.
    """
    stages = {
        # erode=True / dilate=False, applied in order
        "open_close": (True, False, False, True),
        "open": (True, False),
        "close": (False, True),
    }[operation]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    H, W = mask.shape
    S = STRIP_ROWS
    Wp = int(np.ceil(W / 128) * 128)
    Hp = int(np.ceil(H / S) * S)
    n_strips = Hp // S

    mask_p = jnp.zeros((Hp, Wp), jnp.uint8).at[:H, :W].set(
        mask.astype(jnp.uint8)
    )

    # halo blocks: the 8 rows above / below each strip as padded int32
    # arrays indexed per strip (out-of-image rows hold 0 — the kernel's
    # `inside` mask replaces them with the stage identity anyway)
    as_i32 = mask_p.astype(jnp.int32)
    zeros = jnp.zeros((_HALO, Wp), jnp.int32)
    padded = jnp.concatenate([zeros, as_i32, zeros], axis=0)
    top = jnp.concatenate(
        [padded[i * S : i * S + _HALO] for i in range(n_strips)], axis=0
    )
    bot = jnp.concatenate(
        [padded[(i + 1) * S + _HALO : (i + 1) * S + 2 * _HALO]
         for i in range(n_strips)],
        axis=0,
    )

    out = pl.pallas_call(
        _make_kernel(H, W, stages),
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((_HALO, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (S, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.uint8),
        interpret=interpret,
    )(top, mask_p, bot)
    return out[:H, :W]
