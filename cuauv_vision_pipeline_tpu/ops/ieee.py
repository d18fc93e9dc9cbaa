"""Bit-exact IEEE-754 binary32 helpers: error-free transforms + emulated FMA.

XLA exposes no explicit fma op — mul+add contraction is at the compiler's
discretion — but OpenCV's vectorized colorspace kernels use ``v_fma``
(single rounding). Matching them bit-for-bit (ops/color.py bgr_to_hls)
therefore needs a *deterministic* fused multiply-add built from ordinary
IEEE f32 ops.

``two_sum`` (Knuth) and ``two_prod`` (Dekker split) are error-free
transforms: every operation in their error channels is provably exact in
f32, so compiler FMA contraction cannot change the results (contraction
only alters ops that round). ``fma_rn`` composes them with a round-to-odd
intermediate sum (Boldo–Muller FMA emulation) so the final add performs
the one-and-only rounding: fma_rn(a, b, c) == RN(a*b + c) exactly.

Validated exhaustively over all 256^3 u8 colors against OpenCV's AVX2
v_fma path in tests/test_ops_color.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_SPLIT = jnp.float32(4097.0)  # 2^12 + 1 for binary32 Dekker splitting


def two_sum(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Knuth TwoSum: s = RN(a+b), e exact error (a+b == s+e)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_prod(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker TwoProd: p = RN(a*b), e exact error (a*b == p+e).

    Assumes no overflow and error terms above the subnormal range (true for
    the colorspace magnitudes this backs). Every op in the error channel is
    exact by Dekker's theorem, so compiler FMA contraction could not change
    it even if XLA performed contraction — which it does not (HLO has no
    elementwise fma; the CPU LLVM pipeline runs without the contract flag).
    No optimization_barrier: one anywhere in this dataflow sends XLA:CPU's
    pipeline into a ~5-minute compile. The exhaustive 256^3 HLS golden test
    (tests/test_ops_color.py) would catch any future contraction regression.
    """
    p = a * b
    ta = a * _SPLIT
    ah = ta - (ta - a)
    al = a - ah
    tb = b * _SPLIT
    bh = tb - (tb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _next_toward(x: jnp.ndarray, positive: jnp.ndarray) -> jnp.ndarray:
    """nextafter(x, +-inf) via the monotonic sign-magnitude integer map."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    m = i ^ ((i >> 31) & jnp.int32(0x7FFFFFFF))
    m = m + jnp.where(positive, jnp.int32(1), jnp.int32(-1))
    i2 = m ^ ((m >> 31) & jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(i2, jnp.float32)


def round_odd_sum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """RO(a+b): round-to-odd sum — exact when representable, else the
    neighbor with an odd last mantissa bit (carries sticky information
    through a later RN without double rounding)."""
    s, r = two_sum(a, b)
    i = jax.lax.bitcast_convert_type(s, jnp.int32)
    needs_odd = (r != 0) & ((i & 1) == 0)
    return jnp.where(needs_odd, _next_toward(s, r > 0), s)


def fma_rn(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Correctly-rounded fused multiply-add: RN(a*b + c) in f32.

    Boldo–Muller emulation: a*b + c == ph + pl + c == th + (tl + pl)
    exactly; rounding (tl + pl) to odd makes the final RN add the only
    rounding of the whole expression.
    """
    ph, pl = two_prod(a, b)
    th, tl = two_sum(ph, c)
    return th + round_odd_sum(tl, pl)


def div_rn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Correctly-rounded division RN(a/b) in f32, independent of how the
    backend divides (TPU lowers ``/`` to reciprocal + Newton, which is not
    correctly rounded; CPU/GPU are).

    Markstein correction on top of the hardware quotient: with q within a
    few ulps of a/b and an exact residual r = RN(a - q*b) (exact because
    the subtraction cancels), y one Newton step off the hardware
    reciprocal, q' = RN(q + r*y) is the correctly-rounded quotient.
    """
    q = a / b
    y = jnp.float32(1.0) / b
    # one Newton refinement of y (with emulated-exact fma): y*(2 - b*y)
    e = fma_rn(-b, y, jnp.float32(1.0))
    y = fma_rn(y, e, y)
    r = fma_rn(-q, b, a)
    return fma_rn(r, y, q)
