"""ops/ieee.py: emulated FMA / correctly-rounded division unit tests.

The decisive system-level check is the exhaustive 256^3 HLS golden in
test_ops_color.py; these validate the primitives directly against exact
rational arithmetic on adversarial operands (heavy cancellation, where a
double-rounded f64 emulation would differ).
"""

from fractions import Fraction

import jax
import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.ops import ieee as I

f32 = np.float32


def _rn32(x: Fraction) -> np.float32:
    """Correctly round a rational to binary32 (round-to-nearest-even)."""
    c = f32(np.float64(x))  # near; fix up against both neighbors
    for _ in range(2):
        for v in (np.nextafter(c, f32(np.inf)), np.nextafter(c, f32(-np.inf))):
            dc, dv = abs(x - Fraction(float(c))), abs(x - Fraction(float(v)))
            if dv < dc or (
                dv == dc and not (np.frombuffer(v.tobytes(), np.int32)[0] & 1)
            ):
                c = v
    return c


def _rand(rng, n):
    # keep everything f32: scalar ** int-array would silently promote to f64
    return ((rng.random(n, f32) * 2 - 1) * f32(10.0) ** rng.integers(-3, 4, n)).astype(f32)


def _cases(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    a, b = _rand(rng, n), _rand(rng, n)
    c = np.where(
        rng.random(n) < 0.5,
        # heavy cancellation: c ~ -a*b
        (-(a.astype(np.float64) * b.astype(np.float64))).astype(f32)
        * (1 + rng.normal(0, 1e-7, n)).astype(f32),
        _rand(rng, n),
    ).astype(f32)
    return a, b, c


def test_two_sum_two_prod_error_free():
    a, b, _ = _cases(2000)
    s, e = jax.jit(I.two_sum)(a, b)
    p, pe = jax.jit(I.two_prod)(a, b)
    s, e, p, pe = map(np.asarray, (s, e, p, pe))
    for i in range(0, 2000, 7):
        assert Fraction(float(a[i])) + Fraction(float(b[i])) == Fraction(
            float(s[i])
        ) + Fraction(float(e[i]))
        assert Fraction(float(a[i])) * Fraction(float(b[i])) == Fraction(
            float(p[i])
        ) + Fraction(float(pe[i]))


def test_fma_rn_correctly_rounded():
    a, b, c = _cases()
    got = np.asarray(jax.jit(I.fma_rn)(a, b, c))
    # check every case where a double-rounded f64 emulation differs, plus a
    # sample of the rest
    approx = (a.astype(np.float64) * b.astype(np.float64) + c.astype(np.float64)).astype(f32)
    check = set(np.nonzero(got != approx)[0].tolist()) | set(range(0, len(a), 17))
    for i in sorted(check):
        exact = Fraction(float(a[i])) * Fraction(float(b[i])) + Fraction(float(c[i]))
        want = _rn32(exact)
        assert got[i] == want or (
            np.isnan(want) and np.isnan(got[i])
        ), f"fma_rn({a[i]}, {b[i]}, {c[i]}) = {got[i]}, want {want}"


def test_div_rn_correctly_rounded():
    rng = np.random.default_rng(3)
    n = 4000
    a, b = _rand(rng, n), _rand(rng, n)
    b = np.where(b == 0, f32(1.0), b).astype(f32)
    got = np.asarray(jax.jit(I.div_rn)(a, b))
    for i in range(0, n, 5):
        exact = Fraction(float(a[i])) / Fraction(float(b[i]))
        want = _rn32(exact)
        assert got[i] == want, f"div_rn({a[i]}, {b[i]}) = {got[i]}, want {want}"


def test_hls_operand_ranges():
    """The exact HLS operand family: u8-grid differences times 60/diff."""
    rng = np.random.default_rng(5)
    k = rng.integers(1, 256, 500)
    m = rng.integers(-255, 256, 500)
    scale = f32(1.0) / f32(255.0)
    diff = k.astype(f32) * scale
    num = m.astype(f32) * scale
    dd = np.asarray(jax.jit(I.div_rn)(f32(60.0) * np.ones_like(diff), diff))
    for i in range(0, 500, 3):
        assert dd[i] == _rn32(Fraction(60) / Fraction(float(diff[i])))
    for base in (f32(0.0), f32(120.0), f32(240.0), f32(360.0)):
        got = np.asarray(jax.jit(I.fma_rn)(num, dd, base * np.ones_like(num)))
        for i in range(0, 500, 11):
            exact = Fraction(float(num[i])) * Fraction(float(dd[i])) + Fraction(
                float(base)
            )
            assert got[i] == _rn32(exact)
