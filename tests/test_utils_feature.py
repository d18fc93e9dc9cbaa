"""Golden tests for the utils feature/contour layer vs OpenCV."""

import math

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cuauv_vision_pipeline_tpu.utils import contours as CT
from cuauv_vision_pipeline_tpu.utils import feature as F

RNG = np.random.default_rng(3)


def _blobs(seed, shape=(96, 128), thresh=140):
    rng = np.random.default_rng(seed)
    blurred = cv2.GaussianBlur(
        rng.integers(0, 256, shape, dtype=np.uint8), (15, 15), 0
    )
    return ((blurred > thresh) * 255).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_outer_contours_same_point_sets_as_cv2(seed):
    mask = _blobs(seed)
    ref = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)[0]
    got = F.outer_contours(mask)
    assert len(got) == len(ref)
    ref_sets = sorted(
        (frozenset(map(tuple, c.reshape(-1, 2))) for c in ref), key=min
    )
    got_sets = sorted(
        (frozenset(map(tuple, c.reshape(-1, 2))) for c in got), key=min
    )
    assert ref_sets == got_sets


def test_all_contours_includes_holes():
    mask = np.zeros((40, 40), np.uint8)
    mask[5:35, 5:35] = 255
    mask[15:25, 15:25] = 0  # a hole
    outer = F.outer_contours(mask)
    both = F.all_contours(mask)
    assert len(outer) == 1
    assert len(both) == 2


def test_contour_area_and_centroid_match_cv2():
    mask = _blobs(1)
    ref = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)[0]
    got = F.outer_contours(mask)
    ref_stats = sorted(
        (cv2.contourArea(c),) + _centroid_cv(c) for c in ref if cv2.contourArea(c) > 0
    )
    got_stats = sorted(
        (F.contour_area(c),) + F.contour_centroid(c)
        for c in got
        if F.contour_area(c) > 0
    )
    for (ra, rx, ry), (ga, gx, gy) in zip(ref_stats, got_stats):
        assert abs(ra - ga) < 1e-6
        assert abs(rx - gx) <= 1 and abs(ry - gy) <= 1


def _centroid_cv(c):
    m = cv2.moments(c)
    if m["m00"] == 0:
        return (0, 0)
    return int(m["m10"] / m["m00"]), int(m["m01"] / m["m00"])


def test_contour_perimeter_matches_cv2():
    mask = _blobs(2)
    ref = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)[0]
    got = F.outer_contours(mask)
    ref_p = sorted(cv2.arcLength(c, True) for c in ref)
    got_p = sorted(F.contour_perimeter(c) for c in got)
    np.testing.assert_allclose(ref_p, got_p, rtol=1e-6)


def test_min_area_rect_matches_cv2():
    for trial in range(4):
        pts = (RNG.random((25, 2)) * 80 + 10).astype(np.float32).reshape(-1, 1, 2)
        ref = cv2.minAreaRect(pts)
        got = F.min_enclosing_rect(pts)
        assert abs(ref[1][0] * ref[1][1] - got[1][0] * got[1][1]) < 0.5
        np.testing.assert_allclose(
            np.sort(cv2.boxPoints(ref), axis=0),
            np.sort(cv2.boxPoints(got), axis=0),
            atol=0.2,
        )


def test_min_enclosing_circle_matches_cv2():
    pts = (RNG.random((30, 2)) * 90 + 5).astype(np.float32).reshape(-1, 1, 2)
    (rx, ry), rr = cv2.minEnclosingCircle(pts)
    (gx, gy), gr = F.min_enclosing_circle(pts)
    assert abs(rr - gr) < 0.05
    assert abs(rx - gx) < 0.5 and abs(ry - gy) < 0.5


def test_fit_ellipse_close_to_cv2():
    t = np.linspace(0, 2 * np.pi, 60)
    ex = 50 + 30 * np.cos(t) * np.cos(0.5) - 15 * np.sin(t) * np.sin(0.5)
    ey = 60 + 30 * np.cos(t) * np.sin(0.5) + 15 * np.sin(t) * np.cos(0.5)
    c = np.stack([ex, ey], -1).astype(np.float32).reshape(-1, 1, 2)
    ref = cv2.fitEllipse(c)
    got = F.min_enclosing_ellipse(c)
    np.testing.assert_allclose(ref[0], got[0], atol=0.5)
    np.testing.assert_allclose(sorted(ref[1]), sorted(got[1]), atol=0.5)
    assert abs((ref[2] - got[2] + 90) % 180 - 90) < 1.0


def test_canny_bit_exact_vs_cv2():
    # one L1 + one L2 threshold set in the fast loop (each (lo,hi,l2) is a
    # separate jit compile); the full matrix runs under -m slow below
    # ONE image x ONE threshold set in the fast loop — the CCL hysteresis
    # sweep EXECUTES in seconds per run on the CPU backend; the full
    # image x threshold matrix (incl. L2 and inverted thresholds) runs
    # under -m slow below
    img = _blobs(5, thresh=120)
    for mat in (img,):
        for lo, hi, l2 in ((50, 150, False),):
            ref = cv2.Canny(mat, lo, hi, L2gradient=l2)
            got = np.asarray(F.canny(mat, lo, hi, l2_gradient=l2))
            n = int((ref != got).sum())
            assert n == 0, f"canny mismatches={n} lo={lo} hi={hi} l2={l2}"


@pytest.mark.slow
def test_canny_bit_exact_full_matrix():
    img = _blobs(5, thresh=120)
    smooth = cv2.GaussianBlur(RNG.integers(0, 256, (96, 128), np.uint8), (7, 7), 0)
    noise = RNG.integers(0, 256, (61, 83), np.uint8)
    for mat in (img, smooth, noise):
        for lo, hi, l2 in ((50, 150, False), (150, 50, False), (30, 90, True)):
            ref = cv2.Canny(mat, lo, hi, L2gradient=l2)
            got = np.asarray(F.canny(mat, lo, hi, l2_gradient=l2))
            n = int((ref != got).sum())
            assert n == 0, f"canny mismatches={n} lo={lo} hi={hi} l2={l2}"


def test_find_corners_near_cv2():
    img = np.zeros((80, 80), np.uint8)
    img[20:60, 25:65] = 255
    got = F.find_corners(img, 4, 0.01, 10).reshape(-1, 2)
    ref = cv2.goodFeaturesToTrack(img, 4, 0.01, 10).reshape(-1, 2)
    assert len(got) == 4
    for r in ref:
        d = np.linalg.norm(got - r, axis=1).min()
        assert d <= 3.0


def test_find_lines_detects_synthetic_line():
    img = np.zeros((100, 100), np.uint8)
    img[50, 10:90] = 255  # horizontal line: rho=50, theta=pi/2
    lines = F.find_lines(img, threshold=40)
    assert len(lines) >= 1
    rho, theta = lines[0, 0]
    assert abs(theta - math.pi / 2) < 0.05
    assert abs(rho - 50) <= 1.0


def test_find_line_segments_endpoints():
    img = np.zeros((100, 100), np.uint8)
    img[30, 20:80] = 255
    segs = F.find_line_segments(img, threshold=30, min_line_length=40)
    assert len(segs) >= 1
    x1, y1, x2, y2 = segs[0, 0]
    assert y1 == 30 and y2 == 30
    assert abs(min(x1, x2) - 20) <= 2 and abs(max(x1, x2) - 79) <= 2


@pytest.mark.slow
def test_find_circles_synthetic():
    img = np.zeros((120, 120), np.uint8)
    cv2.circle(img, (60, 60), 25, 255, -1)
    img = cv2.GaussianBlur(img, (5, 5), 0)
    circles = F.find_circles(img, vote_thresh=20, min_radius=10, max_radius=50)
    assert circles.shape[1] >= 1
    x, y, r = circles[0, 0]
    assert abs(x - 60) <= 3 and abs(y - 60) <= 3
    assert abs(r - 25) <= 4


def test_approx_poly_reduces_rectangle():
    mask = np.zeros((60, 80), np.uint8)
    mask[10:50, 15:65] = 255
    contour = F.outer_contours(mask)[0]
    approx = F.contour_approx(contour, epsilon_ratio=0.02)
    assert 4 <= len(approx) <= 6  # near-rectangle


def _blobby_hole_mask(seed, H=120, W=160, salt=0.01):
    """Ellipse blobs with punched holes plus salt noise — adversarial for
    boundary tracing (thin bits, singletons, holes near edges)."""
    r = np.random.default_rng(seed)
    m = np.zeros((H, W), np.uint8)
    yy, xx = np.ogrid[:H, :W]
    for _ in range(12):
        cy, cx = r.integers(0, H), r.integers(0, W)
        ry, rx = r.integers(3, 25), r.integers(3, 25)
        m |= (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1).astype(np.uint8)
    for _ in range(6):
        cy, cx = r.integers(0, H), r.integers(0, W)
        ry, rx = r.integers(1, 6), r.integers(1, 6)
        m &= ~(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1)
    m |= (r.random((H, W)) < salt).astype(np.uint8)
    return m


def _reset_native_caches():
    """All imgeom.cpp kernels re-resolve against CUAUV_NATIVE_TRACE."""
    CT._native_trace = CT._NATIVE_SENTINEL
    CT._native_trace_all = CT._NATIVE_SENTINEL
    CT._native_runs = CT._NATIVE_SENTINEL
    CT._native_hull = CT._NATIVE_SENTINEL


@pytest.mark.parametrize("seed", [0, 4, 8])
def test_native_tracer_matches_python(seed, monkeypatch):
    """Every native imgeom kernel combination (batch tracer, per-contour
    tracer, run labeler) must produce bit-identical contours to the
    pure-Python reference loops, outer AND holes."""
    if CT._load_native_tracer() is None:
        pytest.skip("native tracer unavailable")
    mask = _blobby_hole_mask(seed)

    monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
    _reset_native_caches()
    batch_native = CT.find_contours(mask, external_only=False)
    # middle path: native labeler + per-contour native tracer, no batch
    CT._native_trace_all = None
    per_call_native = CT.find_contours(mask, external_only=False)
    monkeypatch.setenv("CUAUV_NATIVE_TRACE", "0")
    _reset_native_caches()
    python = CT.find_contours(mask, external_only=False)
    monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
    _reset_native_caches()  # re-resolve for later tests

    assert len(batch_native) == len(per_call_native) == len(python)
    for cb, cn, cp in zip(batch_native, per_call_native, python):
        np.testing.assert_array_equal(cb, cp)
        np.testing.assert_array_equal(cn, cp)


@pytest.mark.parametrize("seed", [2, 7])
def test_native_hull_matches_python(seed, monkeypatch):
    """vp_convex_hull: bit-equal vertex arrays vs the Python monotone
    chain on integer grids (heavy duplicates + collinear runs), float
    clouds, and rounded clusters."""
    if CT._load_native_hull() is None:
        pytest.skip("native hull unavailable")
    r = np.random.default_rng(seed)
    for trial in range(120):
        n = int(r.integers(1, 90))
        kind = trial % 3
        if kind == 0:
            pts = r.integers(0, 25, (n, 2)).astype(np.float64)
        elif kind == 1:
            pts = r.normal(0.0, 100.0, (n, 2))
        else:
            pts = np.round(r.normal(0.0, 4.0, (n, 2)))
        monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
        _reset_native_caches()
        hn = CT.convex_hull(pts)
        monkeypatch.setenv("CUAUV_NATIVE_TRACE", "0")
        _reset_native_caches()
        hp = CT.convex_hull(pts)
        np.testing.assert_array_equal(hn, hp)
    monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
    _reset_native_caches()


@pytest.mark.parametrize("seed", [1, 6])
def test_native_labeler_matches_python(seed, monkeypatch):
    """vp_component_runs: bit-equal run lists AND label rasters vs the
    Python union-find sweep, both connectivities."""
    if CT._load_native_runs() is None:
        pytest.skip("native labeler unavailable")
    r = np.random.default_rng(seed)
    for _ in range(20):
        H, W = int(r.integers(1, 48)), int(r.integers(1, 48))
        fg = r.random((H, W)) < r.uniform(0.05, 0.9)
        for conn in (8, 4):
            monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
            _reset_native_caches()
            ln, rn = CT._label_core(fg, want_labels=True, connectivity=conn)
            monkeypatch.setenv("CUAUV_NATIVE_TRACE", "0")
            _reset_native_caches()
            lp, rp = CT._label_core(fg, want_labels=True, connectivity=conn)
            np.testing.assert_array_equal(ln, lp)
            np.testing.assert_array_equal(rn, rp)
    monkeypatch.setenv("CUAUV_NATIVE_TRACE", "1")
    _reset_native_caches()


@pytest.mark.parametrize("seed", [0, 4, 11])
def test_hole_contour_point_sets_match_cv2_retr_list(seed):
    """Inner (hole) boundaries match cv2.RETR_LIST point sets — pinned since
    the hole traces anchor their backtrack at the hole pixel (start_dir=2);
    a wrong anchor breaks Jacob's criterion and emits runaway contours."""
    mask = _blobby_hole_mask(seed) * 255
    ref = cv2.findContours(mask, cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)[0]
    got = CT.find_contours(mask, external_only=False)
    ref_sets = {frozenset(map(tuple, c.reshape(-1, 2))) for c in ref}
    got_sets = {frozenset(map(tuple, c.reshape(-1, 2))) for c in got}
    assert got_sets == ref_sets


def test_host_shims_reuse_one_jit_across_parameter_values():
    """Host shims must not compile per parameter value: canny thresholds are
    traced scalars (one executable per l2 mode), and rotate/translate share
    one warp jit with the affine matrix as data — tuner sweeps through the
    preprocessor module must never trigger recompiles (utils/_jit.py)."""
    from cuauv_vision_pipeline_tpu.utils import transform as UT
    from cuauv_vision_pipeline_tpu.utils._jit import _JITS

    img = _blobs(2)
    # distinct thresholds, one canny entry per l2 mode (other tests may have
    # already compiled the l2=True variant; count only the L1 entry)
    F.canny(img, 40, 120)
    F.canny(img, 55, 170)
    F.simple_canny(img)
    assert len([k for k in _JITS if k == ("canny", False)]) == 1

    # distinct angles/offsets, one warp entry
    before = len(_JITS)
    UT.rotate(img, 13.0)
    UT.rotate(img, -71.5)
    UT.translate(img, 4, -9)
    UT.translate(img, -2, 3)
    assert len([k for k in _JITS if k[0] == "warp"]) == 1
    assert len(_JITS) <= before + 1


# --- device keypoint detect + describe (ops/feature.detect_describe) --------


def test_describe_at_matches_builtin_descriptor_math():
    """The device descriptor (ops/feature.describe_at) computes the same
    128-D gradient-histogram descriptor as the host fallback loop
    (utils/sift._builtin_detect_and_compute), for the same keypoints."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.ops.feature import describe_at
    from cuauv_vision_pipeline_tpu.utils.sift import (
        _builtin_detect_and_compute,
    )

    # smooth imagery: thresholded blobs put many gradient angles EXACTLY on
    # orientation-bin boundaries, where a 1-ulp atan2 difference between
    # numpy and XLA flips the bin — generic smooth gradients don't
    rng = np.random.default_rng(9)
    gray = np.kron(
        rng.integers(40, 216, (15, 20)).astype(np.uint8), np.ones((8, 8), np.uint8)
    )
    gray = (gray.astype(np.float32) + rng.normal(0, 2, gray.shape)).clip(
        0, 255
    ).astype(np.uint8)
    kps, descs = _builtin_detect_and_compute(gray, max_keypoints=64)
    assert len(kps) >= 10
    ys = jnp.asarray(kps[:, 1].astype(np.int32))
    xs = jnp.asarray(kps[:, 0].astype(np.int32))
    got = np.asarray(describe_at(jnp.asarray(gray), ys, xs))
    cos = np.sum(got * descs, axis=1)
    assert np.all(cos > 0.99) and np.mean(cos > 0.999) > 0.9


def test_detect_describe_spacing_validity_and_order():
    """detect_describe returns valid rows first (strongest response
    order), keypoints >= min_distance apart, inside the descriptor
    border, with unit (or zero) descriptor rows."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.ops.feature import detect_describe_jit

    gray = _blobs(3, shape=(144, 192))
    kp, des, n = (np.asarray(a) for a in detect_describe_jit(
        jnp.asarray(gray), 128, 0.01, 8
    ))
    n = int(n)
    assert 4 <= n <= 128
    valid_kp = kp[:n]
    assert np.all(valid_kp[:, 0] >= 8) and np.all(valid_kp[:, 0] < 192 - 8)
    assert np.all(valid_kp[:, 1] >= 8) and np.all(valid_kp[:, 1] < 144 - 8)
    # pairwise spacing >= min_distance
    d2 = ((valid_kp[:, None, :] - valid_kp[None, :, :]) ** 2).sum(-1)
    d2[np.arange(n), np.arange(n)] = 1e9
    assert d2.min() >= 8 * 8
    # rows past n are sentinels
    assert np.all(kp[n:] == -1.0) and np.all(des[n:] == 0.0)
    norms = np.linalg.norm(des[:n], axis=1)
    assert np.all((np.abs(norms - 1) < 1e-3) | (norms == 0))


def test_device_detector_sift_finds_embedded_source():
    """SIFT(detector="device"): the all-on-device detect+describe front
    end recovers an embedded planar target's quad, like the cv2 path."""
    from cuauv_vision_pipeline_tpu.utils.sift import SIFT

    rng = np.random.default_rng(12)
    scene = rng.integers(0, 255, (200, 260), dtype=np.uint8)
    source = rng.integers(0, 255, (80, 100), dtype=np.uint8)
    scene[40:120, 60:160] = source

    sift = SIFT(detector="device")
    sift.add_source("target", source)
    results = sift.match(scene, min_match=8)
    assert len(results) == 1
    quad = results[0]["quad"]
    assert abs(quad[0][0] - 60) < 6 and abs(quad[0][1] - 40) < 6
    assert abs(quad[2][0] - 159) < 6 and abs(quad[2][1] - 119) < 6


def test_device_detector_rotation_invariance():
    """oriented descriptors (the detect_describe default): a template
    pasted ROTATED into the scene is still matched — the pose flow's real
    regime (the vehicle yaws freely over a planar target). The axis-
    aligned descriptor (oriented=False) has no such guarantee."""
    from cuauv_vision_pipeline_tpu.utils.sift import SIFT
    from cuauv_vision_pipeline_tpu.utils.transform import rotate

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import bin_texture
    from cuauv_vision_pipeline_tpu.ops.color_np import bgr_to_gray_np

    rng = np.random.default_rng(17)
    tex = bgr_to_gray_np(np.asarray(bin_texture()))  # the real pose target
    rot = rotate(np.stack([tex] * 3, -1), 30.0)[..., 0]  # BGR warp, back to gray

    # mild-contrast backdrop like the real underwater scene (a full-range
    # noise background would out-compete the plate's corners for the
    # detector's top-k slots — realistic scenes don't)
    scene = rng.integers(70, 100, (420, 520), dtype=np.uint8)
    # paste the rotated template's valid interior (skip the warp's black
    # corner fill so pasted-region keypoints see real texture)
    ys, xs = np.nonzero(rot > 0)
    y0, y1, x0, x1 = ys.min() + 20, ys.max() - 20, xs.min() + 20, xs.max() - 20
    scene[60 : 60 + (y1 - y0), 80 : 80 + (x1 - x0)] = rot[y0:y1, x0:x1]

    sift = SIFT(detector="device")
    sift.add_source("target", tex)
    results = sift.match(scene, min_match=8)
    assert len(results) == 1, "rotated target not matched"
    assert results[0]["inliers"] >= 6
    # the recovered homography must place the template's CENTER at the
    # pasted plate's center: template center (160, 80) -> rotation about
    # the center is a fixed point -> crop shift (-20, -20) -> paste
    # offset (+80, +60) => (220, 120)
    quad = np.asarray(results[0]["quad"], np.float64)
    center = quad.mean(axis=0)
    assert abs(center[0] - 220) < 12 and abs(center[1] - 120) < 12, center


def test_detect_describe_nms_fixpoint_matches_sequential_greedy():
    """The parallel greedy-MIS fixpoint inside detect_describe computes
    EXACTLY the sequential strongest-first suppression (the reference
    semantics of goodFeaturesToTrack's greedy loop): property-checked on
    clustered integer points that force conflicts, exact ties, and
    multi-hop suppression chains."""
    import jax
    import jax.numpy as jnp

    def seq_greedy(pts, cand, min_d2):
        kept = np.zeros(len(cand), bool)
        for i in range(len(cand)):
            if not cand[i]:
                continue
            d2 = np.sum((pts[i] - pts) ** 2, axis=1)
            if not np.any(kept & (d2 < min_d2)):
                kept[i] = True
        return kept

    @jax.jit
    def mis_fixpoint(pts, cand, min_d2):
        K = cand.shape[0]
        idx = jnp.arange(K)
        d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        C = (d2 < min_d2) & (idx[None, :] < idx[:, None]) & cand[None, :]

        def cond(state):
            kept, killed = state
            return jnp.any(cand & ~kept & ~killed)

        def body(state):
            kept, killed = state
            undec = cand & ~kept & ~killed
            newly_kept = undec & ~jnp.any(C & ~killed[None, :], axis=1)
            kept = kept | newly_kept
            newly_killed = (undec & ~newly_kept) & jnp.any(
                C & kept[None, :], axis=1
            )
            return kept, killed | newly_killed

        kept, _ = jax.lax.while_loop(
            cond, body, (cand & False, cand & False)
        )
        return kept

    rng = np.random.default_rng(7)
    for _ in range(60):
        K = int(rng.integers(4, 120))
        pts = rng.integers(0, 40, (K, 2)).astype(np.float32)
        cand = rng.random(K) < 0.9
        min_d2 = float(rng.choice([4, 16, 64, 100]))
        a = seq_greedy(pts, cand, min_d2)
        b = np.asarray(
            mis_fixpoint(jnp.asarray(pts), jnp.asarray(cand), min_d2)
        )
        assert np.array_equal(a, b)


def test_detect_describe_tiled_topk_matches_global():
    """The tiled two-stage top-k selects the same keypoint set as a
    single global lax.top_k on textured imagery (differences are only
    possible inside exact-response tie clusters closer than
    min_distance, which real texture does not produce)."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import (
        bins_frame,
    )
    from cuauv_vision_pipeline_tpu.ops.color_np import bgr_to_gray_np
    from cuauv_vision_pipeline_tpu.ops.feature import detect_describe_jit

    gray = bgr_to_gray_np(bins_frame((240, 320), 0.3))
    # min_distance=8 takes the tiled path; min_distance=17 forces the
    # global-sort fallback ((32//17+1)^2=9 slots needed <= 32 is True, so
    # pick a tiny image instead: n_tiles*32 < max_keypoints)
    kp_t, _, n_t = detect_describe_jit(jnp.asarray(gray), 128, 0.01, 8)
    small = gray[:64, :64]
    kp_g, _, n_g = detect_describe_jit(jnp.asarray(small), 256, 0.01, 8)
    assert int(n_g) > 0  # fallback path executes (4 tiles * 32 < 256)

    # cross-check the tiled selection against a manual global top-k
    # recomputation of the same pipeline on the full frame
    import jax

    from cuauv_vision_pipeline_tpu.ops import feature as F

    g = jnp.asarray(gray).astype(jnp.float32)
    resp = F.min_eigenvalue_map(g)
    win = 17
    p = jnp.pad(resp, 8, constant_values=-jnp.inf)
    mx = jax.lax.reduce_window(
        p, -jnp.inf, jax.lax.max, (win, 1), (1, 1), "VALID"
    )
    mx = jax.lax.reduce_window(
        mx, -jnp.inf, jax.lax.max, (1, win), (1, 1), "VALID"
    )
    yy = jnp.arange(g.shape[0])[:, None]
    xx = jnp.arange(g.shape[1])[None, :]
    inside = (yy >= 12) & (yy < g.shape[0] - 12) & (xx >= 12) & (
        xx < g.shape[1] - 12
    )
    peaks = (resp >= mx) & (resp > jnp.max(resp) * 0.01) & inside
    score = np.asarray(jnp.where(peaks, resp, -jnp.inf)).reshape(-1)
    order = np.argsort(-score, kind="stable")[:128]
    glob = {
        (int(f % g.shape[1]), int(f // g.shape[1]))
        for f in order
        if np.isfinite(score[f])
    }
    got = {(int(x), int(y)) for x, y in np.asarray(kp_t[: int(n_t)])}
    # every keypoint the tiled path kept came from the true global top-k
    # candidate set (greedy suppression then thins it identically)
    assert got <= glob
    assert int(n_t) >= 10

    # ADVICE r3: subset alone would miss the tiled stage silently DROPPING
    # keypoints the global sort keeps — force the global-sort form of the
    # SAME pipeline on the same (tie-free, textured) frame and require the
    # greedy-suppressed keypoint sets to be identical
    kp_f, _, n_f = detect_describe_jit(
        jnp.asarray(gray), 128, 0.01, 8, True, True
    )
    forced = {(int(x), int(y)) for x, y in np.asarray(kp_f[: int(n_f)])}
    assert int(n_f) == int(n_t)
    assert forced == got
