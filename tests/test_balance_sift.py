"""Tests for the color-balance engine and the SIFT matching layer."""

import numpy as np
import pytest

import jax

from cuauv_vision_pipeline_tpu.ops import balance as B
from cuauv_vision_pipeline_tpu.utils import sift as S


def _underwater_image(seed=0, shape=(72, 96)):
    """Synthetic scene with a strong blue-green cast."""
    rng = np.random.default_rng(seed)
    img = rng.integers(30, 120, (*shape, 3), dtype=np.uint8)
    img[..., 0] = np.clip(img[..., 0].astype(int) + 80, 0, 255)  # blue cast
    img[..., 1] = np.clip(img[..., 1].astype(int) + 40, 0, 255)
    return img


def test_equalize_reduces_color_cast():
    img = _underwater_image()
    cfg = B.BalanceConfig(
        equalize_rgb=True,
        hsi_contrast_correct=False,
        rgb_extrema_clipping=False,
    )
    out = np.asarray(jax.jit(B.balance, static_argnums=1)(img, cfg))
    assert out.dtype == np.uint8
    before_spread = np.ptp([img[..., c].mean() for c in range(3)])
    after_spread = np.ptp([out[..., c].mean() for c in range(3)])
    assert after_spread < before_spread * 0.5


def test_full_pipeline_shapes_and_range():
    img = _underwater_image(1)
    out = B.process_frame(
        img,
        equalize_rgb=True,
        rgb_contrast_correct=True,
        hsv_contrast_correct=False,
        hsi_contrast_correct=True,
        rgb_extrema_clipping=True,
        adaptive_cast_correction=True,
        horizontal_blocks=2,
        vertical_blocks=2,
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_hsv_contrast_increases_value_range():
    img = (_underwater_image(2) // 2 + 60).astype(np.uint8)  # low contrast
    cfg = B.BalanceConfig(
        equalize_rgb=False,
        hsv_contrast_correct=True,
        hsi_contrast_correct=False,
        rgb_extrema_clipping=False,
    )
    out = np.asarray(jax.jit(B.balance, static_argnums=1)(img, cfg))
    assert int(out.max()) - int(out.min()) >= int(img.max()) - int(img.min())


def test_hsi_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.float32)
    r, g, b = img[..., 2], img[..., 1], img[..., 0]
    h, s, i = B._rgb_to_hsi(r, g, b)
    r2, g2, b2 = B._hsi_to_rgb(h, s, i)
    np.testing.assert_allclose(np.asarray(r2), r, atol=1.5)
    np.testing.assert_allclose(np.asarray(g2), g, atol=1.5)
    np.testing.assert_allclose(np.asarray(b2), b, atol=1.5)


def test_u8_percentiles_exact():
    rng = np.random.default_rng(4)
    ch = rng.integers(0, 256, (100, 100), dtype=np.uint8)
    vmin, vmax = B._u8_percentiles(ch, 0.002, 0.998)
    ref_lo, ref_hi = np.percentile(ch, [0.2, 99.8])
    assert abs(float(vmin) - ref_lo) <= 2
    assert abs(float(vmax) - ref_hi) <= 2
    # bounds must reflect the actual data range, not saturate to 0/255
    narrow = rng.integers(90, 140, (64, 64), dtype=np.uint8)
    vmin, vmax = B._u8_percentiles(narrow, 0.002, 0.998)
    assert 88 <= float(vmin) <= 95
    assert 133 <= float(vmax) <= 140


# --- SIFT / matching ----------------------------------------------------------


def test_match_descriptors_lowe_ratio():
    rng = np.random.default_rng(0)
    train = rng.normal(size=(50, 128)).astype(np.float32)
    # queries 0..9 are near-copies of train 10..19; rest is noise
    query = rng.normal(size=(20, 128)).astype(np.float32)
    query[:10] = train[10:20] + rng.normal(scale=0.01, size=(10, 128))
    matches = S.match_descriptors(query, train, ratio=0.7)
    matched = {q: t for q, t, _ in matches}
    for q in range(10):
        assert matched.get(q) == q + 10


def test_ransac_homography_recovers_transform():
    rng = np.random.default_rng(1)
    src = rng.random((60, 2)) * 100
    H_true = np.array([[0.9, 0.1, 5.0], [-0.05, 1.1, -3.0], [1e-4, -2e-4, 1.0]])
    ones = np.concatenate([src, np.ones((60, 1))], axis=1)
    proj = ones @ H_true.T
    dst = proj[:, :2] / proj[:, 2:3]
    dst[:10] += rng.normal(scale=20, size=(10, 2))  # outliers
    H, mask = S.ransac_homography(src, dst, thresh=2.0)
    assert H is not None
    assert mask.sum() >= 45
    test = np.array([[50.0, 50.0, 1.0]])
    p_true = test @ H_true.T
    p_got = test @ H.T
    np.testing.assert_allclose(
        p_true[:, :2] / p_true[:, 2:], p_got[:, :2] / p_got[:, 2:], atol=0.5
    )


def test_sift_finds_embedded_source():
    rng = np.random.default_rng(2)
    scene = rng.integers(0, 255, (200, 260), dtype=np.uint8)
    source = rng.integers(0, 255, (80, 100), dtype=np.uint8)
    scene[40:120, 60:160] = source  # paste at (60, 40)

    sift = S.SIFT()
    sift.add_source("target", source)
    results = sift.match(scene, min_match=8)
    assert len(results) == 1
    quad = results[0]["quad"]
    assert abs(quad[0][0] - 60) < 6 and abs(quad[0][1] - 40) < 6
    assert abs(quad[2][0] - 159) < 6 and abs(quad[2][1] - 119) < 6


def test_sift_matching_buckets_bound_compiles_and_match_exactly():
    """Descriptor matching pads to power-of-2 buckets: varying keypoint
    counts inside one bucket reuse ONE executable, and padded rows never
    alter the matches (checked against a naive numpy 2-NN)."""
    from cuauv_vision_pipeline_tpu.utils import sift as S

    r = np.random.default_rng(7)
    base = S._distance_topk._cache_size()
    for nq, nt in [(70, 80), (90, 100), (100, 90), (110, 127)]:
        q = r.normal(size=(nq, 128)).astype(np.float32)
        t = r.normal(size=(nt, 128)).astype(np.float32)
        got = S.match_descriptors(q, t, ratio=0.8)
        # naive exact 2-NN + ratio test
        d2 = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1)[:, :2]
        d0 = np.sqrt(d2[np.arange(nq), order[:, 0]])
        d1 = np.sqrt(d2[np.arange(nq), order[:, 1]])
        want = [
            (int(i), int(order[i, 0])) for i in np.nonzero(d0 < 0.8 * d1)[0]
        ]
        assert [(a, b) for a, b, _ in got] == want
    assert S._distance_topk._cache_size() <= base + 1  # one 128-bucket compile


def test_prepared_query_matches_plain_path():
    """prepare_descriptors (the template cache SIFT.add_source keeps)
    returns the exact matches of the pad-per-call path."""
    rng = np.random.default_rng(5)
    query = rng.normal(size=(37, 128)).astype(np.float32)
    train = rng.normal(size=(90, 128)).astype(np.float32)
    query[:8] = train[20:28] + rng.normal(scale=0.01, size=(8, 128))
    plain = S.match_descriptors(query, train, ratio=0.75)
    prep = S.match_descriptors(
        None, train, ratio=0.75,
        query_prep=S.prepare_descriptors(query, "query"),
    )
    assert plain == prep and len(plain) >= 8


def test_ransac_degenerate_minimal_sets_dont_break():
    """Coincident-point candidates produce rank-deficient DLT systems; the
    batched solve must still recover H from the sane candidates."""
    rng = np.random.default_rng(3)
    src = np.repeat(rng.random((8, 2)) * 100, 8, axis=0)  # heavy duplicates
    H_true = np.array([[1.1, 0.0, 4.0], [0.02, 0.95, -2.0], [0.0, 0.0, 1.0]])
    ones = np.concatenate([src, np.ones((len(src), 1))], axis=1)
    proj = ones @ H_true.T
    dst = proj[:, :2] / proj[:, 2:3]
    H, mask = S.ransac_homography(src, dst, thresh=2.0, iters=64, seed=2)
    assert H is not None and mask.sum() >= len(src) - 4
    test = np.array([[30.0, 70.0, 1.0]])
    p_true = test @ H_true.T
    p_got = test @ H.T
    np.testing.assert_allclose(
        p_true[:, :2] / p_true[:, 2:], p_got[:, :2] / p_got[:, 2:], atol=0.5
    )


def test_ransac_padding_matches_unpadded_consensus():
    """RANSAC consensus over padded buffers returns the same inliers as the
    geometry implies: points mapped by a known H are inliers, outliers not."""
    from cuauv_vision_pipeline_tpu.utils import sift as S

    r = np.random.default_rng(3)
    H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    src = r.uniform(10, 300, (37, 2))  # odd count: exercises padding
    ones = np.concatenate([src, np.ones((len(src), 1))], axis=1)
    proj = ones @ H_true.T
    dst = proj[:, :2] / proj[:, 2:3]
    dst[30:] += r.uniform(40, 80, (7, 2))  # 7 gross outliers
    H, mask = S.ransac_homography(src, dst, thresh=3.0, iters=128, seed=1)
    assert H is not None
    assert mask[:30].all() and not mask[30:].any()
    reproj = (ones @ H.T)
    reproj = reproj[:, :2] / reproj[:, 2:3]
    assert np.abs(reproj[:30] - dst[:30]).max() < 1.0


def test_sift_warm_precompiles_all_buckets():
    """SIFT.warm(): after warming, no match() at ANY scene size or match
    count may trigger a new executable compile — a lazy bucket compile
    mid-loop stalls a module's loop thread (and has deadlocked against an
    in-flight chain dispatch on the tunnel harness)."""
    rng = np.random.default_rng(21)
    source = rng.integers(0, 255, (80, 100), dtype=np.uint8)
    sift = S.SIFT()
    sift.add_source("target", source)
    sift.warm(scene_max_keypoints=1024)
    base_t = S._distance_topk._cache_size()
    base_r = S._ransac_score._cache_size()
    for shape, paste in [((120, 150), (10, 20)), ((230, 310), (90, 120))]:
        scene = rng.integers(0, 255, shape, dtype=np.uint8)
        scene[paste[0] : paste[0] + 80, paste[1] : paste[1] + 100] = source
        res = sift.match(scene, min_match=8)
        assert len(res) == 1
    assert S._distance_topk._cache_size() == base_t
    assert S._ransac_score._cache_size() == base_r


def test_device_topk_equals_host_match_path():
    """The in-chain match (device_match_topk -> match_device_topk) returns
    EXACTLY what the host path (match_with_features) computes for the same
    detector output — same matches, same RANSAC result, same quad."""
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.ops.feature import detect_describe_jit

    rng = np.random.default_rng(31)
    scene = rng.integers(0, 255, (200, 260), dtype=np.uint8)
    source = rng.integers(0, 255, (80, 100), dtype=np.uint8)
    scene[40:120, 60:160] = source

    sift = S.SIFT(detector="device")
    sift.add_source("target", source)

    kp, des, n = detect_describe_jit(jnp.asarray(scene), 512)
    n = int(n)
    host = sift.match_with_features(
        np.asarray(kp)[:n], np.asarray(des)[:n], min_match=8
    )
    d2, idx = S.device_match_topk(sift.sources["target"]["des_prep"], des, n)
    dev = sift.match_device_topk(
        "target", np.asarray(d2), np.asarray(idx), np.asarray(kp), min_match=8
    )
    assert len(host) == len(dev) == 1
    assert host[0]["matches"] == dev[0]["matches"]
    assert host[0]["inliers"] == dev[0]["inliers"]
    np.testing.assert_array_equal(host[0]["quad"], dev[0]["quad"])
