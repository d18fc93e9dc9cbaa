"""Golden tests for threshold + morphology + transform ops vs OpenCV."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from cuauv_vision_pipeline_tpu.ops import morphology as M
from cuauv_vision_pipeline_tpu.ops import threshold as T
from cuauv_vision_pipeline_tpu.ops import transform as X

RNG = np.random.default_rng(42)
GRAY = RNG.integers(0, 256, (64, 96), dtype=np.uint8)
BGR = RNG.integers(0, 256, (64, 96, 3), dtype=np.uint8)
# a blobby binary mask (what modules actually erode/dilate)
BLOBS = (
    cv2.GaussianBlur(RNG.integers(0, 256, (64, 96), dtype=np.uint8), (15, 15), 0)
    > 127
).astype(np.uint8) * 255


# --- in_range -------------------------------------------------------------


def test_in_range_single_channel_exact():
    ref = cv2.inRange(GRAY, 50, 180)
    got = np.asarray(jax.jit(lambda x: T.in_range(x, 50, 180))(GRAY))
    np.testing.assert_array_equal(got, ref)


def test_in_range_bgr_exact():
    lo, hi = (10, 50, 100), (200, 220, 240)
    ref = cv2.inRange(BGR, lo, hi)
    got = np.asarray(T.in_range(BGR, lo, hi))
    np.testing.assert_array_equal(got, ref)


# --- fixed thresholds -----------------------------------------------------


@pytest.mark.parametrize("thresh", [0, 57, 128, 254, 255])
def test_fixed_threshold_modes_exact(thresh):
    pairs = [
        (T.binary, cv2.THRESH_BINARY, 255),
        (T.binary_inv, cv2.THRESH_BINARY_INV, 255),
    ]
    for ours, mode, maxval in pairs:
        ref = cv2.threshold(GRAY, thresh, maxval, mode)[1]
        got = np.asarray(ours(GRAY, thresh, maxval))
        np.testing.assert_array_equal(got, ref)

    for ours, mode in [
        (T.truncate, cv2.THRESH_TRUNC),
        (T.to_zero, cv2.THRESH_TOZERO),
        (T.to_zero_inv, cv2.THRESH_TOZERO_INV),
    ]:
        ref = cv2.threshold(GRAY, thresh, 0, mode)[1]
        got = np.asarray(ours(GRAY, thresh))
        np.testing.assert_array_equal(got, ref)


def test_otsu_matches_cv2():
    # bimodal image
    img = np.concatenate(
        [
            RNG.normal(60, 10, 2000).clip(0, 255),
            RNG.normal(190, 12, 2000).clip(0, 255),
        ]
    ).astype(np.uint8).reshape(50, 80)
    ref_t, ref_mask = cv2.threshold(img, 0, 255, cv2.THRESH_OTSU)
    got_t, got_mask = T.otsu(img)
    assert float(got_t) == ref_t
    np.testing.assert_array_equal(np.asarray(got_mask), ref_mask)


def test_adaptive_mean_exact():
    for ksize, bias in [(11, 2.0), (7, 0.0), (21, -3.0)]:
        ref = cv2.adaptiveThreshold(
            GRAY, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, ksize, bias
        )
        got = np.asarray(T.adaptive_mean(GRAY, ksize, bias))
        np.testing.assert_array_equal(got, ref)
        ref_inv = cv2.adaptiveThreshold(
            GRAY, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV, ksize, bias
        )
        got_inv = np.asarray(T.adaptive_mean(GRAY, ksize, bias, inverse=True))
        np.testing.assert_array_equal(got_inv, ref_inv)


def test_adaptive_gaussian_close():
    for ksize, bias in [(11, 2.0), (15, 0.0)]:
        ref = cv2.adaptiveThreshold(
            GRAY, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY, ksize, bias
        )
        got = np.asarray(T.adaptive_gaussian(GRAY, ksize, bias))
        # float smoothing: allow mask flips only at exact ties (rare)
        assert (got != ref).mean() < 0.01


def test_thresh_color_distance():
    mask, dists = T.thresh_color_distance(BGR, (100, 100, 100), 60.0)
    mask = np.asarray(mask)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    # distance=inf accepts everything
    mask_all, _ = T.thresh_color_distance(BGR, (0, 0, 0), 1e6)
    assert (np.asarray(mask_all) == 255).all()


# --- morphology -----------------------------------------------------------


def test_kernels_match_cv2():
    for size in [(3, 3), (5, 5), (7, 5), (9, 9), (4, 6)]:
        np.testing.assert_array_equal(
            M.rect_kernel(size), cv2.getStructuringElement(cv2.MORPH_RECT, size[::-1])
        )
        np.testing.assert_array_equal(
            M.ellipse_kernel(size),
            cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size[::-1]),
        )
        np.testing.assert_array_equal(
            M.cross_kernel(size),
            cv2.getStructuringElement(cv2.MORPH_CROSS, size[::-1]),
        )


@pytest.mark.parametrize("kernel_fn,size", [
    (M.rect_kernel, 5),
    (M.rect_kernel, (3, 7)),
    (M.ellipse_kernel, 5),
    (M.ellipse_kernel, (7, 9)),
    (M.cross_kernel, 5),
])
def test_erode_dilate_exact(kernel_fn, size):
    k = kernel_fn(size)
    for img in [BLOBS, GRAY]:
        np.testing.assert_array_equal(
            np.asarray(M.erode(img, k)), cv2.erode(img, k)
        )
        np.testing.assert_array_equal(
            np.asarray(M.dilate(img, k)), cv2.dilate(img, k)
        )


def test_open_close_gradient_exact():
    k = M.rect_kernel(5)
    np.testing.assert_array_equal(
        np.asarray(M.open_morph(BLOBS, k)),
        cv2.morphologyEx(BLOBS, cv2.MORPH_OPEN, k),
    )
    np.testing.assert_array_equal(
        np.asarray(M.close_morph(BLOBS, k)),
        cv2.morphologyEx(BLOBS, cv2.MORPH_CLOSE, k),
    )
    np.testing.assert_array_equal(
        np.asarray(M.gradient(BLOBS, k)),
        cv2.morphologyEx(BLOBS, cv2.MORPH_GRADIENT, k),
    )


def test_erode_iterations():
    k = M.rect_kernel(3)
    np.testing.assert_array_equal(
        np.asarray(M.erode(BLOBS, k, iterations=3)),
        cv2.erode(BLOBS, k, iterations=3),
    )


def test_morph_batched():
    k = M.ellipse_kernel(5)
    batch = np.stack([BLOBS, 255 - BLOBS])
    got = np.asarray(jax.jit(lambda x: M.erode(x, k))(batch))
    np.testing.assert_array_equal(got[0], cv2.erode(BLOBS, k))
    np.testing.assert_array_equal(got[1], cv2.erode(255 - BLOBS, k))


# --- transforms -----------------------------------------------------------


def test_gaussian_blur_u8_exact_small():
    # cv2's hardcoded binary-fraction kernel table extends through ksize 9
    for ksize in [3, 5, 7, 9]:
        ref = cv2.GaussianBlur(GRAY, (ksize, ksize), 0)
        got = np.asarray(X.gaussian_blur(GRAY, ksize))
        np.testing.assert_array_equal(got, ref)


def test_gaussian_blur_u8_large_kernel():
    # ksize >= 11: cv2 builds kernels with its private softdouble exp and
    # filters in fixed point (build-dependent: IPP/HAL); we follow the
    # getGaussianKernel formula in f32. Pin the measured deviation bounds.
    for ksize, tol in [(11, 1)]:
        got = np.asarray(X.gaussian_blur(GRAY, ksize))
        ref_gb = cv2.GaussianBlur(GRAY, (ksize, ksize), 0)
        d = np.abs(got.astype(int) - ref_gb.astype(int))
        assert d.max() <= tol, f"ksize={ksize}: max|d|={d.max()}"
        assert (d != 0).mean() < 0.25, f"ksize={ksize}: {(d != 0).mean():.1%}"


@pytest.mark.slow
def test_gaussian_blur_u8_large_kernel_matrix():
    for ksize, tol in [(15, 1), (101, 2)]:
        got = np.asarray(X.gaussian_blur(GRAY, ksize))
        ref_gb = cv2.GaussianBlur(GRAY, (ksize, ksize), 0)
        d = np.abs(got.astype(int) - ref_gb.astype(int))
        assert d.max() <= tol, f"ksize={ksize}: max|d|={d.max()}"
        assert (d != 0).mean() < 0.25, f"ksize={ksize}: {(d != 0).mean():.1%}"


def test_gaussian_blur_bgr_exact():
    ref = cv2.GaussianBlur(BGR, (5, 5), 0)
    got = np.asarray(X.gaussian_blur(BGR, 5))
    np.testing.assert_array_equal(got, ref)


def test_resize_linear_close():
    for dsize in [(48, 32), (192, 128), (100, 50)]:
        ref = cv2.resize(BGR, dsize, interpolation=cv2.INTER_LINEAR)
        got = np.asarray(X.resize(BGR, dsize))
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_nearest_exact():
    ref = cv2.resize(BGR, (48, 32), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(X.resize(BGR, (48, 32), interpolation="nearest"))
    np.testing.assert_array_equal(got, ref)


def test_rotate_translate_close():
    ref = cv2.warpAffine(
        GRAY, cv2.getRotationMatrix2D((96 / 2, 64 / 2), 30, 1.0), (96, 64)
    )
    got = np.asarray(X.rotate(GRAY, 30))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert (diff > 1).mean() < 0.02  # edge pixels may differ by interpolation
    ref = cv2.warpAffine(
        GRAY, np.float32([[1, 0, 7], [0, 1, -3]]), (96, 64)
    )
    got = np.asarray(X.translate(GRAY, 7, -3))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_decode_encode_normal_roundtrip():
    u8 = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    decoded = np.asarray(X.decode_normal(u8))
    assert decoded.min() >= -1.0 and decoded.max() <= 1.0
    back = np.asarray(X.encode_normal(decoded))
    np.testing.assert_array_equal(back, u8)
