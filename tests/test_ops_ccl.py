"""CCL golden tests vs cv2.connectedComponentsWithStats."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from cuauv_vision_pipeline_tpu.ops import ccl


def _random_blobs(seed, shape=(96, 128), thresh=140):
    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, shape, dtype=np.uint8)
    blurred = cv2.GaussianBlur(noise, (15, 15), 0)
    return ((blurred > thresh) * 255).astype(np.uint8)


def _compare_to_cv2(mask, connectivity=8, max_components=64):
    n_ref, labels_ref, stats_ref, cents_ref = cv2.connectedComponentsWithStats(
        mask, connectivity=connectivity
    )
    labels, stats = ccl.connected_components_with_stats(
        mask, max_components=max_components, connectivity=connectivity
    )
    labels = np.asarray(labels)
    count = int(stats["count"])

    assert count == n_ref - 1  # cv2 counts background as label 0

    # same partition: our label values are raster-first-pixel ids; build a
    # mapping and check pixel-for-pixel agreement
    ours_fg = labels < 2**30
    ref_fg = labels_ref > 0
    np.testing.assert_array_equal(ours_fg, ref_fg)
    if count:
        # map each cv2 label to our label via the first pixel of each blob
        pairs = {}
        H, W = mask.shape
        for y in range(H):
            for x in range(W):
                if ref_fg[y, x]:
                    r, o = labels_ref[y, x], labels[y, x]
                    if r in pairs:
                        assert pairs[r] == o, "partition mismatch"
                    else:
                        pairs[r] = o
        assert len(pairs) == n_ref - 1

    # stats agree per component (match by bbox+area)
    ref_set = {
        (
            stats_ref[i, cv2.CC_STAT_LEFT],
            stats_ref[i, cv2.CC_STAT_TOP],
            stats_ref[i, cv2.CC_STAT_WIDTH],
            stats_ref[i, cv2.CC_STAT_HEIGHT],
            stats_ref[i, cv2.CC_STAT_AREA],
        )
        for i in range(1, n_ref)
    }
    got_set = set()
    for i in range(count):
        x, y, w, h = np.asarray(stats["bbox"])[i]
        got_set.add((x, y, w, h, int(np.asarray(stats["area"])[i])))
    assert got_set == ref_set

    # centroids
    ref_cents = sorted(map(tuple, np.round(cents_ref[1:], 4)))
    got = np.asarray(stats["centroid"])[:count]
    got_cents = sorted((round(float(x), 4), round(float(y), 4)) for y, x in got)
    for (rx, ry), (gx, gy) in zip(ref_cents, got_cents):
        assert abs(rx - gx) < 1e-3 and abs(ry - gy) < 1e-3


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_blobs_match_cv2_8conn(seed):
    _compare_to_cv2(_random_blobs(seed))


@pytest.mark.parametrize("seed", [0, 1])
def test_blobs_match_cv2_4conn(seed):
    _compare_to_cv2(_random_blobs(seed), connectivity=4)


def test_dense_noise_many_components():
    # worst-case fragmentation: single-pixel specks
    rng = np.random.default_rng(9)
    mask = ((rng.random((48, 64)) > 0.82) * 255).astype(np.uint8)
    _compare_to_cv2(mask, max_components=2048)


def test_spiral_converges():
    # a spiral is the adversarial case for sweep-based propagation
    mask = np.zeros((65, 65), np.uint8)
    x0, x1, y0, y1 = 0, 64, 0, 64
    while x0 < x1:
        mask[y0, x0 : x1 + 1] = 255
        mask[y0 : y1 + 1, x1] = 255
        mask[y1, x0 : x1 + 1] = 255
        mask[y0 + 2 : y1 + 1, x0] = 255
        x0 += 4; x1 -= 4; y0 += 4; y1 -= 4
    _compare_to_cv2(mask)


def test_empty_and_full():
    empty = np.zeros((32, 32), np.uint8)
    labels, stats = ccl.connected_components_with_stats(empty)
    assert int(stats["count"]) == 0
    full = np.full((32, 32), 255, np.uint8)
    labels, stats = ccl.connected_components_with_stats(full)
    assert int(stats["count"]) == 1
    assert int(stats["area"][0]) == 32 * 32


def test_largest_component():
    mask = np.zeros((64, 64), np.uint8)
    mask[5:15, 5:15] = 255  # 100 px
    mask[30:60, 30:62] = 255  # 960 px
    out = ccl.largest_component(mask)
    assert bool(out["found"])
    assert int(out["area"]) == 30 * 32
    cy, cx = np.asarray(out["centroid"])
    assert abs(cy - (30 + 59) / 2) < 1e-4
    assert abs(cx - (30 + 61) / 2) < 1e-4


def test_overflow_capacity_keeps_raster_order():
    # more blobs than capacity: the first K in raster order are kept
    mask = np.zeros((16, 130), np.uint8)
    for i in range(32):
        mask[2:4, i * 4 : i * 4 + 2] = 255
    _, stats = ccl.connected_components_with_stats(mask, max_components=8)
    assert int(stats["count"]) == 8
    assert np.asarray(stats["valid"])[:8].all()
    xs = np.asarray(stats["bbox"])[:, 0]
    assert (np.diff(xs) > 0).all()


@pytest.mark.slow
def test_label_pallas_smoke_small():
    """Direct labels-vs-XLA parity coverage for the Pallas CCL kernel (interpret mode on
    CPU); the exhaustive shapes live in test_pallas_ccl.py; the fast suite
    exercises label_pallas through the red_buoy chain tests."""
    import numpy as np

    from cuauv_vision_pipeline_tpu.ops.pallas.ccl_kernel import label_pallas

    mask = np.zeros((40, 128), np.uint8)
    mask[5:15, 10:30] = 255
    mask[20:38, 90:120] = 255
    labels = np.asarray(label_pallas(mask))
    ref = np.asarray(ccl.label(mask))
    np.testing.assert_array_equal(labels, ref)
