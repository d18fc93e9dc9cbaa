"""Pallas CCL kernel vs the XLA reference implementation (interpret mode on
the CPU test backend; the TPU path is exercised by bench.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")

from cuauv_vision_pipeline_tpu.ops import ccl
from cuauv_vision_pipeline_tpu.ops.pallas.ccl_kernel import label_pallas


def _blobs(seed, shape=(96, 128), thresh=140):
    rng = np.random.default_rng(seed)
    blurred = cv2.GaussianBlur(
        rng.integers(0, 256, shape, dtype=np.uint8), (15, 15), 0
    )
    return ((blurred > thresh) * 255).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_labeling(seed):
    mask = _blobs(seed)
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask)), np.asarray(ccl.label(mask))
    )


def test_multi_strip_merge():
    # image taller than one strip: components span strip boundaries
    mask = _blobs(7, shape=(140, 150))
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask)), np.asarray(ccl.label(mask))
    )


def test_vertical_bar_spanning_all_strips():
    mask = np.zeros((150, 140), np.uint8)
    mask[:, 70:75] = 255
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask)), np.asarray(ccl.label(mask))
    )


def test_spiral_global_convergence():
    mask = np.zeros((64, 64), np.uint8)
    x0, x1, y0, y1 = 0, 63, 0, 63
    while x0 < x1:
        mask[y0, x0 : x1 + 1] = 255
        mask[y0 : y1 + 1, x1] = 255
        mask[y1, x0 : x1 + 1] = 255
        mask[y0 + 2 : y1 + 1, x0] = 255
        x0 += 4; x1 -= 4; y0 += 4; y1 -= 4
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask)), np.asarray(ccl.label(mask))
    )


def test_connectivity_4():
    # diagonal checkerboard: one component under 8-conn, many under 4-conn
    mask = np.zeros((24, 24), np.uint8)
    mask[::2, ::2] = 255
    mask[1::2, 1::2] = 255
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask, connectivity=4)),
        np.asarray(ccl.label(mask, connectivity=4)),
    )
    np.testing.assert_array_equal(
        np.asarray(label_pallas(mask, connectivity=8)),
        np.asarray(ccl.label(mask, connectivity=8)),
    )


def test_non_tile_aligned_shapes():
    for shape in [(33, 130), (31, 127)]:
        mask = _blobs(5, shape=shape)
        np.testing.assert_array_equal(
            np.asarray(label_pallas(mask)), np.asarray(ccl.label(mask))
        )


def test_batched_matches_per_image():
    from cuauv_vision_pipeline_tpu.ops.pallas.ccl_kernel import (
        label_pallas_batched,
    )

    masks = np.stack([_blobs(s, shape=(72, 96)) for s in (3, 4, 5)])
    masks[0, 0] = 255   # components touching the stack seams
    masks[0, -1] = 255
    masks[1, -1] = 255
    masks[2, 0] = 255
    batched = np.asarray(label_pallas_batched(masks))
    for b in range(masks.shape[0]):
        np.testing.assert_array_equal(
            batched[b], np.asarray(ccl.label(masks[b]))
        )


def test_batched_separator_never_bridges():
    from cuauv_vision_pipeline_tpu.ops.pallas.ccl_kernel import (
        label_pallas_batched,
    )

    # both images fully foreground: without the separator row the stack
    # would fuse into one component crossing image boundaries
    masks = np.full((2, 24, 40), 255, np.uint8)
    batched = np.asarray(label_pallas_batched(masks))
    assert (batched[0] == 0).all()  # each image = one component, root 0
    assert (batched[1] == 0).all()  # SAME local root: bias stripped
