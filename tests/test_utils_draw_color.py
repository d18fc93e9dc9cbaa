"""Tests for drawing primitives and the remaining utils/color functions."""

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.utils import color as UC
from cuauv_vision_pipeline_tpu.utils import draw as D
from cuauv_vision_pipeline_tpu.utils import helpers as H


def _canvas():
    return np.zeros((60, 80, 3), np.uint8)


def test_color_palette_matches_reference_values():
    assert D.Color.RED.value == (75, 25, 230)
    assert D.Color.LIME() == (60, 245, 210)
    assert D.get_color("hotpink") == (180, 105, 255)
    with pytest.raises(ValueError):
        D.get_color("not_a_color")
    assert len(D.Color) == 26


def test_draw_circle_filled_and_outline():
    img = _canvas()
    D.draw_circle(img, (40, 30), 10, D.Color.RED, thickness=-1)
    assert tuple(img[30, 40]) == D.Color.RED.value  # center filled
    img2 = _canvas()
    D.draw_circle(img2, (40, 30), 10, D.Color.GREEN, thickness=1)
    assert tuple(img2[30, 40]) == (0, 0, 0)  # center empty
    assert tuple(img2[30, 50]) == D.Color.GREEN.value  # on the ring


def test_draw_line_and_rect():
    img = _canvas()
    D.draw_line(img, (10, 10), (70, 10), D.Color.WHITE, 1)
    assert (img[10, 10:70] == 255).all()
    img = _canvas()
    D.draw_rect(img, (10, 10), (30, 25), D.Color.BLUE, -1)
    assert tuple(img[15, 15]) == D.Color.BLUE.value
    assert tuple(img[30, 40]) == (0, 0, 0)


def test_draw_polylines_and_contours_close_shape():
    img = _canvas()
    square = np.array([[10, 10], [40, 10], [40, 40], [10, 40]])
    D.draw_polylines(img, [square], True, D.Color.YELLOW, 1)
    assert tuple(img[10, 25]) == D.Color.YELLOW.value  # top edge
    assert tuple(img[25, 10]) == D.Color.YELLOW.value  # left edge (closed)


def test_draw_text_changes_pixels():
    img = _canvas()
    D.draw_text(img, "hi", (5, 30), 1.0, D.Color.WHITE)
    assert img.sum() > 0


def test_draw_clipping_out_of_bounds_is_safe():
    img = _canvas()
    D.draw_circle(img, (-50, -50), 10, D.Color.RED, 2)
    D.draw_line(img, (-10, -10), (200, 200), D.Color.RED, 3)
    D.draw_rect(img, (70, 50), (300, 300), D.Color.RED, -1)
    assert img.shape == (60, 80, 3)  # no exception, in-bounds writes only


def test_kmeans_separates_two_colors():
    img = np.zeros((20, 20, 3), np.uint8)
    img[:, 10:] = (200, 50, 50)
    img[:, :10] = (10, 200, 10)
    compactness, labels, centers = UC.kmeans(img, 2, iterations=15)
    assert labels.shape == (400, 1)
    left = labels.reshape(20, 20)[:, :10]
    right = labels.reshape(20, 20)[:, 10:]
    assert (left == left[0, 0]).all()
    assert (right == right[0, 0]).all()
    assert left[0, 0] != right[0, 0]
    mask = UC.kmeans_mask(labels, (20, 20), int(left[0, 0]))
    assert (mask[:, :10] == 255).all() and (mask[:, 10:] == 0).all()


@pytest.mark.slow
def test_white_balance_reduces_cast():
    rng = np.random.default_rng(0)
    img = rng.integers(60, 120, (40, 40, 3), dtype=np.uint8)
    img[..., 0] = np.clip(img[..., 0].astype(int) + 80, 0, 255)  # blue cast
    out = UC.white_balance_bgr(img)
    before = abs(int(img[..., 0].mean()) - int(img[..., 2].mean()))
    after = abs(int(out[..., 0].mean()) - int(out[..., 2].mean()))
    assert after < before


def test_color_dist():
    img = np.full((4, 4, 3), 100, np.uint8)
    d = UC.color_dist(img, (100, 100, 100))
    np.testing.assert_allclose(d, 0)
    d = UC.color_dist(img, (103, 100, 96))
    np.testing.assert_allclose(d, 5.0)


def test_helpers():
    assert H.next_odd(4) == 5
    assert H.next_odd(5) == 5
    arr = np.arange(6).reshape(2, 3)
    dev = H.to_umat(arr)
    back = H.from_umat(dev)
    np.testing.assert_array_equal(back, arr)
    np.testing.assert_array_equal(H.as_mat(dev), arr)
