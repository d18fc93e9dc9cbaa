"""Fused Pallas morphology vs the composed XLA reduce_window path.

Bit-exactness over sizes that exercise strip seams (H > STRIP_ROWS),
ragged right edges (W not a lane multiple), and image borders — the
places the halo/identity handling can silently diverge.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuauv_vision_pipeline_tpu.ops import morphology as M  # noqa: E402
from cuauv_vision_pipeline_tpu.ops.pallas.morph_kernel import (  # noqa: E402
    STRIP_ROWS,
    fused_morph,
)

KERNEL = M.rect_kernel(5)


def _reference(mask, operation):
    x = jnp.asarray(mask)
    if operation == "open":
        return np.asarray(M.open_morph(x, KERNEL))
    if operation == "close":
        return np.asarray(M.close_morph(x, KERNEL))
    return np.asarray(M.close_morph(M.open_morph(x, KERNEL), KERNEL))


def _random_mask(rng, h, w, p=0.35):
    return (rng.random((h, w)) < p).astype(np.uint8) * 255


@pytest.mark.parametrize("operation", ["open", "close", "open_close"])
@pytest.mark.parametrize(
    "shape",
    [
        (40, 130),  # single strip, ragged width
        (STRIP_ROWS + 9, 256),  # one seam
        (3 * STRIP_ROWS, 203),  # several seams + ragged width
    ],
)
def test_fused_morph_bit_exact(operation, shape):
    rng = np.random.default_rng(hash((operation, shape)) % 2**31)
    mask = _random_mask(rng, *shape)
    got = np.asarray(fused_morph(jnp.asarray(mask), operation))
    np.testing.assert_array_equal(got, _reference(mask, operation), err_msg=operation)


def test_fused_morph_border_structures():
    """Structures hugging every border + isolated speckles (the pixels
    open removes) + pinholes (the pixels close fills)."""
    h, w = STRIP_ROWS + 20, 150
    mask = np.zeros((h, w), np.uint8)
    mask[0:12, 0:12] = 255  # top-left corner block
    mask[-9:, -17:] = 255  # bottom-right corner block
    mask[30, 70] = 255  # speckle: open must erase
    mask[40:60, 40:60] = 255
    mask[49, 49] = 0  # pinhole: close must fill
    mask[0, :] = 255  # full top edge line
    got = np.asarray(fused_morph(jnp.asarray(mask), "open_close"))
    np.testing.assert_array_equal(got, _reference(mask, "open_close"))


def test_fused_morph_values_preserved():
    """u8 in, u8 out, values stay in the input's {0, 255} alphabet."""
    rng = np.random.default_rng(0)
    mask = _random_mask(rng, 70, 140)
    got = np.asarray(fused_morph(jnp.asarray(mask), "open_close"))
    assert got.dtype == np.uint8
    assert set(np.unique(got)) <= {0, 255}
