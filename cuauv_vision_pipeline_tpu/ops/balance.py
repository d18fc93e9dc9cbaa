"""Underwater color-correction engine, batched for TPU.

Capability parity with the reference's multithreaded C++ color balancer
(reference utils/color_correction/color_balance.cpp:343-780, exposed as
``process_frame(arr, h, w, depth, equalize_rgb, rgb_contrast_correct,
hsv_contrast_correct, hsi_contrast_correct, rgb_extrema_clipping,
adaptive_cast_correction, horizontal_blocks, vertical_blocks)``):

* percentile extrema clipping — 0.4% of outliers (0.2% per tail) from
  per-channel u8 histograms (exact, no sort);
* blockwise gray-world equalization — per-tile channel means (falling back
  to the global mean when a tile deviates by more than 1/6 of it,
  cpp:510-514), gain-up of the two non-dominant channels toward the
  dominant one, optional adaptive taper ``((255-v)/255)^0.25`` so bright
  pixels gain less (cpp:441-544);
* RGB contrast stretch by channel rank — max channel stretches down, mid
  both ways, min up (cpp:546-645);
* HSV contrast stretch — S/V percentile-clipped and restretched through the
  bit-exact HSV ops (cpp:647-700);
* HSI contrast stretch — float HSI with S/I percentile stretch
  (cpp:167-341, 702-774).

The reference's 8-thread intra-op parallelism (cpp:241-256) is replaced by
XLA data parallelism; everything here jits into one fused graph and batches
over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import color as C


class BalanceConfig(NamedTuple):
    """Static configuration (compile-time flags, like the reference's
    boolean arguments)."""

    equalize_rgb: bool = True
    rgb_contrast_correct: bool = False
    hsv_contrast_correct: bool = False
    hsi_contrast_correct: bool = True
    rgb_extrema_clipping: bool = True
    adaptive_cast_correction: bool = False
    horizontal_blocks: int = 1
    vertical_blocks: int = 1


def _u8_percentiles(channel: jnp.ndarray, lo: float, hi: float):
    """Exact u8 percentile bounds via histogram + cumulative search
    (the reference's percentile_min_max, cpp:112-142)."""
    flat = channel.reshape(-1).astype(jnp.int32)
    hist = jnp.zeros(256, jnp.int32).at[flat].add(1)
    cum = jnp.cumsum(hist)
    n = flat.shape[0]
    lo_count = jnp.asarray(lo * n, jnp.int32)
    hi_count = jnp.asarray(hi * n, jnp.int32)
    vmin = jnp.argmax(cum > lo_count)  # smallest v with cum(v) > lo
    vmax = jnp.argmax(cum >= hi_count)  # smallest v covering hi fraction
    return vmin.astype(jnp.float32), vmax.astype(jnp.float32)


def _clip_stretch(channel_f, vmin, vmax, out_lo=0.0, out_hi=255.0):
    span = jnp.maximum(vmax - vmin, 1.0)
    out = (jnp.clip(channel_f, vmin, vmax) - vmin) * ((out_hi - out_lo) / span) + out_lo
    return jnp.clip(out, 0.0, 255.0)


def _block_means(channel_f: jnp.ndarray, hb: int, vb: int) -> jnp.ndarray:
    """Per-pixel map of the mean of the tile containing each pixel."""
    H, W = channel_f.shape[-2], channel_f.shape[-1]
    ys = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * vb) // H
    xs = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) * hb) // W
    tile = ys * hb + xs  # [H, W] tile index in [0, hb*vb)
    n_tiles = hb * vb
    onehot = jax.nn.one_hot(tile.reshape(-1), n_tiles, dtype=jnp.float32)
    sums = onehot.T @ channel_f.reshape(-1)
    counts = onehot.sum(axis=0)
    means = sums / jnp.maximum(counts, 1.0)
    return means[tile.reshape(-1)].reshape(H, W)


def _equalize_rgb(r, g, b, cfg: BalanceConfig):
    """Blockwise gray-world cast removal (cpp:441-544)."""
    hb, vb = max(cfg.horizontal_blocks, 1), max(cfg.vertical_blocks, 1)
    r_avg, g_avg, b_avg = jnp.mean(r), jnp.mean(g), jnp.mean(b)

    if hb == 1 and vb == 1:
        lr, lg, lb = (
            jnp.broadcast_to(r_avg, r.shape),
            jnp.broadcast_to(g_avg, g.shape),
            jnp.broadcast_to(b_avg, b.shape),
        )
    else:
        lr = _block_means(r, hb, vb)
        lg = _block_means(g, hb, vb)
        lb = _block_means(b, hb, vb)
        # fall back to the global mean where a tile deviates > avg/6
        deviant = (
            (jnp.abs(lr - r_avg) > r_avg / 6)
            | (jnp.abs(lg - g_avg) > g_avg / 6)
            | (jnp.abs(lb - b_avg) > b_avg / 6)
        )
        lr = jnp.where(deviant, r_avg, lr)
        lg = jnp.where(deviant, g_avg, lg)
        lb = jnp.where(deviant, b_avg, lb)

    dominant = jnp.maximum(jnp.maximum(lr, lg), lb)
    safe = lambda x: jnp.maximum(x, 1e-6)

    def gain_for(channel, local_mean):
        gain = dominant / safe(local_mean)
        if cfg.adaptive_cast_correction:
            taper = jnp.power(jnp.clip((255.0 - channel) / 255.0, 0.0, 1.0), 0.25)
            return taper * (gain - 1.0) + 1.0
        return gain

    r2 = jnp.where(lr < dominant, jnp.clip(r * gain_for(r, lr), 0, 255), r)
    g2 = jnp.where(lg < dominant, jnp.clip(g * gain_for(g, lg), 0, 255), g)
    b2 = jnp.where(lb < dominant, jnp.clip(b * gain_for(b, lb), 0, 255), b)
    return r2, g2, b2


def _rgb_contrast(r, g, b):
    """Rank-ordered per-channel stretch (cpp:546-645): min channel stretches
    up, mid both ways, max down, all toward the mean of the three maxima."""
    channels = jnp.stack([r, g, b])
    avgs = jnp.stack([jnp.mean(r), jnp.mean(g), jnp.mean(b)])
    mins = jnp.stack([_u8_percentiles(c, 0.002, 0.998)[0] for c in (r, g, b)])
    maxs = jnp.stack([_u8_percentiles(c, 0.002, 0.998)[1] for c in (r, g, b)])

    order = jnp.argsort(avgs)  # [min_idx, mid_idx, max_idx]
    desired_max = jnp.mean(maxs)

    def stretch(i, rank):
        c = channels[i]
        cmin, cmax = mins[i], maxs[i]
        span = jnp.maximum(cmax - cmin, 1.0)
        ratio = jnp.where(
            rank == 0,
            (desired_max - cmin) / span,  # min channel: stretch up
            jnp.where(
                rank == 1,
                desired_max / span,  # mid: both sides
                cmax / span,  # max: stretch down
            ),
        )
        return jnp.clip((c - cmin) * ratio, 0, 255)

    # select per channel based on its rank in the average ordering
    result = []
    for i in range(3):
        rank_of_i = jnp.argmax(order == i)
        result.append(stretch(i, rank_of_i))
    return result[0], result[1], result[2]


def _hsv_contrast(image_u8):
    """S/V percentile stretch through the exact HSV ops (cpp:647-700)."""
    hsv = C.bgr_to_hsv(image_u8).astype(jnp.float32)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    s_min, s_max = _u8_percentiles(s.astype(jnp.uint8), 0.002, 0.998)
    v_min, v_max = _u8_percentiles(v.astype(jnp.uint8), 0.002, 0.998)
    s2 = _clip_stretch(s, s_min, s_max)
    v2 = _clip_stretch(v, v_min, v_max)
    out = jnp.stack([h, s2, v2], axis=-1).astype(jnp.uint8)
    return C.hsv_to_bgr(out)


def _rgb_to_hsi(r, g, b):
    """Float HSI (the reference's custom converter, cpp:167-240)."""
    i = (r + g + b) / 3.0
    minimum = jnp.minimum(jnp.minimum(r, g), b)
    s = jnp.where(i > 0, 1.0 - minimum / jnp.maximum(i, 1e-6), 0.0)
    num = 0.5 * ((r - g) + (r - b))
    den = jnp.sqrt((r - g) ** 2 + (r - b) * (g - b))
    theta = jnp.arccos(jnp.clip(num / jnp.maximum(den, 1e-6), -1.0, 1.0))
    h = jnp.where(b <= g, theta, 2 * jnp.pi - theta)
    return h, s, i


def _hsi_to_rgb(h, s, i):
    """Inverse HSI (cpp:242-341), sector-based."""
    h = jnp.where(h < 0, h + 2 * jnp.pi, h)
    sector = jnp.floor(h / (2 * jnp.pi / 3))  # 0, 1, 2
    h_local = h - sector * (2 * jnp.pi / 3)
    cos_h = jnp.cos(h_local)
    cos_rest = jnp.cos(jnp.pi / 3 - h_local)
    x = i * (1.0 - s)
    y = i * (1.0 + s * cos_h / jnp.maximum(cos_rest, 1e-6))
    z = 3.0 * i - x - y
    r = jnp.where(sector == 0, y, jnp.where(sector == 1, x, z))
    g = jnp.where(sector == 0, z, jnp.where(sector == 1, y, x))
    b = jnp.where(sector == 0, x, jnp.where(sector == 1, z, y))
    return r, g, b


def _hsi_contrast(r, g, b):
    """S/I percentile stretch in HSI space (cpp:702-774)."""
    h, s, i = _rgb_to_hsi(r, g, b)
    s_min = jnp.percentile(s, 0.2)
    s_max = jnp.percentile(s, 99.8)
    i_min = jnp.percentile(i, 0.2)
    i_max = jnp.percentile(i, 99.8)
    s2 = (jnp.clip(s, s_min, s_max) - s_min) / jnp.maximum(s_max - s_min, 1e-6)
    i2 = _clip_stretch(i, i_min, i_max)
    r2, g2, b2 = _hsi_to_rgb(h, s2, i2)
    return (
        jnp.clip(r2, 0, 255),
        jnp.clip(g2, 0, 255),
        jnp.clip(b2, 0, 255),
    )


def balance(image: jnp.ndarray, cfg: BalanceConfig = BalanceConfig()) -> jnp.ndarray:
    """Full color-correction pipeline on a u8 BGR image (cpp:343-780).

    Stages run in the reference's order: extrema clipping -> blockwise
    gray-world equalization -> (rgb | hsv | hsi) contrast correction.
    Jit with cfg static: ``jax.jit(balance, static_argnums=1)``.
    """
    img = image.astype(jnp.float32)
    b = img[..., 0]
    g = img[..., 1]
    r = img[..., 2]

    if cfg.rgb_extrema_clipping:
        for name, ch in (("r", r), ("g", g), ("b", b)):
            vmin, vmax = _u8_percentiles(ch.astype(jnp.uint8), 0.002, 0.998)
            clipped = jnp.clip(ch, vmin, vmax)
            if name == "r":
                r = clipped
            elif name == "g":
                g = clipped
            else:
                b = clipped

    if cfg.equalize_rgb:
        r, g, b = _equalize_rgb(r, g, b, cfg)

    if cfg.rgb_contrast_correct:
        r, g, b = _rgb_contrast(r, g, b)

    if cfg.hsv_contrast_correct:
        out = _hsv_contrast(
            jnp.stack([b, g, r], axis=-1).astype(jnp.uint8)
        ).astype(jnp.float32)
        b, g, r = out[..., 0], out[..., 1], out[..., 2]

    if cfg.hsi_contrast_correct:
        r, g, b = _hsi_contrast(r, g, b)

    return jnp.stack([b, g, r], axis=-1).astype(jnp.uint8)


def process_frame(
    arr: np.ndarray,
    equalize_rgb: bool = True,
    rgb_contrast_correct: bool = False,
    hsv_contrast_correct: bool = False,
    hsi_contrast_correct: bool = True,
    rgb_extrema_clipping: bool = True,
    adaptive_cast_correction: bool = False,
    horizontal_blocks: int = 1,
    vertical_blocks: int = 1,
) -> np.ndarray:
    """Flat-argument entry matching the reference C ABI call shape
    (color_balance.cpp:343; the reference mutates in place — this returns
    the corrected image)."""
    cfg = BalanceConfig(
        equalize_rgb,
        rgb_contrast_correct,
        hsv_contrast_correct,
        hsi_contrast_correct,
        rgb_extrema_clipping,
        adaptive_cast_correction,
        horizontal_blocks,
        vertical_blocks,
    )
    return np.asarray(_balance_jit(arr, cfg))


# module-level wrapper: a fresh jax.jit per call would re-trace every frame
_balance_jit = jax.jit(balance, static_argnums=1)
