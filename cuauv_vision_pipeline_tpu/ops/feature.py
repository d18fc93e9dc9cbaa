"""Feature-detection ops: Canny edges, Hough transforms, corner detection.

Device-side JAX implementations of the reference's feature layer
(reference utils/feature.py:43-237). Canny follows cv2's pipeline (3x3
Sobel, L1 magnitude, direction-quantized NMS with the TG22 fixed-point
sector boundaries, dual-threshold hysteresis run to fixpoint); Hough voting
is expressed as per-angle rho binning. These feed utility/debug paths —
tolerance-matched to OpenCV, not bit-exact (cv2's hysteresis stack order
and rounding differ immaterially).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sobel_3x3(gray_f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel dx/dy with BORDER_REPLICATE, [..., H, W] float32."""
    nd = gray_f.ndim
    pad_widths = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(gray_f, pad_widths, mode="edge")
    H, W = gray_f.shape[-2], gray_f.shape[-1]

    def sl(dy, dx):
        return p[..., dy : dy + H, dx : dx + W]

    # smoothing [1 2 1] x derivative [-1 0 1]
    gx = (
        (sl(0, 2) + 2 * sl(1, 2) + sl(2, 2))
        - (sl(0, 0) + 2 * sl(1, 0) + sl(2, 0))
    )
    gy = (
        (sl(2, 0) + 2 * sl(2, 1) + sl(2, 2))
        - (sl(0, 0) + 2 * sl(0, 1) + sl(0, 2))
    )
    return gx, gy


def canny(
    image: jnp.ndarray,
    lower: float,
    upper: float,
    l2_gradient: bool = False,
    hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """Canny edge detector (cv2.Canny semantics, reference
    utils/feature.py:43-67). u8 grayscale in, u8 {0,255} edge mask out."""
    gray = image.astype(jnp.float32)
    gx, gy = _sobel_3x3(gray)
    if l2_gradient:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)

    # Non-maximum suppression with cv2's TG22 sector quantization.
    TG22 = 0.4142135623730950488016887242097  # tan(pi/8)
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)

    nd = mag.ndim
    pad_widths = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    mp = jnp.pad(mag, pad_widths, mode="constant")
    H, W = mag.shape[-2], mag.shape[-1]

    def sl(dy, dx):
        return mp[..., dy + 1 : dy + 1 + H, dx + 1 : dx + 1 + W]

    horizontal = ay < ax * TG22
    vertical = ay > ax * (1.0 / TG22)
    diag_sign = (gx * gy) >= 0  # same sign -> 135deg diagonal neighbors

    keep_h = (mag > sl(0, -1)) & (mag >= sl(0, 1))
    keep_v = (mag > sl(-1, 0)) & (mag >= sl(1, 0))
    keep_d1 = (mag > sl(-1, -1)) & (mag >= sl(1, 1))  # same-sign diagonal
    keep_d2 = (mag > sl(-1, 1)) & (mag >= sl(1, -1))

    keep = jnp.where(
        horizontal,
        keep_h,
        jnp.where(vertical, keep_v, jnp.where(diag_sign, keep_d1, keep_d2)),
    )

    strong = keep & (mag > upper)
    weak = keep & (mag > lower)

    # Hysteresis: grow strong through weak (8-connectivity) to fixpoint.
    def grow(s):
        sp = jnp.pad(s, pad_widths, mode="constant")

        def n(dy, dx):
            return sp[..., dy + 1 : dy + 1 + H, dx + 1 : dx + 1 + W]

        any_nb = (
            n(-1, -1) | n(-1, 0) | n(-1, 1) | n(0, -1)
            | n(0, 1) | n(1, -1) | n(1, 0) | n(1, 1)
        )
        return s | (weak & any_nb)

    def cond(state):
        s, changed, it = state
        return jnp.logical_and(changed, it < hysteresis_iters)

    def body(state):
        s, _, it = state
        new = grow(s)
        return new, jnp.any(new != s), it + 1

    strong, _, _ = jax.lax.while_loop(
        cond, body, (grow(strong), jnp.bool_(True), jnp.int32(1))
    )
    return jnp.where(strong, jnp.uint8(255), jnp.uint8(0))


def hough_lines_accumulator(
    edges: jnp.ndarray, rho_res: float = 1.0, theta_res: float = math.pi / 180
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Standard Hough accumulator over an edge mask.

    Returns (acc[T, R], thetas[T], rhos[R]); votes are edge-pixel counts.
    """
    H, W = edges.shape[-2], edges.shape[-1]
    diag = math.hypot(H, W)
    n_rho = int(2 * math.ceil(diag / rho_res)) + 1
    n_theta = int(round(math.pi / theta_res))
    thetas = jnp.arange(n_theta, dtype=jnp.float32) * theta_res
    rho_offset = (n_rho - 1) // 2

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    fg = (edges != 0).reshape(-1)
    xf = xs.reshape(-1)
    yf = ys.reshape(-1)

    def per_theta(theta):
        rho = xf * jnp.cos(theta) + yf * jnp.sin(theta)
        bins = jnp.round(rho / rho_res).astype(jnp.int32) + rho_offset
        votes = jnp.zeros(n_rho, jnp.int32).at[bins].add(fg.astype(jnp.int32))
        return votes

    acc = jax.lax.map(per_theta, thetas)
    rhos = (jnp.arange(n_rho, dtype=jnp.float32) - rho_offset) * rho_res
    return acc, thetas, rhos


def find_lines(
    edges: np.ndarray,
    rho_res: float = 1.0,
    theta_res: float = math.pi / 180,
    threshold: int = 100,
    max_lines: int = 64,
) -> np.ndarray:
    """cv2.HoughLines equivalent: returns [N, 2] (rho, theta) of peaks over
    `threshold`, strongest first (reference utils/feature.py find_lines)."""
    acc, thetas, rhos = hough_lines_accumulator(edges, rho_res, theta_res)
    acc = np.asarray(acc)
    # local maxima over the 4-neighborhood like cv2
    padded = np.pad(acc, 1)
    center = padded[1:-1, 1:-1]
    is_peak = (
        (center >= padded[1:-1, :-2])
        & (center >= padded[1:-1, 2:])
        & (center >= padded[:-2, 1:-1])
        & (center >= padded[2:, 1:-1])
        & (center > threshold)
    )
    ti, ri = np.nonzero(is_peak)
    votes = center[ti, ri]
    order = np.argsort(-votes)[:max_lines]
    return np.stack(
        [np.asarray(rhos)[ri[order]], np.asarray(thetas)[ti[order]]], axis=-1
    )


def min_eigenvalue_map(gray: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Shi-Tomasi corner response: min eigenvalue of the structure tensor
    (cv2.goodFeaturesToTrack's quality map)."""
    g = gray.astype(jnp.float32)
    gx, gy = _sobel_3x3(g)
    # cv2 scales Sobel by 1/4 for blockSize summation via boxFilter
    gx = gx * 0.25
    gy = gy * 0.25
    xx, yy, xy = gx * gx, gy * gy, gx * gy

    def box(a):
        nd = a.ndim
        pad = block_size // 2
        p = jnp.pad(a, [(0, 0)] * (nd - 2) + [(pad, pad), (pad, pad)], mode="edge")
        return jax.lax.reduce_window(
            p,
            jnp.float32(0),
            jax.lax.add,
            (1,) * (nd - 2) + (block_size, block_size),
            (1,) * nd,
            "VALID",
        ) / (block_size * block_size)

    sxx, syy, sxy = box(xx), box(yy), box(xy)
    tr = (sxx + syy) * 0.5
    det = jnp.sqrt((sxx - syy) ** 2 * 0.25 + sxy * sxy)
    return tr - det


def find_corners(
    gray: np.ndarray,
    max_corners: int,
    quality_thresh: float = 0.01,
    min_distance: int = 10,
) -> np.ndarray:
    """cv2.goodFeaturesToTrack equivalent (reference utils/feature.py:104-125).
    Returns [N, 1, 2] float32 (x, y) like cv2."""
    resp = np.asarray(min_eigenvalue_map(jnp.asarray(gray)))
    thresh = resp.max() * quality_thresh
    # 3x3 NMS
    padded = np.pad(resp, 1, constant_values=-np.inf)
    windows = np.max(
        [padded[dy : dy + resp.shape[0], dx : dx + resp.shape[1]]
         for dy in range(3) for dx in range(3)],
        axis=0,
    )
    peaks = (resp == windows) & (resp > thresh)
    ys, xs = np.nonzero(peaks)
    order = np.argsort(-resp[ys, xs])
    ys, xs = ys[order], xs[order]

    selected = []
    min_d2 = min_distance * min_distance
    for y, x in zip(ys, xs):
        ok = True
        for sy, sx in selected:
            if (sy - y) ** 2 + (sx - x) ** 2 < min_d2:
                ok = False
                break
        if ok:
            selected.append((y, x))
            if len(selected) >= max_corners:
                break
    if not selected:
        return np.empty((0, 1, 2), np.float32)
    return np.array(
        [[[float(x), float(y)]] for y, x in selected], dtype=np.float32
    )
