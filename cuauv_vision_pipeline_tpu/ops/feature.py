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


def host_nonzero2d(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(ys, xs) of a 2-D bool/num array via flatnonzero + divmod.

    numpy's 2-D ``nonzero`` walks a generic multi-index iterator (~2-3 ms on
    a 720p mask); the flat scan + one divmod is ~5x faster and bit-identical
    in output order (row-major)."""
    mask = np.asarray(mask)
    flat = mask.reshape(-1)  # contiguous inputs: a view
    return np.divmod(np.flatnonzero(flat), mask.shape[1])


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


def _sobel_3x3_int(image_u8: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 3x3 Sobel dx/dy on int32 with BORDER_REPLICATE — the CV_16S
    gradients cv2.Canny computes (values bounded by +-4*255, exact)."""
    nd = image_u8.ndim
    pad_widths = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(image_u8.astype(jnp.int32), pad_widths, mode="edge")
    H, W = image_u8.shape[-2], image_u8.shape[-1]

    def sl(dy, dx):
        return p[..., dy : dy + H, dx : dx + W]

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
    """Canny edge detector, bit-exact vs cv2.Canny (aperture 3).

    Replicates OpenCV's u8 path end to end (reference utils/feature.py:43-67
    wraps cv2.Canny): exact int16-range Sobel with replicate border, integer
    L1 (or squared-L2) magnitude with zero-padded borders, NMS with the
    TG22=13573 fixed-point sector boundaries and OpenCV's exact mix of
    strict/non-strict neighbor comparisons, and dual-threshold hysteresis.
    cv2's hysteresis is a DFS from strong pixels, but its RESULT is
    order-independent — the set of candidates 8-connected to a strong
    pixel — so it is computed here as a min-label propagation over the
    candidate mask (ops/ccl.propagate_min) with pointer-jumping, converging
    in O(log diameter) passes on device. u8 grayscale in, u8 {0,255} out.
    """
    low, high = canny_prep_thresholds(lower, upper, l2_gradient)
    return canny_core(image, low, high, l2_gradient, hysteresis_iters)


def canny_prep_thresholds(
    lower: float, upper: float, l2_gradient: bool
) -> Tuple[int, int]:
    """cv2's host-side threshold prep (canny.cpp): swap, L2 squares +
    clamps, then cvFloor to int."""
    lo, hi = float(lower), float(upper)
    if lo > hi:
        lo, hi = hi, lo
    if l2_gradient:
        lo, hi = min(32767.0, lo), min(32767.0, hi)
        if lo > 0:
            lo *= lo
        if hi > 0:
            hi *= hi
    return int(math.floor(lo)), int(math.floor(hi))


def canny_core(
    image: jnp.ndarray,
    low,
    high,
    l2_gradient: bool = False,
    hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """canny() after threshold prep. ``low``/``high`` may be TRACED int32
    scalars — auto-threshold callers (simple_canny computes thresholds from
    each frame's median) then reuse one compiled executable per (shape,
    l2_gradient) instead of compiling per threshold value."""
    from .ccl import propagate_min

    dx, dy = _sobel_3x3_int(image)
    if l2_gradient:
        mag = dx * dx + dy * dy
    else:
        mag = jnp.abs(dx) + jnp.abs(dy)

    nd = mag.ndim
    pad_widths = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    # cv2 pads every magnitude row with 0 at both ends and treats rows
    # above/below the image as all-zero — border pixels compare against 0
    mp = jnp.pad(mag, pad_widths, mode="constant")
    H, W = mag.shape[-2], mag.shape[-1]

    def sl(dy_, dx_):
        return mp[..., dy_ + 1 : dy_ + 1 + H, dx_ + 1 : dx_ + 1 + W]

    # sector quantization in cv2's fixed point: y*2^15 vs x*TG22 / x*TG67
    TG22 = 13573  # tan(22.5deg) * 2^15, rounded
    ax = jnp.abs(dx)
    ay15 = jnp.abs(dy) << 15
    tg22x = ax * TG22
    tg67x = tg22x + ((ax + ax) << 15)

    horizontal = ay15 < tg22x
    vertical = ay15 > tg67x
    same_sign = (dx ^ dy) >= 0  # cv2: s = (xs ^ ys) < 0 ? -1 : 1

    keep_h = (mag > sl(0, -1)) & (mag >= sl(0, 1))
    keep_v = (mag > sl(-1, 0)) & (mag >= sl(1, 0))
    keep_d1 = (mag > sl(-1, -1)) & (mag > sl(1, 1))  # s=+1: both strict
    keep_d2 = (mag > sl(-1, 1)) & (mag > sl(1, -1))  # s=-1: both strict

    keep = jnp.where(
        horizontal,
        keep_h,
        jnp.where(vertical, keep_v, jnp.where(same_sign, keep_d1, keep_d2)),
    )

    cand = keep & (mag > low)  # cv2 gates NMS on m > low
    strong = cand & (mag > high)

    # Hysteresis: a candidate is an edge iff its 8-connected candidate
    # component contains a strong pixel. Encode strongness above the raster
    # index and min-propagate; OFFSET bounds H*W (<= 2^24 covers 4K frames).
    OFFSET = 1 << 24
    ys = jax.lax.broadcasted_iota(jnp.int32, mag.shape, nd - 2)
    xs = jax.lax.broadcasted_iota(jnp.int32, mag.shape, nd - 1)
    ridx = ys * W + xs
    seeds = jnp.where(strong, ridx, ridx + OFFSET)
    final = propagate_min(
        seeds, cand, max_iters=hysteresis_iters, jump_mask=OFFSET - 1
    )
    edge = cand & (final < OFFSET)
    return jnp.where(edge, jnp.uint8(255), jnp.uint8(0))


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


# creating the jit wrapper is free (no trace/compile until first call)
_hough_acc_jit = jax.jit(hough_lines_accumulator, static_argnums=(1, 2))


def find_lines(
    edges: np.ndarray,
    rho_res: float = 1.0,
    theta_res: float = math.pi / 180,
    threshold: int = 100,
    max_lines: int = 64,
) -> np.ndarray:
    """cv2.HoughLines equivalent: returns [N, 2] (rho, theta) of peaks over
    `threshold`, strongest first (reference utils/feature.py find_lines)."""
    # one fused jit for the accumulator (res args shape the output, so they
    # are static); eager execution costs a per-op dispatch compile cascade
    acc, thetas, rhos = _hough_acc_jit(edges, rho_res, theta_res)
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
    ti, ri = host_nonzero2d(is_peak)
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


_min_eig_jit = jax.jit(min_eigenvalue_map, static_argnums=(1,))


def find_corners(
    gray: np.ndarray,
    max_corners: int,
    quality_thresh: float = 0.01,
    min_distance: int = 10,
) -> np.ndarray:
    """cv2.goodFeaturesToTrack equivalent (reference utils/feature.py:104-125).
    Returns [N, 1, 2] float32 (x, y) like cv2."""
    resp = np.asarray(_min_eig_jit(jnp.asarray(gray)))
    thresh = resp.max() * quality_thresh
    # 3x3 NMS
    padded = np.pad(resp, 1, constant_values=-np.inf)
    windows = np.max(
        [padded[dy : dy + resp.shape[0], dx : dx + resp.shape[1]]
         for dy in range(3) for dx in range(3)],
        axis=0,
    )
    peaks = (resp == windows) & (resp > thresh)
    ys, xs = host_nonzero2d(peaks)
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


# ---------------------------------------------------------------------------
# device keypoint detection + description (the TPU-native pose front end)
# ---------------------------------------------------------------------------

_DESC_BORDER = 8  # half-size of the 16x16 descriptor patch


def _normalize_desc(d: jnp.ndarray) -> jnp.ndarray:
    v = d.reshape(-1)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-9)
    v = jnp.minimum(v, 0.2)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-9)


def describe_at(
    gray: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    oriented: bool = False,
):
    """SIFT-like 128-D descriptors at given pixel locations, vectorized:
    8-bin gradient-orientation histograms over the 4x4 cells of a 16x16
    patch, L2-normalized with the standard 0.2 clip — computed for ALL
    keypoints in one gather+reduce instead of a Python loop per keypoint.
    Locations are clamped to the descriptor border.

    oriented=False is the same math as the host fallback descriptor
    (utils/sift._builtin_detect_and_compute) — axis-aligned sampling, NOT
    rotation invariant. oriented=True adds SIFT-style rotation invariance
    (the pose flow's real regime: the vehicle yaws over a planar target):
    a 36-bin dominant-orientation vote per keypoint, then the descriptor
    grid rotates with the keypoint — gradient vectors bilinearly resampled
    at the rotated coordinates and re-expressed in the keypoint frame.

    The oriented path is patch-local: ONE contiguous 24x24 slice of
    gx/gy per keypoint, then every resampling step is dense arithmetic
    on [K, ...] blocks with the bilinear taps expressed as factored
    one-hot contractions on the MXU. (The first version bilinearly
    gathered the FULL-image gradient fields — 512 kp x 256 samples x
    4 taps x 2 fields of random HBM gathers, 14.5 ms/frame at 720p and
    77%% of the bins pose-chain step; the patch-local form measures
    <1 ms. Random gathers from large HBM operands are the single worst
    op class on TPU — keep gathers small and contiguous.)

    gray [H, W] -> des [K, 128] float32 (rows L2-unit or zero)."""
    g = gray.astype(jnp.float32)
    H, W = g.shape
    gx, gy = _sobel_3x3(g)

    # oriented sampling reaches 7.5*sqrt(2)+1 ~ 11.6 px; clamp keypoints
    # far enough in that no rotated sample lands on edge-replicated rows
    b = 12 if oriented else _DESC_BORDER
    ys = jnp.clip(ys, b, H - b - 1)
    xs = jnp.clip(xs, b, W - b - 1)
    b = _DESC_BORDER  # axis-aligned patch extraction stays 16x16

    if not oriented:
        mag = jnp.hypot(gx, gy)
        ang = jnp.arctan2(gy, gx) % (2 * np.pi)
        bins = jnp.floor(ang / (np.pi / 4)).astype(jnp.int32) % 8

        # gather the small mag/bin patches first, THEN one-hot:
        # [K, 16, 16, 8] instead of materializing an [H, W, 8] field
        def one_axis_aligned(y, x):
            m = jax.lax.dynamic_slice(mag, (y - b, x - b), (16, 16))
            a = jax.lax.dynamic_slice(bins, (y - b, x - b), (16, 16))
            patch = jax.nn.one_hot(a, 8, dtype=jnp.float32) * m[..., None]
            return _normalize_desc(
                patch.reshape(4, 4, 4, 4, 8).sum(axis=(1, 3))
            )

        return jax.vmap(one_axis_aligned)(ys, xs)

    # one contiguous gradient patch per keypoint: [K, 2, 24, 24] covers
    # the full rotated reach (7.5*sqrt(2)+1 ~ 11.6 < 12) around each
    # keypoint, so every bilinear tap below indexes the patch, never the
    # full image
    P_SZ, P_HALF = 24, 12
    gxy = jnp.stack([gx, gy])  # [2, H, W]

    def _patch(y, x):
        return jax.lax.dynamic_slice(
            gxy, (0, y - P_HALF, x - P_HALF), (2, P_SZ, P_SZ)
        )

    pg = jax.vmap(_patch)(ys, xs)  # [K, 2, 24, 24]

    # rotated sampling grid, shared by every keypoint
    off = jnp.arange(16, dtype=jnp.float32) - 7.5
    gy_off, gx_off = jnp.meshgrid(off, off, indexing="ij")  # [16, 16]

    # spatial soft-binning weights + Gaussian window (SIFT's trilinear
    # accumulation): hard cell assignment makes boundary pixels jump
    # cells under the 1-2 px detection shifts rotation causes. These
    # depend only on the fixed grid — computed once, shared by every
    # keypoint. Cell coordinate: sample s lands at (s + 7.5)/4 - 0.5 in
    # [-0.625, 3.625]; out-of-range ends contribute only inward.
    def _cell_w(coord):
        u = (coord.reshape(-1) + 7.5) / 4.0 - 0.5  # [256]
        lo = jnp.floor(u)
        f = u - lo
        w = jnp.zeros((coord.size, 4), jnp.float32)
        for which, ww in ((lo, 1.0 - f), (lo + 1.0, f)):
            idx = jnp.clip(which, 0, 3).astype(jnp.int32)
            valid_w = ((which >= 0) & (which <= 3)).astype(jnp.float32) * ww
            w = w + jax.nn.one_hot(idx, 4, dtype=jnp.float32) * valid_w[:, None]
        return w

    w_cy = _cell_w(gy_off)  # [256, 4]
    w_cx = _cell_w(gx_off)  # [256, 4]
    gauss = jnp.exp(
        -(gy_off.reshape(-1) ** 2 + gx_off.reshape(-1) ** 2) / (2.0 * 8.0**2)
    )  # [256]

    # 36-bin dominant orientation over the axis-aligned central 16x16 of
    # each patch (identical values to slicing the full-image mag/ang:
    # the patch is an exact window of the same gradient fields)
    pm = jnp.hypot(pg[:, 0], pg[:, 1])  # [K, 24, 24]
    pa = jnp.arctan2(pg[:, 1], pg[:, 0]) % (2 * np.pi)
    lo, hi = P_HALF - b, P_HALF + b  # central 16x16
    m16 = pm[:, lo:hi, lo:hi]
    a16 = pa[:, lo:hi, lo:hi]
    h36 = (
        jax.nn.one_hot(
            jnp.floor(a16 / (2 * np.pi / 36)).astype(jnp.int32) % 36,
            36,
            dtype=jnp.float32,
        )
        * m16[..., None]
    ).sum(axis=(1, 2))  # [K, 36]
    k = jnp.argmax(h36, axis=1)  # [K]

    # parabolic peak interpolation: the raw 10-degree bin quantization
    # leaves up to a bin of error between the template's and the scene's
    # theta, smearing descriptor cells
    def _h_at(off_k):
        return jnp.take_along_axis(
            h36, ((k + off_k) % 36)[:, None], axis=1
        )[:, 0]

    hm, h0, hp = _h_at(-1), _h_at(0), _h_at(1)
    denom = hm - 2.0 * h0 + hp
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hm - hp) / denom, 0.0)
    theta = (k.astype(jnp.float32) + 0.5 + jnp.clip(delta, -0.5, 0.5)) * (
        2 * np.pi / 36
    )  # [K]
    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]  # [K, 1]

    # descriptor grid rotated by +theta around the keypoint (the SAME
    # direction the content rotated: scene = template rotated by alpha
    # gives theta_s = theta_t + alpha, and sampling at R(+theta_s)o
    # lands on the template's R(+theta_t)o — gradients then differ by
    # exactly alpha, cancelled by the -theta angle correction below),
    # expressed in PATCH coordinates (origin = keypoint - P_HALF)
    fx = gx_off.reshape(-1)[None, :]  # [1, 256]
    fy = gy_off.reshape(-1)[None, :]
    lx = P_HALF + fx * c - fy * s  # [K, 256], in [1.4, 22.6]
    ly = P_HALF + fx * s + fy * c

    # bilinear resampling as a factored one-hot contraction: the two taps
    # along each axis become a [K, 256, 24] weight matrix, and the sample
    # is sum_rc wy*wx*patch — two tiny batched matmuls on the MXU instead
    # of 4-tap random gathers. HIGHEST precision keeps the contraction in
    # f32 (default TPU matmul precision is bf16; these matmuls are ~150
    # MFLOP total, so exactness is free).
    def _axis_w(coord):
        c0 = jnp.floor(coord)
        f = coord - c0
        i0 = jnp.clip(c0, 0, P_SZ - 2).astype(jnp.int32)
        return (
            jax.nn.one_hot(i0, P_SZ, dtype=jnp.float32)
            * (1.0 - f)[..., None]
            + jax.nn.one_hot(i0 + 1, P_SZ, dtype=jnp.float32)
            * f[..., None]
        )  # [K, 256, 24]

    wy_t = _axis_w(ly)
    wx_t = _axis_w(lx)
    hp_ = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("ksr,kfrc->kfsc", wy_t, pg, precision=hp_)
    samp = jnp.einsum("kfsc,ksc->kfs", tmp, wx_t, precision=hp_)
    sgx, sgy = samp[:, 0], samp[:, 1]  # [K, 256]
    smag = jnp.hypot(sgx, sgy) * gauss[None, :]
    rel = (jnp.arctan2(sgy, sgx) - theta[:, None]) % (2 * np.pi)
    # SOFT orientation binning (SIFT-style linear interpolation between
    # the two adjacent bins): hard binning is unstable for gradients on
    # bin edges — axis-aligned edges (0/90 degrees) are exactly there, so
    # resampling noise flips their whole mass between bins 0 and 7
    pos = rel / (np.pi / 4) - 0.5  # bin centers at k+0.5
    k0 = jnp.floor(pos)
    w1 = pos - k0
    k0i = k0.astype(jnp.int32) % 8
    k1i = (k0i + 1) % 8
    w_o = (
        jax.nn.one_hot(k0i, 8, dtype=jnp.float32) * (1.0 - w1)[..., None]
        + jax.nn.one_hot(k1i, 8, dtype=jnp.float32) * w1[..., None]
    )  # [K, 256, 8]
    # trilinear accumulation: desc[k, cy, cx, b] = sum_s m*wy*wx*wo
    d = jnp.einsum("ks,sy,sx,ksb->kyxb", smag, w_cy, w_cx, w_o)
    return jax.vmap(_normalize_desc)(d)


def detect_describe(
    gray: jnp.ndarray,
    max_keypoints: int = 512,
    quality: float = 0.01,
    min_distance: int = 8,
    oriented: bool = True,
    force_global_topk: bool = False,
):
    """Keypoint detection + description entirely on device, one traced
    graph — the TPU replacement for the pose flow's host cv2.SIFT leg
    (reference utils/sift.py:24-30 detectAndCompute; measured 236 ms/frame
    at 720p on the bench host, vs ~1 ms here).

    Shi-Tomasi response (min eigenvalue of the structure tensor, the same
    quality map as cv2.goodFeaturesToTrack / reference utils/feature.py:
    104-125) -> spacing NMS -> top-k strongest -> 128-D gradient-histogram
    descriptors (describe_at). The (2*min_distance+1) max-window NMS
    guarantees any two selected peaks are >= min_distance apart (two peaks
    closer than that would each have to dominate the other's window).
    oriented=True (default) makes descriptors rotation invariant
    (dominant-orientation vote + rotated resampling — the vehicle yaws
    freely over a planar target); single-SCALE by design either way:
    cv2.SIFT remains available for scale-varying footage
    (CUAUV_SIFT_DETECTOR=cv2).

    Returns (kp [K, 2] float32 (x, y), des [K, 128] float32, n_valid i32)
    with valid rows first (strongest response order); rows past n_valid
    have kp=-1 and des=0. Fixed shapes: jit- and chain-embeddable."""
    g = gray.astype(jnp.float32)
    H, W = g.shape
    resp = min_eigenvalue_map(g)
    win = 2 * min_distance + 1
    # separable max filter: two 1-D passes instead of a win^2 window
    p = jnp.pad(resp, min_distance, constant_values=-jnp.inf)
    mx = jax.lax.reduce_window(
        p, -jnp.inf, jax.lax.max, (win, 1), (1, 1), "VALID"
    )
    mx = jax.lax.reduce_window(
        mx, -jnp.inf, jax.lax.max, (1, win), (1, 1), "VALID"
    )
    # oriented sampling reaches 7.5*sqrt(2) ~ 10.6 px + 1 for bilinear
    b = 12 if oriented else _DESC_BORDER
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    peaks = (resp >= mx) & (resp > jnp.max(resp) * quality) & inside
    score = jnp.where(peaks, resp, -jnp.inf)

    # two-stage top-k: per-tile top-32 over 32x32 tiles, then a global
    # top-k over the ~29k survivors — a single lax.top_k over the whole
    # frame is one big sort (1.16 ms/frame at 720p, measured); the tiled
    # form sorts 1024-element rows in parallel. Points with pairwise
    # euclidean distance >= min_distance pack at most ~28 into a 32x32
    # tile, so 32 slots keep every candidate the greedy suppression below
    # could possibly retain; what the tile stage can drop are members of
    # EXACT-response tie clusters closer than min_distance (which greedy
    # would kill all-but-one of anyway) — selection within such a tie
    # cluster may differ from the single-sort form, nothing else can.
    T = 32
    TK = 32  # per-tile slots
    Hp = -(-H // T) * T
    Wp = -(-W // T) * T
    n_tiles = (Hp // T) * (Wp // T)
    # the tile stage is only lossless while TK covers the densest packing
    # of min_distance-spaced points in a tile (and only meaningful when
    # the image is big enough to feed the global stage)
    if (
        not force_global_topk
        and (T // max(min_distance, 1) + 1) ** 2 <= TK
        and n_tiles * TK >= max_keypoints
    ):
        sp = jnp.pad(
            score, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf
        )
        tiles = sp.reshape(Hp // T, T, Wp // T, T).transpose(0, 2, 1, 3)
        tiles = tiles.reshape(-1, T * T)  # [n_tiles, 1024]
        tv, tf = jax.lax.top_k(tiles, TK)  # per-tile values + offsets
        # tile-local flat offset -> global flat index over [H, W]
        t_idx = jnp.arange(n_tiles)
        trow = (t_idx // (Wp // T))[:, None] * T + tf // T
        tcol = (t_idx % (Wp // T))[:, None] * T + tf % T
        gflat = trow * W + tcol  # may index padding; value is -inf there
        vals, sub = jax.lax.top_k(tv.reshape(-1), max_keypoints)
        flat = gflat.reshape(-1)[sub]
    else:
        vals, flat = jax.lax.top_k(score.reshape(-1), max_keypoints)
    ys = flat // W
    xs = flat % W
    cand = jnp.isfinite(vals)

    # exact greedy min-distance suppression, strongest first (the same
    # semantics as find_corners' host loop): the window NMS above passes
    # BOTH members of an exact response tie (plateaus in flat-ish scenes),
    # so a candidate is kept only if no stronger kept candidate is within
    # min_distance. Solved as a parallel fixpoint over the [K, K]
    # conflict matrix instead of a K-step sequential scan (the scan form
    # cost 2.05 ms/frame in per-iteration loop overhead alone, measured):
    # each round decides every candidate whose stronger conflicts are all
    # decided, so rounds = depth of the conflict DAG (a handful), and the
    # result is exactly the sequential greedy set (equivalence
    # property-tested against the sequential form in tests).
    pts = jnp.stack([ys, xs], axis=1).astype(jnp.float32)
    min_d2 = jnp.float32(min_distance * min_distance)
    idx_k = jnp.arange(max_keypoints)
    d2_kk = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    # conflicts[i, j]: candidate j is stronger (earlier) and too close
    conflicts = (
        (d2_kk < min_d2) & (idx_k[None, :] < idx_k[:, None]) & cand[None, :]
    )

    def _undecided(state):
        kept_, killed_ = state
        return jnp.any(cand & ~kept_ & ~killed_)

    def _round(state):
        kept_, killed_ = state
        undec = cand & ~kept_ & ~killed_
        newly_kept = undec & ~jnp.any(conflicts & ~killed_[None, :], axis=1)
        kept_ = kept_ | newly_kept
        newly_killed = (undec & ~newly_kept) & jnp.any(
            conflicts & kept_[None, :], axis=1
        )
        return kept_, killed_ | newly_killed

    # init carries derived from traced data (cand & False == all-False) so
    # their varying-axes types match the body's output under shard_map
    kept, _ = jax.lax.while_loop(
        _undecided, _round, (cand & False, cand & False)
    )
    # compact kept rows to the front, preserving strongest-first order:
    # a cumsum-addressed scatter, not a sort
    n_valid = jnp.sum(kept.astype(jnp.int32))
    pos = jnp.where(
        kept, jnp.cumsum(kept) - 1, n_valid + jnp.cumsum(~kept) - 1
    )
    order = jnp.zeros(max_keypoints, jnp.int32).at[pos].set(idx_k)
    ys, xs, valid = ys[order], xs[order], kept[order]

    des = describe_at(g, ys, xs, oriented=oriented)
    des = jnp.where(valid[:, None], des, 0.0)
    kp = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=1)
    kp = jnp.where(valid[:, None], kp, -1.0)
    return kp, des, n_valid


detect_describe_jit = jax.jit(detect_describe, static_argnums=(1, 3, 4, 5))
