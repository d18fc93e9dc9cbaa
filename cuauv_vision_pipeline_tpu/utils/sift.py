"""Feature matching (SIFT-style) with device-side descriptor matching.

Parity target: reference utils/sift.py — a SIFT wrapper with named source
images, FLANN kd-tree matching, Lowe ratio test, RANSAC homography, and a
projected quad per detected source (reference sift.py:14-142), plus
``draw_transformed_box``/``draw_keypoints`` (reference sift.py:145-165).

TPU re-design: keypoint detection+description stays a host concern (it is
sparse and branchy — OpenCV's SIFT when available, otherwise a built-in
DoG+gradient-histogram descriptor), while the O(N*M) descriptor distance
matrix, the 2-NN search, and the Lowe ratio test run as one jitted matmul
on the MXU (`match_descriptors`): for production sets (thousands of
descriptors) this is the dominant cost and maps perfectly onto the TPU.
RANSAC homography also runs vectorized: all candidate minimal sets are
solved and scored in one batched device pass (`ransac_homography`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.jaxconfig import ensure_compile_cache
from .draw import Color, draw_circle, draw_polylines

# template description + SIFT.warm compile at MODULE INIT, before the
# device-fn machinery (engine/executor) would configure the persistent
# cache — without this every module startup pays cold remote compiles
ensure_compile_cache()


@jax.jit
def _distance_topk(query: jnp.ndarray, train: jnp.ndarray):
    """All-pairs L2 distances (via the MXU) + 2-NN per query row.

    query [N, D], train [M, D] -> (dist2 [N, 2], idx [N, 2])."""
    q2 = jnp.sum(query * query, axis=1, keepdims=True)
    t2 = jnp.sum(train * train, axis=1)[None, :]
    cross = query @ train.T  # MXU
    d2 = jnp.maximum(q2 + t2 - 2.0 * cross, 0.0)
    # 2-NN as two argmin passes, not a sort-based top_k: k=2 never needs
    # the full row sorted, and two VPU reductions are ~10x cheaper than
    # the sort lowering. Tie order matches top_k (lowest index first).
    i1 = jnp.argmin(d2, axis=1)
    v1 = jnp.take_along_axis(d2, i1[:, None], axis=1)[:, 0]
    masked = jnp.where(
        jax.nn.one_hot(i1, d2.shape[1], dtype=bool), jnp.inf, d2
    )
    i2 = jnp.argmin(masked, axis=1)
    v2 = jnp.take_along_axis(masked, i2[:, None], axis=1)[:, 0]
    return jnp.stack([v1, v2], axis=1), jnp.stack(
        [i1, i2], axis=1
    ).astype(jnp.int32)


def device_match_topk(query_prep, des: jnp.ndarray, n_valid) -> tuple:
    """Traced 2-NN match against a device-resident template, for use
    INSIDE a device chain (e.g. the bins module's pose path): the template
    query (``prepare_descriptors`` output) closes into the graph as a
    constant, scene descriptor rows past ``n_valid`` are masked to the far
    sentinel, and only the [Nq, 2] top-2 distance/index buffers ride the
    packed fetch — descriptors never leave the chip. Finish on host with
    ``SIFT.match_device_topk``."""
    if query_prep is None:
        raise ValueError(
            "device_match_topk: template has no descriptors (add_source "
            "stored des_prep=None for a featureless source) — gate the "
            "chain on des_prep before tracing this"
        )
    q, _ = query_prep
    train = jnp.where(
        (jnp.arange(des.shape[0]) < n_valid)[:, None], des, _PAD_VAL
    )
    return _distance_topk(q, train)


def _next_pow2(n: int, lo: int = 64) -> int:
    m = lo
    while m < n:
        m *= 2
    return m


# Sentinel magnitude for padded descriptor/point rows: far beyond any real
# SIFT descriptor (cv2 norms ~512, d2 <= ~1e6) yet safely inside f32 range
# when squared and summed over 128 dims (~1.3e10).
_PAD_VAL = 1.0e4


def prepare_descriptors(arr: np.ndarray, role: str = "query"):
    """Pad a fixed descriptor set to its power-of-2 bucket and pin it on
    device ONCE. A SIFT template is the QUERY of every frame's match —
    re-padding and re-uploading it per frame wastes a host pass plus an
    H2D transfer per template (SIFT.add_source caches this). Query rows
    pad with zeros (sliced off after), train rows with the far sentinel
    (never enter the top-2)."""
    fill = 0.0 if role == "query" else _PAD_VAL
    n = len(arr)
    out = np.full((_next_pow2(n), arr.shape[1]), fill, np.float32)
    out[:n] = np.asarray(arr, np.float32)
    return jax.device_put(out), n


def match_descriptors(
    query: Optional[np.ndarray] = None,
    train: Optional[np.ndarray] = None,
    ratio: float = 0.7,
    *,
    query_prep=None,
) -> List[Tuple[int, int, float]]:
    """Lowe-ratio 2-NN matching -> [(query_idx, train_idx, distance)].

    Keypoint counts vary every frame; arrays are padded to power-of-2
    buckets so the matmul jit compiles O(log N) times total, not once per
    count (a per-frame recompile costs seconds on a remote-attached chip).
    Padded train rows sit at distance ~1e10 and never enter the top-2;
    padded query rows are sliced off before the ratio test. Pass
    ``query_prep=prepare_descriptors(q, "query")`` instead of ``query``
    when the same set is matched repeatedly (skips its per-call
    pad+upload — SIFT templates take this path)."""
    if query_prep is not None:
        q, nq = query_prep
    else:
        nq = len(query)
        q = None
    nt = len(train)
    if nq == 0 or nt < 2:
        return []
    if q is None:
        dim = query.shape[1]
        q = np.zeros((_next_pow2(nq), dim), np.float32)
        q[:nq] = query
    t = np.full((_next_pow2(nt), train.shape[1]), _PAD_VAL, np.float32)
    t[:nt] = train
    d2, idx = _distance_topk(q, t)
    d = np.sqrt(np.asarray(d2)[:nq])
    idx = np.asarray(idx)[:nq]
    good = d[:, 0] < ratio * d[:, 1]
    return [
        (int(i), int(idx[i, 0]), float(d[i, 0]))
        for i in np.nonzero(good)[0]
    ]


def _homography_from_4(src: np.ndarray, dst: np.ndarray) -> Optional[np.ndarray]:
    """DLT homography from 4 correspondences (host, tiny)."""
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        A.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    A = np.asarray(A, np.float64)
    try:
        _, _, vt = np.linalg.svd(A)
    except np.linalg.LinAlgError:
        return None
    H = vt[-1].reshape(3, 3)
    if abs(H[2, 2]) < 1e-12:
        return None
    return H / H[2, 2]


def solve_minimal_sets(
    src: np.ndarray, dst: np.ndarray, iters: int, seed: int
) -> np.ndarray:
    """All RANSAC minimal-set candidate homographies at once: 4 distinct
    indices per candidate, the [iters, 8, 9] DLT systems assembled
    vectorized, ONE batched LAPACK svd call (the per-candidate Python
    loop + svd was ~6 ms of the pose leg; batched it is ~1 ms). Returns
    normalized candidates [K<=iters, 3, 3] (degenerate sets dropped)."""
    n = len(src)
    rng = np.random.default_rng(seed)
    sel = np.argsort(rng.random((iters, n)), axis=1)[:, :4]
    s4, d4 = src[sel], dst[sel]  # [iters, 4, 2]
    x, y = s4[..., 0], s4[..., 1]
    u, v = d4[..., 0], d4[..., 1]
    zero, one = np.zeros_like(x), np.ones_like(x)
    rows = np.stack(
        [
            np.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1),
            np.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1),
        ],
        axis=2,
    )  # [iters, 4, 2, 9]
    A = rows.reshape(iters, 8, 9)
    try:
        _, _, vt = np.linalg.svd(A)
        Hs_all = vt[:, -1].reshape(iters, 3, 3)
    except np.linalg.LinAlgError:  # batched non-convergence: per-set retry
        cands = [_homography_from_4(src[s], dst[s]) for s in sel]
        cands = [h for h in cands if h is not None]
        if not cands:
            return np.empty((0, 3, 3))
        Hs_all = np.stack(cands)
    keep = np.abs(Hs_all[:, 2, 2]) >= 1e-12
    return Hs_all[keep] / Hs_all[keep, 2:3, 2:3]


def ransac_homography(
    src_pts: np.ndarray,
    dst_pts: np.ndarray,
    thresh: float = 5.0,
    iters: int = 256,
    seed: int = 0,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """RANSAC homography (cv2.findHomography(RANSAC) equivalent).

    Minimal-set solves happen on host (4x4 SVDs); consensus scoring of all
    candidates over all points runs as one vectorized device pass.
    Returns (H or None, inlier_mask)."""
    src = np.asarray(src_pts, np.float64).reshape(-1, 2)
    dst = np.asarray(dst_pts, np.float64).reshape(-1, 2)
    n = len(src)
    if n < 4:
        return None, np.zeros(n, bool)

    candidates = solve_minimal_sets(src, dst, iters, seed)
    if len(candidates) == 0:
        return None, np.zeros(n, bool)

    # ONE jitted consensus pass over padded fixed-shape buffers: candidates
    # pad to `iters` by repeating the last real H (duplicates tie, argmax
    # keeps the earliest), points pad to a power-of-2 bucket with dst=+1e9
    # (never an inlier) — so the executable compiles O(log N) times total
    # instead of per (candidate count, match count) pair.
    Hs = np.asarray(candidates, np.float32)
    if len(Hs) < iters:
        Hs = np.concatenate([Hs, np.repeat(Hs[-1:], iters - len(Hs), axis=0)])
    nb = _next_pow2(n)
    s = np.ones((nb, 3), np.float32)
    s[:n, :2] = src
    d = np.full((nb, 2), 1.0e9, np.float32)
    d[:n] = dst
    mask = np.asarray(_ransac_score(Hs, s, d, np.float32(thresh)))[:n]
    if mask.sum() < 4:
        return None, mask

    # refit on all inliers (least squares DLT)
    H = _refit(src[mask], dst[mask])
    return H, mask


@jax.jit
def _ransac_score(Hs: jnp.ndarray, s: jnp.ndarray, d: jnp.ndarray, thresh):
    """Score all RANSAC candidates over all points; return the best
    candidate's inlier mask. thresh is traced (no recompile per value)."""
    proj = jnp.einsum("cij,nj->cni", Hs, s)
    w = jnp.where(jnp.abs(proj[..., 2]) < 1e-9, 1e-9, proj[..., 2])
    uv = proj[..., :2] / w[..., None]
    err = jnp.linalg.norm(uv - d[None], axis=-1)  # [C, N]
    inliers = err < thresh
    counts = jnp.sum(inliers, axis=1)
    return jnp.take(inliers, jnp.argmax(counts), axis=0)


def _refit(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        A.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    _, _, vt = np.linalg.svd(np.asarray(A, np.float64))
    H = vt[-1].reshape(3, 3)
    return H / H[2, 2]


def _builtin_detect_and_compute(gray: np.ndarray, max_keypoints: int = 500):
    """Fallback detector/descriptor when OpenCV SIFT is unavailable:
    Shi-Tomasi keypoints + 8x8-cell gradient-orientation histograms (a
    SIFT-like 128-D descriptor). Not scale invariant; adequate for the
    planar-target matching the reference uses it for."""
    from ..ops.feature import find_corners
    from .feature import _sobel_jit

    pts = find_corners(gray, max_keypoints, 0.01, 8).reshape(-1, 2)
    gx, gy = _sobel_jit()(jnp.asarray(gray, jnp.float32))
    gx = np.asarray(gx)
    gy = np.asarray(gy)
    mag = np.hypot(gx, gy)
    ang = np.arctan2(gy, gx) % (2 * np.pi)

    H, W = gray.shape[:2]
    descs = []
    kps = []
    for x, y in pts:
        xi, yi = int(x), int(y)
        if xi < 8 or yi < 8 or xi >= W - 8 or yi >= H - 8:
            continue
        patch_m = mag[yi - 8 : yi + 8, xi - 8 : xi + 8]
        patch_a = ang[yi - 8 : yi + 8, xi - 8 : xi + 8]
        desc = np.zeros((4, 4, 8), np.float32)
        cell_y = np.arange(16) // 4
        cell_x = np.arange(16) // 4
        bins = np.floor(patch_a / (2 * np.pi / 8)).astype(int) % 8
        for cy in range(4):
            for cx in range(4):
                sel = np.zeros((16, 16), bool)
                sel[cy * 4 : cy * 4 + 4, cx * 4 : cx * 4 + 4] = True
                for b in range(8):
                    desc[cy, cx, b] = patch_m[sel & (bins == b)].sum()
        v = desc.reshape(-1)
        norm = np.linalg.norm(v)
        if norm > 0:
            v = np.minimum(v / norm, 0.2)
            v = v / max(np.linalg.norm(v), 1e-9)
        descs.append(v)
        kps.append((float(x), float(y)))
    if not descs:
        return np.empty((0, 2), np.float32), np.empty((0, 128), np.float32)
    return np.asarray(kps, np.float32), np.asarray(descs, np.float32)


def _device_detect_and_compute(gray: np.ndarray, max_keypoints: int = 512):
    """TPU detect+describe (ops/feature.detect_describe): one device graph
    for Shi-Tomasi corners + 128-D gradient-histogram descriptors. The
    measured cv2.SIFT host leg is ~236 ms/frame at 720p; this is ~1 ms of
    device time. Single-scale (planar-target matching)."""
    from ..ops.feature import detect_describe_jit

    kp, des, n = detect_describe_jit(jnp.asarray(gray), max_keypoints)
    n = int(n)
    return np.asarray(kp)[:n], np.asarray(des)[:n]


def detect_and_compute(
    gray: np.ndarray, max_keypoints: int = 500, method: Optional[str] = None
):
    """Keypoints [N, 2] (x, y) + descriptors [N, D].

    method (default env CUAUV_SIFT_DETECTOR, else "cv2"):
      * "cv2"     — OpenCV SIFT, the reference's own detector
        (reference utils/sift.py:24-30); host CPU, scale-invariant.
      * "device"  — ops/feature.detect_describe on the TPU (single-scale,
        ~200x cheaper per frame; descriptors are NOT interchangeable with
        cv2's, so template and scene must use the same method).
      * "builtin" — host fallback (used automatically when cv2 is
        absent); its axis-aligned descriptors match ONLY the device
        path's oriented=False variant, not the rotation-invariant
        default."""
    method = method or os.environ.get("CUAUV_SIFT_DETECTOR", "cv2")
    if method == "device":
        return _device_detect_and_compute(np.asarray(gray), max_keypoints)
    if method == "cv2":
        try:
            import cv2

            sift = cv2.SIFT_create(nfeatures=max_keypoints)
            kp, des = sift.detectAndCompute(np.asarray(gray), None)
            if des is None or len(kp) == 0:
                return (
                    np.empty((0, 2), np.float32),
                    np.empty((0, 128), np.float32),
                )
            pts = np.asarray([k.pt for k in kp], np.float32)
            return pts, des.astype(np.float32)
        except Exception:
            pass
    return _builtin_detect_and_compute(np.asarray(gray), max_keypoints)


class SIFT:
    """Named-source feature matcher (reference utils/sift.py:14-142).

    ``detector`` picks the keypoint front end for BOTH templates and
    scenes (descriptors from different detectors don't mix): "cv2" for
    the reference's own SIFT, "device" for the TPU detect_describe path
    (~200x cheaper per frame), None to follow CUAUV_SIFT_DETECTOR."""

    def __init__(self, checks: int = 50, detector: Optional[str] = None):
        # `checks` tuned FLANN precision in the reference; the exact 2-NN
        # matmul here is always exhaustive (strictly more precise).
        self.checks = checks
        self.detector = detector
        self.sources: Dict[str, dict] = {}

    def add_source(self, name: str, source: np.ndarray):
        kp, des = detect_and_compute(source, method=self.detector)
        self.sources[name] = {
            "name": name,
            "source": source,
            "kp": kp,
            "des": des,
            # padded + device-resident once: this set is the query of
            # every frame's match
            "des_prep": prepare_descriptors(des, "query") if len(des) else None,
        }
        return kp, des

    def add_many(self, **kwargs):
        for name, source in kwargs.items():
            self.add_source(name, source)

    def warm(self, scene_max_keypoints: int = 1024, iters: int = 256) -> None:
        """Pre-compile every executable shape this matcher can reach, so
        no compile ever happens mid-match. Both jits here bucket their
        inputs to powers of two, which makes the executable set small and
        enumerable — but a LAZY bucket compile lands in the middle of a
        module's loop thread (match counts cross a power-of-2 boundary as
        the target moves), stalling the loop for the remote-compile
        latency; concurrent with an in-flight async chain dispatch it has
        deadlocked the tunnel client outright (observed live: bins pose,
        frame ~98, 128->64 match-bucket flip, loop thread never returned).
        Call once at module init, before the chain executor starts.

        * _ransac_score: one executable per match-count bucket, bounded
          by the largest template's keypoint count.
        * _distance_topk: one per scene-descriptor bucket, bounded by
          ``scene_max_keypoints`` (host-detector scenes; pass 0 to skip —
          the device detector's 2-NN runs inside the caller's chain at a
          fixed K and never varies)."""
        import jax

        max_nq = max((len(s["des"]) for s in self.sources.values()), default=0)
        if max_nq < 4:
            return
        eye = np.tile(np.eye(3, dtype=np.float32)[None], (iters, 1, 1))
        nb = 64
        while True:
            s = np.ones((nb, 3), np.float32)
            d = np.zeros((nb, 2), np.float32)
            jax.block_until_ready(_ransac_score(eye, s, d, np.float32(5.0)))
            if nb >= _next_pow2(max_nq):
                break
            nb *= 2
        if scene_max_keypoints <= 0:
            return
        dim = next(iter(self.sources.values()))["des"].shape[1]
        nt = 64
        while True:
            for src in self.sources.values():
                if src["des_prep"] is None:
                    continue
                t = np.full((nt, dim), _PAD_VAL, np.float32)
                jax.block_until_ready(
                    _distance_topk(src["des_prep"][0], t)
                )
            if nt >= _next_pow2(scene_max_keypoints):
                break
            nt *= 2

    def match(
        self,
        img: np.ndarray,
        min_match: int = 10,
        ratio: float = 0.7,
        draw: bool = False,
    ) -> List[dict]:
        """Find all sources in ``img``. Returns one dict per detected source
        with name/homography/quad/matches; optionally draws the quads."""
        kp_img, des_img = detect_and_compute(img, method=self.detector)
        return self.match_with_features(
            kp_img, des_img, min_match=min_match, ratio=ratio,
            draw_on=img if draw else None,
        )

    def match_with_features(
        self,
        kp_img: np.ndarray,
        des_img: np.ndarray,
        min_match: int = 10,
        ratio: float = 0.7,
        draw_on: Optional[np.ndarray] = None,
    ) -> List[dict]:
        """match() on PRE-COMPUTED scene features — the bins module's
        device-detector path hands in keypoints/descriptors that rode the
        chain's packed fetch (computed on device inside the same dispatch
        as the mask), so the pose flow adds no extra detect pass."""
        results: List[dict] = []
        for name, src in self.sources.items():
            if len(src["des"]) < 2 or len(des_img) < 2:
                continue
            good = match_descriptors(
                None, des_img, ratio, query_prep=src["des_prep"]
            )
            r = self._finish(name, good, kp_img, min_match, draw_on)
            if r is not None:
                results.append(r)
        return results

    def match_device_topk(
        self,
        name: str,
        d2: np.ndarray,
        idx: np.ndarray,
        kp_img: np.ndarray,
        min_match: int = 10,
        ratio: float = 0.7,
    ) -> List[dict]:
        """Finish a match whose 2-NN search already ran INSIDE a device
        chain (``device_match_topk``): the packed fetch carried only the
        top-2 distance/index buffers (~2 KB) and the keypoint coordinates
        — no descriptors ever cross the link. Host work is the ratio test
        + RANSAC."""
        src = self.sources[name]
        nq = src["des_prep"][1]
        d = np.sqrt(np.maximum(np.asarray(d2)[:nq], 0.0))
        ix = np.asarray(idx)[:nq]
        # a 2nd-NN at sentinel distance means the scene had <2 valid
        # descriptors (device_match_topk masks invalid rows to _PAD_VAL):
        # without this guard a single-keypoint frame would pass the ratio
        # test for EVERY template descriptor and publish a garbage pose
        sel = (d[:, 0] < ratio * d[:, 1]) & (d[:, 1] < _PAD_VAL)
        good = [
            (int(i), int(ix[i, 0]), float(d[i, 0]))
            for i in np.nonzero(sel)[0]
        ]
        r = self._finish(name, good, kp_img, min_match)
        return [r] if r is not None else []

    def _finish(
        self,
        name: str,
        good: List[Tuple[int, int, float]],
        kp_img: np.ndarray,
        min_match: int,
        draw_on: Optional[np.ndarray] = None,
    ) -> Optional[dict]:
        """Ratio-tested matches -> RANSAC homography -> projected quad."""
        src = self.sources[name]
        if len(good) < min_match:
            return None
        src_pts = np.asarray([src["kp"][q] for q, _, _ in good])
        dst_pts = np.asarray([kp_img[t] for _, t, _ in good])
        H, mask = ransac_homography(src_pts, dst_pts)
        if H is None:
            return None
        h, w = src["source"].shape[:2]
        corners = np.asarray(
            [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64
        )
        ones = np.concatenate([corners, np.ones((4, 1))], axis=1)
        proj = ones @ H.T
        quad = (proj[:, :2] / proj[:, 2:3]).astype(np.int32)
        if draw_on is not None:
            draw_transformed_box(draw_on, quad)
        return {
            "name": name,
            "homography": H,
            "quad": quad,
            "matches": len(good),
            "inliers": int(mask.sum()),
        }


def draw_transformed_box(
    img: np.ndarray, quad: np.ndarray, color=Color.GREEN, thickness: int = 3
) -> None:
    """Draw a matched source's projected quad (reference sift.py:145-155)."""
    draw_polylines(img, [np.asarray(quad).reshape(-1, 2)], True, color, thickness)


def draw_keypoints(
    img: np.ndarray, keypoints: np.ndarray, color=Color.RED
) -> None:
    """Mark keypoints (reference sift.py:158-165)."""
    for x, y in np.asarray(keypoints).reshape(-1, 2):
        draw_circle(img, (int(x), int(y)), 3, color, 1)
