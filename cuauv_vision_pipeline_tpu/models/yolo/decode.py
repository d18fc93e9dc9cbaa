"""Fused detection decode + NMS, entirely on device.

The reference runs ultralytics' torch decode/NMS on CPU/CUDA (reference
modules/yolo.py:113-116); here decode (DFL expectation, anchor offsets),
score thresholding, and class-aware greedy NMS are one jittable graph with
fixed-capacity outputs — no dynamic shapes, no host round-trips until the
final [max_det] tensors are read by the handlers.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STRIDES = (8, 16, 32)


def _flatten_scales(
    outputs: Dict[str, List[jnp.ndarray]], image_size: int
) -> Dict[str, jnp.ndarray]:
    """Concatenate per-scale maps into per-anchor rows + anchor centers."""
    boxes, clses, angles, kpts, mcoefs = [], [], [], [], []
    centers, strides = [], []
    for i, stride in enumerate(STRIDES):
        bm = outputs["box"][i]
        B = bm.shape[0]
        H, W = bm.shape[1], bm.shape[2]
        boxes.append(bm.reshape(B, H * W, -1))
        clses.append(outputs["cls"][i].reshape(B, H * W, -1))
        if "angle" in outputs:
            angles.append(outputs["angle"][i].reshape(B, H * W, 1))
        if "kpts" in outputs:
            kpts.append(outputs["kpts"][i].reshape(B, H * W, -1))
        if "mcoef" in outputs:
            mcoefs.append(outputs["mcoef"][i].reshape(B, H * W, -1))
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        centers.append(jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1))
        strides.append(jnp.full((H * W,), stride, jnp.float32))

    out = {
        "box": jnp.concatenate(boxes, axis=1),
        "cls": jnp.concatenate(clses, axis=1),
        "centers": jnp.concatenate(centers, axis=0),
        "strides": jnp.concatenate(strides, axis=0),
    }
    if angles:
        out["angle"] = jnp.concatenate(angles, axis=1)
    if kpts:
        out["kpts"] = jnp.concatenate(kpts, axis=1)
    if mcoefs:
        out["mcoef"] = jnp.concatenate(mcoefs, axis=1)
    return out


def compose_masks(
    proto: jnp.ndarray,
    coefs: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    image_size: int,
) -> jnp.ndarray:
    """Per-detection instance masks from prototypes, entirely on device.

    proto [Hp, Wp, nm] + coefs [M, nm] -> sigmoid(proto @ coefs.T) cropped
    to each detection's box — ultralytics' process_mask (utils/ops.py) as
    one einsum + a broadcast crop instead of a torch matmul + python crop.
    Boxes are model-input xyxy; the crop rescales them onto the prototype
    grid (exclusive right/bottom edge like crop_mask). Returns [M, Hp, Wp]
    mask probabilities (threshold at 0.5 for binary; ultralytics' .gt_(0)
    on logits is the same cut)."""
    hp, wp = proto.shape[0], proto.shape[1]
    logits = jnp.einsum("hwc,mc->mhw", proto, coefs)
    masks = jax.nn.sigmoid(logits)
    # box corners in prototype pixels (proto is image_size / Hp per cell)
    sx = wp / float(image_size)
    sy = hp / float(image_size)
    x1 = boxes_xyxy[:, 0:1, None] * sx
    y1 = boxes_xyxy[:, 1:2, None] * sy
    x2 = boxes_xyxy[:, 2:3, None] * sx
    y2 = boxes_xyxy[:, 3:4, None] * sy
    cols = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
    rows = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
    inside = (cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2)
    return masks * inside.astype(masks.dtype)


def _dfl_expectation(box_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """[..., 4*reg_max] logits -> [..., 4] expected ltrb distances."""
    shape = box_logits.shape[:-1] + (4, reg_max)
    probs = jax.nn.softmax(box_logits.reshape(shape), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def _aabb_iou(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against many."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    b = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    return inter / jnp.maximum(a + b - inter, 1e-9)


def _probiou(box: jnp.ndarray, boxes: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotated-box IoU of one xywhr box against many (Gaussian/Bhattacharyya
    ProbIoU, the measure ultralytics' nms_rotated uses for the obb task)."""

    def cov(b):
        w2 = b[..., 2] ** 2 / 12.0
        h2 = b[..., 3] ** 2 / 12.0
        c = jnp.cos(b[..., 4])
        s = jnp.sin(b[..., 4])
        return (
            w2 * c * c + h2 * s * s,
            w2 * s * s + h2 * c * c,
            (w2 - h2) * c * s,
        )

    a1, b1, c1 = cov(box)
    a2, b2, c2 = cov(boxes)
    x1, y1 = box[..., 0], box[..., 1]
    x2, y2 = boxes[..., 0], boxes[..., 1]
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = 0.5 * jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (
            4.0
            * jnp.sqrt(jnp.maximum(a1 * b1 - c1 * c1, 0.0))
            * jnp.sqrt(jnp.maximum(a2 * b2 - c2 * c2, 0.0))
            + eps
        )
        + eps
    )
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def nms_fixed(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_thresh: float = 0.45,
    max_det: int = 32,
    class_aware: bool = True,
    angles: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a fixed detection budget.

    Returns (indices [max_det], valid [max_det]). Scores <= 0 never
    selected. When ``angles`` is given (obb task), suppression uses rotated
    ProbIoU — AABBs of elongated rotated boxes (slalom poles at ~45 deg)
    overlap heavily even when the rotated boxes barely touch, so axis-
    aligned IoU would wrongly merge adjacent poles."""
    n = scores.shape[0]

    if angles is not None:
        xywhr = jnp.stack(
            [
                (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2,
                (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2,
                boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                boxes_xyxy[:, 3] - boxes_xyxy[:, 1],
                angles,
            ],
            axis=-1,
        )

    def body(i, state):
        alive_scores, picked, valid = state
        best = jnp.argmax(alive_scores)
        best_score = alive_scores[best]
        ok = best_score > 0.0
        picked = picked.at[i].set(jnp.where(ok, best, -1))
        valid = valid.at[i].set(ok)
        if angles is not None:
            ious = _probiou(xywhr[best], xywhr)
        else:
            ious = _aabb_iou(boxes_xyxy[best], boxes_xyxy)
        same_class = jnp.logical_or(
            not class_aware, classes == classes[best]
        )
        suppress = jnp.logical_and(ious >= iou_thresh, same_class)
        suppress = suppress.at[best].set(True)
        alive_scores = jnp.where(
            jnp.logical_and(suppress, ok), 0.0, alive_scores
        )
        return alive_scores, picked, valid

    picked = jnp.full((max_det,), -1, jnp.int32)
    valid = jnp.zeros((max_det,), bool)
    _, picked, valid = jax.lax.fori_loop(
        0, max_det, body, (scores, picked, valid)
    )
    return picked, valid


def decode_boxes(
    flat: Dict[str, jnp.ndarray], reg_max: int = 16
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Per-anchor box decode from flattened head outputs.

    Returns (boxes_xyxy [N, 4], angle [N] or None). For the obb task this
    is ultralytics' dist2rbox (utils/tal.py): the angle is decoded first
    — (sigmoid - 0.25) * pi, range (-pi/4, 3pi/4) — and the ltrb center
    offset is rotated by it before being added to the anchor:
    cx,cy = anchor + R(angle) @ ((rb - lt) / 2); w,h = lt + rb. The
    returned xyxy is the axis-aligned w x h box around that (rotated)
    center; pair it with the angle to get the true corners (obb_corners)."""
    box = flat["box"][0]  # [N, 4*reg_max]
    centers = flat["centers"]  # [N, 2]
    strides = flat["strides"]  # [N]

    dists = _dfl_expectation(box, reg_max) * strides[:, None]
    cx, cy = centers[:, 0], centers[:, 1]

    if "angle" in flat:
        angle = (jax.nn.sigmoid(flat["angle"][0, :, 0]) - 0.25) * jnp.pi
        fx = (dists[:, 2] - dists[:, 0]) / 2
        fy = (dists[:, 3] - dists[:, 1]) / 2
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        cx = cx + fx * cos - fy * sin
        cy = cy + fx * sin + fy * cos
        w = dists[:, 0] + dists[:, 2]
        h = dists[:, 1] + dists[:, 3]
        return (
            jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1),
            angle,
        )

    return (
        jnp.stack(
            [
                cx - dists[:, 0],
                cy - dists[:, 1],
                cx + dists[:, 2],
                cy + dists[:, 3],
            ],
            axis=-1,
        ),
        None,
    )


def decode(
    outputs: Dict[str, List[jnp.ndarray]],
    image_size: int,
    reg_max: int = 16,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 32,
    nms_pool: int = 512,
) -> Dict[str, jnp.ndarray]:
    """Decode one image's raw head outputs into fixed-size detections.

    Returns dict of [max_det]-shaped arrays: xyxy, score, cls, valid,
    plus angle (obb) / kpts (pose) / mask [max_det, S/4, S/4] probabilities
    (segment) when present. Coordinates are in model
    input pixels (callers rescale to the original frame); axis-aligned
    boxes are clipped to [0, image_size] after NMS (ultralytics
    clip_boxes), rotated ones are not.

    ``nms_pool``: the greedy NMS loop (max_det sequential argmax+suppress
    passes) runs over only the top-``nms_pool`` candidates by score
    instead of all ~S²/48 anchors — a single fused ``lax.top_k`` shrinks
    every loop iteration's vectors ~16x at 640². EXACT whenever the
    number of above-``conf_thresh`` candidates is <= nms_pool (zeroed
    scores are never selected, so any candidate that could ever be picked
    is in the pool); with more candidates than the pool, picks beyond it
    are dropped — the same contract as ultralytics' max_nms pre-filter.
    Pass nms_pool >= anchor count to disable.
    """
    flat = _flatten_scales(outputs, image_size)
    cls = flat["cls"][0]  # [N, C]
    boxes_xyxy, angle = decode_boxes(flat, reg_max)

    # sigmoid is monotonic: max/argmax over logits == over probabilities,
    # so only the [N] winning logits pass through sigmoid (not [N, C])
    scores = jax.nn.sigmoid(jnp.max(cls, axis=-1))
    classes = jnp.argmax(cls, axis=-1).astype(jnp.int32)
    scores = jnp.where(scores >= conf_thresh, scores, 0.0)

    pool = min(nms_pool, scores.shape[0])
    scores, top_idx = jax.lax.top_k(scores, pool)
    boxes_xyxy = boxes_xyxy[top_idx]
    classes = classes[top_idx]
    if angle is not None:
        angle = angle[top_idx]

    picked, valid = nms_fixed(
        boxes_xyxy, scores, classes, iou_thresh, max_det, angles=angle
    )
    safe = jnp.maximum(picked, 0)
    orig = top_idx[safe]  # anchor-set indices for the per-anchor extras

    out = {
        "xyxy": boxes_xyxy[safe],
        "score": jnp.where(valid, scores[safe], 0.0),
        "cls": jnp.where(valid, classes[safe], -1),
        "valid": valid,
    }
    if angle is None:
        # axis-aligned tasks clip to the model square (ultralytics
        # clip_boxes after NMS); rotated boxes keep out-of-frame corners
        # like ultralytics OBB — clipping xyxy would distort the rotation
        out["xyxy"] = jnp.clip(out["xyxy"], 0.0, float(image_size))
    if angle is not None:
        out["angle"] = angle[safe]
    if "kpts" in flat:
        # gather the max_det winners FIRST (via their anchor-set indices),
        # then decode only those keypoints — the pre-pool version decoded
        # all N anchors' keypoints to use 32 of them
        k = flat["kpts"][0][orig]  # [max_det, 3*nk]
        nk = k.shape[-1] // 3
        k = k.reshape(-1, nk, 3)
        centers = flat["centers"][orig]  # [max_det, 2] model pixels
        strides = flat["strides"][orig]  # [max_det]
        kx = (k[..., 0] * 2.0) * strides[:, None] + (centers[:, 0:1] - 0.5 * strides[:, None])
        ky = (k[..., 1] * 2.0) * strides[:, None] + (centers[:, 1:2] - 0.5 * strides[:, None])
        kv = jax.nn.sigmoid(k[..., 2])
        out["kpts"] = jnp.stack([kx, ky, kv], axis=-1)
    if "mcoef" in flat and "proto" in outputs:
        coefs = flat["mcoef"][0][orig]  # [max_det, nm]
        masks = compose_masks(
            outputs["proto"][0], coefs, out["xyxy"], image_size
        )
        # threshold ON DEVICE (0.5 on probabilities == ultralytics'
        # .gt_(0) on logits) and ship uint8: the host path only ever
        # applies >= 0.5, and f32 probabilities would put 4x the bytes
        # ([max_det, S/4, S/4]) on the device->host fetch that sits in
        # the camera-to-detection latency budget. Invalid slots must not
        # leak the argmax-0 anchor's mask.
        out["mask"] = (
            (masks >= 0.5) & valid[:, None, None]
        ).astype(jnp.uint8)
    return out


def obb_corners(
    xyxy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """[M, 4] xyxy + [M] angle -> [M, 4, 2] rotated corners (x, y).

    Array-namespace generic: numpy in, numpy out — the host summarize
    path below must stay numpy (an eager jax op there costs a full device
    round trip per frame on remote-attached backends, measured ~70 ms
    hiding inside "host" time) while device callers pass tracers."""
    xp = np if isinstance(xyxy, np.ndarray) else jnp
    cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
    cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
    w = xyxy[:, 2] - xyxy[:, 0]
    h = xyxy[:, 3] - xyxy[:, 1]
    cos = xp.cos(angle)
    sin = xp.sin(angle)
    corners = []
    for sx, sy in ((-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)):
        dx = sx * w
        dy = sy * h
        corners.append(
            xp.stack([cx + dx * cos - dy * sin, cy + dx * sin + dy * cos], -1)
        )
    return xp.stack(corners, axis=1)


def summarize(
    decoded: Dict[str, np.ndarray],
    class_names: List[str],
    scale: Tuple[float, float] = (1.0, 1.0),
    task: str = "detect",
    pad: Tuple[float, float] = (0.0, 0.0),
    clip_wh: Tuple[float, float] = None,
    image_size: int = None,
) -> List[Dict]:
    """Device detections -> ultralytics Results.summary()-style dicts
    (the format the reference's MAP_FN parsers consume,
    reference modules/yolo.py:116-123).

    Coordinates map back to the original frame as (v - pad) * scale, undoing
    the letterbox applied by model.preprocess. clip_wh=(w, h) additionally
    clamps detect boxes and pose keypoints to the original frame (what
    ultralytics scale_boxes/scale_coords do); rotated OBB corners are never
    clipped (parity with ultralytics OBB, which keeps them).

    For the segment task (requires ``image_size``, the model input square)
    each entry carries ``segments: {x: [...], y: [...]}`` — the largest
    external polygon of the thresholded (0.5) instance mask, traced at
    prototype resolution and mapped through mask -> model (pixel-center
    x image_size/Hp) -> frame coordinates, the format ultralytics
    Results.summary() emits for -seg models."""
    if task == "segment":
        from ...utils.contours import contour_area, find_contours  # noqa: F401

    results = []
    valid = np.asarray(decoded["valid"])
    xyxy = np.asarray(decoded["xyxy"])
    scores = np.asarray(decoded["score"])
    classes = np.asarray(decoded["cls"])
    sx, sy = scale
    px, py = pad

    def _cx(v: float) -> float:  # frame-space x, optionally clamped
        v = (v - px) * sx
        return min(max(v, 0.0), clip_wh[0]) if clip_wh else v

    def _cy(v: float) -> float:
        v = (v - py) * sy
        return min(max(v, 0.0), clip_wh[1]) if clip_wh else v

    if task == "obb":
        # numpy stays numpy inside obb_corners (host path: an eager jax
        # call here costs a device round trip per frame)
        corners = obb_corners(xyxy, np.asarray(decoded["angle"]))

    for i in np.nonzero(valid)[0]:
        cls_id = int(classes[i])
        name = class_names[cls_id] if 0 <= cls_id < len(class_names) else str(cls_id)
        entry: Dict = {
            "name": name,
            "class": cls_id,
            "confidence": float(scores[i]),
        }
        if task == "obb":
            c = corners[i]
            entry["box"] = {
                "x1": float((c[0, 0] - px) * sx), "y1": float((c[0, 1] - py) * sy),
                "x2": float((c[1, 0] - px) * sx), "y2": float((c[1, 1] - py) * sy),
                "x3": float((c[2, 0] - px) * sx), "y3": float((c[2, 1] - py) * sy),
                "x4": float((c[3, 0] - px) * sx), "y4": float((c[3, 1] - py) * sy),
            }
        else:
            entry["box"] = {
                "x1": float(_cx(xyxy[i, 0])), "y1": float(_cy(xyxy[i, 1])),
                "x2": float(_cx(xyxy[i, 2])), "y2": float(_cy(xyxy[i, 3])),
            }
        if task == "pose" and "kpts" in decoded:
            k = np.asarray(decoded["kpts"])[i]
            entry["keypoints"] = {
                "x": [float(_cx(v)) for v in k[:, 0]],
                "y": [float(_cy(v)) for v in k[:, 1]],
                "visible": [float(v) for v in k[:, 2]],
            }
        if task == "segment" and "mask" in decoded and image_size:
            mask = np.asarray(decoded["mask"])[i] >= 0.5
            # mask pixel centers -> model pixels (proto grid is square)
            factor = float(image_size) / mask.shape[0]
            polys = find_contours(mask.astype(np.uint8))
            if polys:
                poly = max(polys, key=contour_area).reshape(-1, 2)
                mx = (poly[:, 0] + 0.5) * factor
                my = (poly[:, 1] + 0.5) * factor
                entry["segments"] = {
                    "x": [float(_cx(v)) for v in mx],
                    "y": [float(_cy(v)) for v in my],
                }
            else:
                entry["segments"] = {"x": [], "y": []}
        results.append(entry)
    return results
