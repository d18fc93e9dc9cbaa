"""Training step for the YOLO family (used standalone and by the multichip
dry-run).

The reference consumes externally-trained ultralytics weights and never
trains in-repo; the rebuild owns its model, so it owns a trainer: a
center-assigned detection loss (BCE classification over all anchors + DFL
distribution loss + L1 box regression on assigned anchors; + a cropped,
area-normalized prototype-mask BCE for the segment task) with optax AdamW,
expressed as a pure jittable step so it shards over a device mesh with
data-parallel batches and tensor-parallel conv channels (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .decode import STRIDES, _dfl_expectation
from .model import YOLO


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: YOLO, variables: Dict, learning_rate: float = 1e-3
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return (
        TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32)),
        tx,
    )


def segment_loss(
    outputs: Dict[str, Any],
    targets_xyxy: jnp.ndarray,  # [B, T, 4] padded gt boxes (model pixels)
    targets_masks: jnp.ndarray,  # [B, T, Hp, Wp] binary gt instance masks
    valid_t: jnp.ndarray,  # [B, T] True where the gt slot is real
    image_size: int,
) -> jnp.ndarray:
    """Mask loss for the segment task (ultralytics v8SegmentationLoss's
    single_mask_loss shape): for each gt, the mask predicted by its
    center-assigned anchor's coefficients against the prototype bank —
    BCE over the prototype grid, cropped to the gt box and normalized by
    the box's area so small instances aren't drowned out. Averaged over
    the three scales' assignments (each scale's assigned anchor must
    learn coefficients for the gts it owns)."""
    proto = outputs["proto"]  # [B, Hp, Wp, nm]
    hp, wp = proto.shape[1], proto.shape[2]

    # gt boxes on the prototype grid + crop window (match decode's
    # compose_masks: >= left/top, < right/bottom, pixel indices)
    sx = wp / float(image_size)
    sy = hp / float(image_size)
    x1 = targets_xyxy[..., 0] * sx  # [B, T]
    y1 = targets_xyxy[..., 1] * sy
    x2 = targets_xyxy[..., 2] * sx
    y2 = targets_xyxy[..., 3] * sy
    cols = jnp.arange(wp, dtype=jnp.float32)[None, None, None, :]
    rows = jnp.arange(hp, dtype=jnp.float32)[None, None, :, None]
    crop = (
        (cols >= x1[..., None, None]) & (cols < x2[..., None, None])
        & (rows >= y1[..., None, None]) & (rows < y2[..., None, None])
    )  # [B, T, hp, wp]
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0)  # [B, T] proto pixels

    denom = jnp.maximum(valid_t.sum(), 1)
    total = 0.0
    for i, stride in enumerate(STRIDES):
        coefs = _gather_assigned(
            outputs["mcoef"][i], targets_xyxy, stride
        )  # [B, T, nm]
        logits = jnp.einsum("btc,bhwc->bthw", coefs, proto)
        bce = optax.sigmoid_binary_cross_entropy(logits, targets_masks)
        per_gt = (bce * crop).sum(axis=(-2, -1)) / area  # [B, T]
        total = total + (per_gt * valid_t).sum() / denom
    return total / len(STRIDES)


def _gather_assigned(
    feature_map: jnp.ndarray,  # [B, H, W, C] one scale's head output
    targets_xyxy: jnp.ndarray,  # [B, T, 4]
    stride: int,
) -> jnp.ndarray:
    """Each gt's center-assigned anchor's feature row: [B, T, C]."""
    B = feature_map.shape[0]
    H, W = feature_map.shape[1], feature_map.shape[2]
    cx = (targets_xyxy[..., 0] + targets_xyxy[..., 2]) / 2
    cy = (targets_xyxy[..., 1] + targets_xyxy[..., 3]) / 2
    gx = jnp.clip((cx / stride).astype(jnp.int32), 0, W - 1)
    gy = jnp.clip((cy / stride).astype(jnp.int32), 0, H - 1)
    flat_idx = gy * W + gx  # [B, T]
    flat = feature_map.reshape(B, H * W, -1)
    return jnp.take_along_axis(flat, flat_idx[..., None], axis=1)


def obb_angle_loss(
    outputs: Dict[str, Any],
    targets_xyxy: jnp.ndarray,  # [B, T, 4] center +- extents/2 (UNrotated)
    targets_angle: jnp.ndarray,  # [B, T] radians in (-pi/4, 3pi/4)
    valid_t: jnp.ndarray,  # [B, T]
) -> jnp.ndarray:
    """L1 on the decoded angle — (sigmoid - 0.25) * pi, the dist2rbox
    parameterization decode.py uses — at each gt's center-assigned anchor,
    averaged over scales. Targets must live in the decodable range
    (synth.render_obb_scene generates them there); the box/cls/DFL terms
    come from detection_loss on the unrotated extents, whose center and
    w/h match dist2rbox's lt+rb decomposition."""
    denom = jnp.maximum(valid_t.sum(), 1)
    total = 0.0
    for i, stride in enumerate(STRIDES):
        logits = _gather_assigned(outputs["angle"][i], targets_xyxy, stride)
        pred = (jax.nn.sigmoid(logits[..., 0]) - 0.25) * jnp.pi  # [B, T]
        err = jnp.abs(pred - targets_angle)
        total = total + (err * valid_t).sum() / denom
    return total / len(STRIDES)


def pose_kpt_loss(
    outputs: Dict[str, Any],
    targets_xyxy: jnp.ndarray,  # [B, T, 4]
    targets_kpts: jnp.ndarray,  # [B, T, nk, 3] (x, y, visibility) model px
    valid_t: jnp.ndarray,  # [B, T]
) -> jnp.ndarray:
    """Keypoint regression + visibility for the pose task: per gt, the
    center-assigned anchor's keypoints decode exactly as decode.py does
    ((k * 2) * stride + anchor - stride/2); visible keypoints pay an L1
    on position normalized by the gt box diagonal (small instances count
    like large ones, the role of ultralytics' area term), and every
    keypoint pays a visibility BCE."""
    denom = jnp.maximum(valid_t.sum(), 1)
    diag = jnp.sqrt(
        jnp.maximum(
            (targets_xyxy[..., 2] - targets_xyxy[..., 0]) ** 2
            + (targets_xyxy[..., 3] - targets_xyxy[..., 1]) ** 2,
            1.0,
        )
    )  # [B, T]
    gx = targets_kpts[..., 0]
    gy = targets_kpts[..., 1]
    gv = targets_kpts[..., 2]
    cx = (targets_xyxy[..., 0] + targets_xyxy[..., 2]) / 2
    cy = (targets_xyxy[..., 1] + targets_xyxy[..., 3]) / 2

    total = 0.0
    for i, stride in enumerate(STRIDES):
        H = outputs["kpts"][i].shape[1]
        W = outputs["kpts"][i].shape[2]
        k = _gather_assigned(outputs["kpts"][i], targets_xyxy, stride)
        nk = k.shape[-1] // 3
        k = k.reshape(k.shape[0], k.shape[1], nk, 3)  # [B, T, nk, 3]
        # the assigned anchor's center (same clipped cell as the gather)
        ax = (
            jnp.clip((cx / stride).astype(jnp.int32), 0, W - 1).astype(
                jnp.float32
            )
            + 0.5
        ) * stride
        ay = (
            jnp.clip((cy / stride).astype(jnp.int32), 0, H - 1).astype(
                jnp.float32
            )
            + 0.5
        ) * stride
        kx = (k[..., 0] * 2.0) * stride + (ax[..., None] - 0.5 * stride)
        ky = (k[..., 1] * 2.0) * stride + (ay[..., None] - 0.5 * stride)
        pos_l1 = (jnp.abs(kx - gx) + jnp.abs(ky - gy)) / diag[..., None]
        # average over VISIBLE keypoints only — a mean over all nk would
        # dilute partially-occluded instances' position gradient nk/visible-fold
        n_vis = jnp.maximum(gv.sum(-1), 1.0)
        pos = (pos_l1 * gv).sum(-1) / n_vis  # [B, T]
        vis = optax.sigmoid_binary_cross_entropy(k[..., 2], gv).mean(-1)
        total = total + ((pos + vis) * valid_t).sum() / denom
    return total / len(STRIDES)


def detection_loss(
    outputs: Dict[str, list],
    targets_xyxy: jnp.ndarray,  # [B, T, 4] padded gt boxes (model pixels)
    targets_cls: jnp.ndarray,  # [B, T] class ids; -1 = padding
    num_classes: int,
    reg_max: int = 16,
    targets_angle: jnp.ndarray = None,  # [B, T] radians (obb task only)
) -> jnp.ndarray:
    """Center-assignment loss: each gt claims the anchor containing its
    center at every scale; anchors without gts learn zero objectness.

    ``targets_angle`` (obb): decode's dist2rbox places the box center at
    anchor + R(angle) @ ((rb - lt) / 2), so the consistent ltrb target is
    built from the anchor-to-center offset rotated INTO the box frame,
    f = R(-angle) @ (center - anchor): lt = (w, h)/2 - f, rb = (w, h)/2 + f
    — then (rb - lt)/2 rotated back by angle is exactly center - anchor,
    and lt + rb stays (w, h). Without the rotation the decoded center
    carries a systematic (R(angle) - I) @ offset bias of up to
    ~0.7 * stride px that the loss can never remove."""
    total = 0.0
    B, T = targets_cls.shape
    centers_x = (targets_xyxy[..., 0] + targets_xyxy[..., 2]) / 2
    centers_y = (targets_xyxy[..., 1] + targets_xyxy[..., 3]) / 2
    valid_t = targets_cls >= 0

    for i, stride in enumerate(STRIDES):
        cls_map = outputs["cls"][i]  # [B, H, W, C]
        box_map = outputs["box"][i]  # [B, H, W, 4*reg_max]
        H, W = cls_map.shape[1], cls_map.shape[2]

        gx = jnp.clip((centers_x / stride).astype(jnp.int32), 0, W - 1)  # [B, T]
        gy = jnp.clip((centers_y / stride).astype(jnp.int32), 0, H - 1)

        # one-hot class target map via scatter-free accumulation
        flat_idx = gy * W + gx  # [B, T]
        onehot_t = jax.nn.one_hot(targets_cls, num_classes) * valid_t[..., None]
        anchor_onehot = jax.nn.one_hot(flat_idx, H * W) * valid_t[..., None]
        # [B, H*W, C] target class probabilities (union of assigned gts)
        cls_target = jnp.clip(
            jnp.einsum("bta,btc->bac", anchor_onehot, onehot_t), 0.0, 1.0
        )
        cls_logits = cls_map.reshape(B, H * W, num_classes)
        cls_loss = optax.sigmoid_binary_cross_entropy(cls_logits, cls_target)
        total = total + cls_loss.mean()

        # box regression on assigned anchors: expected ltrb vs gt ltrb
        dists = _dfl_expectation(
            box_map.reshape(B, H * W, 4 * reg_max), reg_max
        ) * stride  # [B, H*W, 4]
        picked = jnp.take_along_axis(
            dists, flat_idx[..., None].repeat(4, -1), axis=1
        )  # [B, T, 4]
        ax = (gx.astype(jnp.float32) + 0.5) * stride
        ay = (gy.astype(jnp.float32) + 0.5) * stride
        if targets_angle is None:
            gt_ltrb = jnp.stack(
                [
                    ax - targets_xyxy[..., 0],
                    ay - targets_xyxy[..., 1],
                    targets_xyxy[..., 2] - ax,
                    targets_xyxy[..., 3] - ay,
                ],
                axis=-1,
            )
        else:
            # obb: offsets live in the rotated box frame (see docstring)
            half_w = (targets_xyxy[..., 2] - targets_xyxy[..., 0]) / 2
            half_h = (targets_xyxy[..., 3] - targets_xyxy[..., 1]) / 2
            ox = centers_x - ax
            oy = centers_y - ay
            cos = jnp.cos(targets_angle)
            sin = jnp.sin(targets_angle)
            fx = ox * cos + oy * sin  # R(-angle) @ offset
            fy = -ox * sin + oy * cos
            gt_ltrb = jnp.stack(
                [half_w - fx, half_h - fy, half_w + fx, half_h + fy],
                axis=-1,
            )
        box_l1 = jnp.abs(picked - gt_ltrb) * valid_t[..., None]
        denom = jnp.maximum(valid_t.sum(), 1)
        total = total + (box_l1.sum() / denom) / stride

        # DFL distribution loss (ultralytics df_loss): cross-entropy of
        # each side's bin distribution against the two integer bins
        # bracketing the stride-unit target, linearly weighted. The L1
        # term above can be satisfied by a diffuse distribution with the
        # right mean; this term sharpens it.
        logits = box_map.reshape(B, H * W, 4, reg_max)
        picked_logits = jnp.take_along_axis(
            logits, flat_idx[..., None, None], axis=1
        )  # [B, T, 4, reg_max]
        t_bins = jnp.clip(gt_ltrb / stride, 0.0, reg_max - 1 - 1e-4)
        tl = jnp.floor(t_bins)
        wl = tl + 1.0 - t_bins
        logp = jax.nn.log_softmax(picked_logits, axis=-1)
        tl_i = tl.astype(jnp.int32)
        lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
        lp_r = jnp.take_along_axis(logp, (tl_i + 1)[..., None], axis=-1)[..., 0]
        dfl = -(wl * lp_l + (1.0 - wl) * lp_r)  # [B, T, 4]
        total = total + (dfl.mean(-1) * valid_t).sum() / denom

    return total


def make_train_step(model: YOLO, tx: optax.GradientTransformation):
    """Returns train_step(state, images_f32, targets_xyxy, targets_cls).

    Per task, the step takes one extra trailing argument after
    (images, t_xyxy, t_cls) and adds that branch's loss to the shared
    box/cls/DFL terms:

    * segment — t_masks [B, T, Hp, Wp] (binary gt instance masks on the
      prototype grid, Hp = image_size // 4) -> segment_loss
    * obb — t_angle [B, T] radians in (-pi/4, 3pi/4); t_xyxy carries the
      UNrotated extents (center +- w/2, h/2) -> obb_angle_loss
    * pose — t_kpts [B, T, nk, 3] (x, y, visibility) -> pose_kpt_loss
    * classify — a dedicated step (images, labels) with softmax CE
    """
    is_segment = model.task == "segment"
    is_obb = model.task == "obb"
    is_pose = model.task == "pose"

    if model.task == "classify":
        # whole-frame labels: train_step(state, images, labels[B]) with a
        # plain softmax cross-entropy — no anchors, boxes, or assignment
        def cls_loss_fn(params, batch_stats, images, labels):
            variables = {"params": params, "batch_stats": batch_stats}
            outputs, updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                outputs["logits"], labels
            ).mean()
            return loss, updates["batch_stats"]

        def classify_step(state: TrainState, images, labels):
            (loss, new_stats), grads = jax.value_and_grad(
                cls_loss_fn, has_aux=True
            )(state.params, state.batch_stats, images, labels)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params, new_stats, opt_state, state.step + 1),
                loss,
            )

        return classify_step

    def loss_fn(params, batch_stats, images, t_xyxy, t_cls, t_extra=None):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, updates = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        loss = detection_loss(
            outputs, t_xyxy, t_cls, model.num_classes, model.reg_max,
            targets_angle=t_extra if is_obb else None,
        )
        valid_t = t_cls >= 0
        if is_segment:
            image_size = images.shape[1]
            loss = loss + segment_loss(outputs, t_xyxy, t_extra, valid_t, image_size)
        if is_obb:
            loss = loss + obb_angle_loss(outputs, t_xyxy, t_extra, valid_t)
        if is_pose:
            loss = loss + pose_kpt_loss(outputs, t_xyxy, t_extra, valid_t)
        return loss, updates["batch_stats"]

    def train_step(state: TrainState, images, t_xyxy, t_cls, *extra):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, t_xyxy, t_cls, *extra
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            loss,
        )

    return train_step
