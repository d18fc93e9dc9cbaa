"""YOLOv8-family architecture in flax (NHWC, MXU-friendly).

Replaces the reference's ultralytics/torch inference (reference
modules/yolo.py:44-58) with a JAX graph: CSP backbone (Conv-BN-SiLU + C2f
blocks + SPPF), PAN neck, and decoupled heads for the three tasks the
reference consumes — 'detect' (DFL box regression + classification), 'obb'
(adds an angle branch), and 'pose' (adds a keypoint branch) — plus
'segment' (mask-coefficient branch + Proto prototype head), which the
reference's ultralytics backend supports but its modules never exercised
(reference modules/yolo.py:54-55 names detect/obb/pose "for now"; a user
switching with a -seg.pt checkpoint still gets instance masks here). Sizes
follow
the ultralytics n/s/m width-depth multiples so real checkpoint shapes map
1:1 (weight import in weights.py).

Everything is static-shape and jit-friendly; inference composes with
decode.py's fused decode+NMS into a single device graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SIZES = {
    # depth_multiple, width_multiple, max_channels
    # "p" (pico) has no ultralytics counterpart: a CPU-trainable width for
    # the in-repo synthetic fixture checkpoint (examples/train_synthetic.py)
    # and quantization accuracy-budget tests.
    "p": (1 / 3, 0.125, 1024),
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(round(x / divisor) * divisor))


class ConvBnSilu(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=self.kernel // 2,
            use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_channels: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSilu(self.out_channels, 3)(x, train)
        y = ConvBnSilu(self.out_channels, 3)(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            return x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with split + n bottlenecks + concat."""

    out_channels: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_channels // 2
        y = ConvBnSilu(2 * hidden, 1)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for _ in range(self.n):
            b = Bottleneck(hidden, self.shortcut)(b, train)
            outs.append(b)
        return ConvBnSilu(self.out_channels, 1)(
            jnp.concatenate(outs, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max pools."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        y = ConvBnSilu(hidden, 1)(x, train)

        def pool(v):
            return nn.max_pool(
                v, window_shape=(5, 5), strides=(1, 1), padding=((2, 2), (2, 2))
            )

        p1 = pool(y)
        p2 = pool(p1)
        p3 = pool(p2)
        return ConvBnSilu(self.out_channels, 1)(
            jnp.concatenate([y, p1, p2, p3], axis=-1), train
        )


# ultralytics Classify head's fixed embedding width (not width-scaled)
CLASSIFY_EMBED = 1280


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class Proto(nn.Module):
    """Mask prototype head (ultralytics v8 Segment's Proto): Conv ->
    learnable 2x ConvTranspose upsample -> Conv -> 1x1 Conv, producing
    ``num_masks`` prototype maps at 1/4 model resolution from the P3
    feature. Per-detection masks are linear combinations of these
    prototypes (decode.compose_masks)."""

    mid_channels: int
    num_masks: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnSilu(self.mid_channels, 3)(x, train)
        # flax ConvTranspose (transpose_kernel=False) correspondence with
        # torch ConvTranspose2d is pinned in weights.py (spatial flip +
        # IOHW<->HWIO) and tested numerically vs torch in test_yolo_segment
        x = nn.ConvTranspose(
            self.mid_channels, (2, 2), strides=(2, 2), padding="VALID",
            name="up",
        )(x)
        x = ConvBnSilu(self.mid_channels, 3)(x, train)
        return ConvBnSilu(self.num_masks, 1)(x, train)


class YOLO(nn.Module):
    """Backbone + PAN neck + per-scale heads.

    Outputs a dict with per-scale feature maps:
        box: [B, H_i, W_i, 4*reg_max] DFL logits
        cls: [B, H_i, W_i, num_classes]
        angle: [B, H_i, W_i, 1] (task='obb')
        kpts: [B, H_i, W_i, 3*num_keypoints] (task='pose')
        mcoef: [B, H_i, W_i, num_masks] (task='segment')
    at strides (8, 16, 32); task='segment' additionally carries a single
    'proto' array [B, S/4, S/4, num_masks] of mask prototypes.
    """

    num_classes: int = 80
    size: str = "n"
    task: str = "detect"  # detect | obb | pose | segment | classify
    reg_max: int = 16
    num_keypoints: int = 17
    num_masks: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = SIZES[self.size]

        def ch(base: int) -> int:
            return _make_divisible(min(base, max_ch) * width)

        def reps(base: int) -> int:
            return max(1, round(base * depth))

        # ---- backbone (P1..P5) ----
        x = ConvBnSilu(ch(64), 3, 2)(x, train)  # P1/2
        x = ConvBnSilu(ch(128), 3, 2)(x, train)  # P2/4
        x = C2f(ch(128), reps(3))(x, train)
        x = ConvBnSilu(ch(256), 3, 2)(x, train)  # P3/8
        p3 = C2f(ch(256), reps(6))(x, train)
        x = ConvBnSilu(ch(512), 3, 2)(p3, train)  # P4/16
        p4 = C2f(ch(512), reps(6))(x, train)
        x = ConvBnSilu(ch(1024), 3, 2)(p4, train)  # P5/32
        x = C2f(ch(1024), reps(3))(x, train)

        if self.task == "classify":
            # yolov8-cls: the backbone ends at the P5 C2f (yaml index 8 —
            # no SPPF, no neck); Classify head (ultralytics nn/modules/
            # head.py Classify) = 1x1 conv to a fixed 1280-wide embedding,
            # global average pool, linear classifier. Returns raw logits;
            # callers softmax (predictor.py forward / train.py CE loss).
            e = ConvBnSilu(CLASSIFY_EMBED, 1, name="classify_conv")(x, train)
            e = jnp.mean(e, axis=(1, 2))
            logits = nn.Dense(self.num_classes, name="classify_linear")(e)
            return {"logits": logits}

        p5 = SPPF(ch(1024))(x, train)

        # ---- PAN neck ----
        u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(ch(512), reps(3), shortcut=False)(u4, train)
        u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(ch(256), reps(3), shortcut=False)(u3, train)  # P3 out

        d4 = ConvBnSilu(ch(256), 3, 2)(n3, train)
        n4b = C2f(ch(512), reps(3), shortcut=False)(
            jnp.concatenate([d4, n4], axis=-1), train
        )  # P4 out
        d5 = ConvBnSilu(ch(512), 3, 2)(n4b, train)
        n5 = C2f(ch(1024), reps(3), shortcut=False)(
            jnp.concatenate([d5, p5], axis=-1), train
        )  # P5 out

        # ---- heads (decoupled, shared structure across scales) ----
        outputs: Dict[str, List[jnp.ndarray]] = {"box": [], "cls": []}
        if self.task == "obb":
            outputs["angle"] = []
        if self.task == "pose":
            outputs["kpts"] = []
        if self.task == "segment":
            outputs["mcoef"] = []

        # branch widths follow ultralytics v8 Detect/OBB/Pose so real .pt
        # checkpoints map tensor-for-tensor (weights.py)
        box_ch = max(16, ch(256) // 4, 4 * self.reg_max)
        cls_ch = max(ch(256), min(self.num_classes, 100))
        ang_ch = max(ch(256) // 4, 1)
        kpt_ch = max(ch(256) // 4, 3 * self.num_keypoints)
        seg_ch = max(ch(256) // 4, self.num_masks)

        for i, feat in enumerate((n3, n4b, n5)):
            b = ConvBnSilu(box_ch, 3, name=f"box_conv1_{i}")(feat, train)
            b = ConvBnSilu(box_ch, 3, name=f"box_conv2_{i}")(b, train)
            outputs["box"].append(
                nn.Conv(4 * self.reg_max, (1, 1), name=f"box_out_{i}")(b)
            )

            c = ConvBnSilu(cls_ch, 3, name=f"cls_conv1_{i}")(feat, train)
            c = ConvBnSilu(cls_ch, 3, name=f"cls_conv2_{i}")(c, train)
            outputs["cls"].append(
                nn.Conv(self.num_classes, (1, 1), name=f"cls_out_{i}")(c)
            )

            if self.task == "obb":
                a = ConvBnSilu(ang_ch, 3, name=f"ang_conv1_{i}")(feat, train)
                a = ConvBnSilu(ang_ch, 3, name=f"ang_conv2_{i}")(a, train)
                outputs["angle"].append(
                    nn.Conv(1, (1, 1), name=f"ang_out_{i}")(a)
                )
            if self.task == "pose":
                k = ConvBnSilu(kpt_ch, 3, name=f"kpt_conv1_{i}")(feat, train)
                k = ConvBnSilu(kpt_ch, 3, name=f"kpt_conv2_{i}")(k, train)
                outputs["kpts"].append(
                    nn.Conv(3 * self.num_keypoints, (1, 1), name=f"kpt_out_{i}")(k)
                )
            if self.task == "segment":
                m = ConvBnSilu(seg_ch, 3, name=f"mask_conv1_{i}")(feat, train)
                m = ConvBnSilu(seg_ch, 3, name=f"mask_conv2_{i}")(m, train)
                outputs["mcoef"].append(
                    nn.Conv(self.num_masks, (1, 1), name=f"mask_out_{i}")(m)
                )

        if self.task == "segment":
            # prototype maps from the finest PAN output (ultralytics feeds
            # Proto with the same P3 feature the scale-0 head sees); npr is
            # width-scaled like any channel count (parse_model make_divisible)
            outputs["proto"] = Proto(  # type: ignore[assignment]
                ch(256), self.num_masks, name="proto"
            )(n3, train)

        return outputs


def create_model(
    num_classes: int,
    size: str = "n",
    task: str = "detect",
    image_size: int = 640,
    seed: int = 0,
    num_keypoints: int = 17,
    num_masks: int = 32,
) -> Tuple[YOLO, Dict[str, Any]]:
    """Build a model and initialize parameters."""
    model = YOLO(
        num_classes=num_classes,
        size=size,
        task=task,
        num_keypoints=num_keypoints,
        num_masks=num_masks,
    )
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy)
    return model, variables


def letterbox_params(
    h: int, w: int, image_size: int = 640
) -> Tuple[float, int, int, int, int]:
    """Aspect-preserving letterbox geometry for an h x w frame into an
    image_size square, matching ultralytics' LetterBox (resize by the min
    scale, center-pad): returns (scale, pad_left, pad_top, new_h, new_w).
    Undo a model-space coordinate v with (v - pad) / scale."""
    scale = min(image_size / h, image_size / w)
    nh, nw = round(h * scale), round(w * scale)
    dh, dw = (image_size - nh) / 2, (image_size - nw) / 2
    return scale, round(dw - 0.1), round(dh - 0.1), nh, nw


@functools.lru_cache(maxsize=16)
def _interp_matrix(out_n: int, in_n: int, scale: float = 1.0) -> np.ndarray:
    """Dense 1-D bilinear interpolation matrix (cv2 pixel-center
    alignment: src = (dst+0.5)*in/out - 0.5), optionally pre-scaled —
    the building block of the matmul-form letterbox below."""
    f = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
    i0 = np.clip(np.floor(f), 0, in_n - 1).astype(np.int64)
    i1 = np.clip(i0 + 1, 0, in_n - 1)
    w = np.clip(f - i0, 0.0, 1.0).astype(np.float32)
    M = np.zeros((out_n, in_n), np.float32)
    np.add.at(M, (np.arange(out_n), i0), (1.0 - w) * scale)
    np.add.at(M, (np.arange(out_n), i1), w * scale)
    return M


def preprocess_fused(
    image_u8: jnp.ndarray, image_size: int = 640
) -> jnp.ndarray:
    """MXU-form letterbox: the whole u8->f32 + bilinear resize + round +
    /255 preamble as two constant-matrix matmuls (rows then columns) plus
    a fused epilogue, so the interpolation runs on the systolic array
    instead of 4 HBM gathers + vector lerps. Matches :func:`preprocess`
    exactly at the u8 level (the cv2-style floor(x+0.5) re-quantization
    after resize makes the ~1e-7 association differences vanish). Pad to
    the square stays a cheap static pad."""
    img = image_u8[..., ::-1]  # BGR -> RGB
    h, w = img.shape[-3], img.shape[-2]
    _, left, top, nh, nw = letterbox_params(h, w, image_size)
    x = img.astype(jnp.float32)
    if (nh, nw) != (h, w):
        R = jnp.asarray(_interp_matrix(nh, h))
        C = jnp.asarray(_interp_matrix(nw, w))
        x = jnp.einsum("rh,...hwc->...rwc", R, x)  # MXU
        x = jnp.einsum("qw,...rwc->...rqc", C, x)  # MXU
        # cv2-parity u8 re-quantization (ops/transform.py resize tail)
        x = jnp.clip(jnp.floor(x + 0.5), 0, 255) / 255.0
    else:
        x = x / 255.0
    if (nh, nw) != (image_size, image_size):
        pad = [(0, 0)] * (x.ndim - 3) + [
            (top, image_size - nh - top),
            (left, image_size - nw - left),
            (0, 0),
        ]
        x = jnp.pad(x, pad, constant_values=np.float32(114.0 / 255.0))
    return x


def preprocess(image_u8: jnp.ndarray, image_size: int = 640) -> jnp.ndarray:
    """u8 BGR [..., H, W, 3] -> f32 RGB [..., S, S, 3] in [0, 1].

    Letterboxes like ultralytics predict/track (aspect-preserving resize +
    114-gray center padding) — imported .pt weights were trained on
    letterboxed inputs, so a 16:9 camera frame must not be stretched
    (reference modules/yolo.py:113-116 via ultralytics LetterBox). Shapes
    are static at trace time, so the geometry is compile-time constant."""
    from ...ops.transform import resize

    img = image_u8[..., ::-1]  # BGR -> RGB
    h, w = img.shape[-3], img.shape[-2]
    scale, left, top, nh, nw = letterbox_params(h, w, image_size)
    if (nh, nw) != (h, w):
        img = resize(img, (nw, nh))  # dsize is (width, height)
    if (nh, nw) != (image_size, image_size):
        pad = [(0, 0)] * (img.ndim - 3) + [
            (top, image_size - nh - top),
            (left, image_size - nw - left),
            (0, 0),
        ]
        img = jnp.pad(img, pad, constant_values=114)
    return img.astype(jnp.float32) / 255.0
