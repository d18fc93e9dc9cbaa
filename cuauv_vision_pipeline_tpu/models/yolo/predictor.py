"""High-level YOLO predictor: the ultralytics-YOLO-shaped entry point.

Gives the reference's module code its familiar surface (reference
modules/yolo.py:49-58, 113-116): construct from a weight path (or task +
class names), ``.task``, ``.to(device)`` no-op, and ``.track(image)``
returning objects whose ``.summary()`` yields the dicts MAP_FN parses —
but the forward + decode + NMS runs as one jitted TPU graph, and tracking
is a host-side ByteTrack-equivalent (tracker.py: Kalman constant-velocity
filter + two-stage high/low-score Hungarian association) matching the
tracker the reference gets implicitly from ``model.track``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decode import decode, summarize
from .model import (
    YOLO,
    create_model,
    letterbox_params,
    preprocess,
    preprocess_fused,
)
from .tracker import ByteTracker
from .weights import load_checkpoint

# The MXU matmul-form letterbox is the default preamble (matches the
# gather path at the u8 level — tests/test_yolo.py); set
# CUAUV_YOLO_FUSED_PREPROCESS=0 to fall back to the gather form.
_PREPROCESS = (
    preprocess
    if os.environ.get("CUAUV_YOLO_FUSED_PREPROCESS", "1") == "0"
    else preprocess_fused
)

DEFAULT_CLASS_NAMES = [
    "torpedo_board", "shark_hole", "saw_hole",
    "shark", "saw", "gate_behind",
    "pole_red", "pole_white",
    "bin_shark", "bin_saw", "bin",
    "spoon", "cup", "pink_basket", "yellow_basket",
]


def quantize_weights_int8(variables):
    """Weight-only int8: per-output-channel symmetric scales for every 4D
    conv kernel (HWIO); everything else passes through. Returns
    (quantized_tree, scales_tree) with identical treedefs — the forward
    dequantizes to bf16 on-chip, so HBM holds 1 byte/weight instead of 4
    (2 vs bf16) and the conv stack's weight-streaming bandwidth quarters.
    Beyond the reference (its yolo ran ultralytics f16/f32,
    reference modules/yolo.py:44-55)."""

    def _scale(arr: np.ndarray) -> np.ndarray:
        s = np.max(np.abs(arr), axis=(0, 1, 2), keepdims=True) / 127.0
        return np.where(s == 0, 1.0, s).astype(np.float32)

    def split_q(p):
        arr = np.asarray(p)
        if arr.ndim == 4 and np.issubdtype(arr.dtype, np.floating):
            s = _scale(arr)
            return np.clip(np.rint(arr / s), -127, 127).astype(np.int8)
        return arr

    def split_s(p):
        arr = np.asarray(p)
        if arr.ndim == 4 and np.issubdtype(arr.dtype, np.floating):
            return _scale(arr)
        return np.float32(1.0)

    return jax.tree.map(split_q, variables), jax.tree.map(split_s, variables)


def _w8a8_conv_interceptor(next_fun, args, kwargs, context):
    """flax method interceptor swapping every ``nn.Conv.__call__`` for an
    int8 x int8 MXU convolution (quantize="w8a8"): per-output-channel
    weight scales, DYNAMIC per-tensor activation scales (no calibration
    pass needed), int32 accumulation, float rescale + bias. The parameter
    tree is untouched — kernels quantize in-graph — so checkpoint
    import/export and the bf16 path share the same variables. Unlike the
    weight-only "int8" mode (an HBM-footprint knob that dequantizes back
    to bf16), this feeds the MXU true int8 operands. Beyond the reference
    (its yolo ran ultralytics f16/f32, reference modules/yolo.py:44-55)."""
    import flax.linen as nn

    mod = context.module
    if not isinstance(mod, nn.Conv) or context.method_name != "__call__":
        return next_fun(*args, **kwargs)
    x = args[0]
    params = mod.variables["params"]
    kernel = jnp.asarray(params["kernel"], jnp.float32)  # HWIO
    s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True) / 127.0
    s_w = jnp.where(s_w == 0, 1.0, s_w)
    k_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

    strides = mod.strides
    if not isinstance(strides, (tuple, list)):
        strides = (strides, strides)
    pad = mod.padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]

    def _dil(d):
        if d is None:
            return None
        return tuple(int(v) for v in (d if isinstance(d, (tuple, list)) else (d, d)))

    out = jax.lax.conv_general_dilated(
        x_q,
        k_q,
        window_strides=tuple(int(s) for s in strides),
        padding=pad,
        lhs_dilation=_dil(mod.input_dilation),
        rhs_dilation=_dil(mod.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (s_x * s_w.reshape(1, 1, 1, -1))
    if mod.use_bias:
        out = out + jnp.asarray(params["bias"], jnp.float32)
    return out.astype(x.dtype)


class _Result:
    """Mimics ultralytics Results just enough for .summary()."""

    def __init__(self, summary: List[Dict]):
        self._summary = summary

    def summary(self) -> List[Dict]:
        return self._summary


class YoloModel:
    """TPU YOLO with the call surface modules/yolo.py expects."""

    def __init__(
        self,
        weight_path: Optional[str] = None,
        task: str = "obb",
        class_names: Optional[Sequence[str]] = None,
        size: str = "n",
        image_size: Optional[int] = None,
        conf_thresh: float = 0.25,
        max_det: int = 32,
        half_precision: bool = True,
        quantize: Optional[str] = None,
        nms_pool: int = 512,
    ):
        """half_precision runs the conv stack in bfloat16 on the MXU (params
        cast at trace time; decode stays f32) — the production inference
        mode; set False for exact-f32 debugging. quantize="int8" (or env
        CUAUV_YOLO_INT8=1) stores conv kernels as int8 + per-channel scale
        and dequantizes to bf16 on-chip (weight-only; activations stay
        bf16 — an HBM-footprint knob). quantize="w8a8" (or env
        CUAUV_YOLO_QUANT=w8a8) runs every conv as int8 x int8 on the MXU
        with dynamic per-tensor activation scales
        (_w8a8_conv_interceptor). nms_pool bounds the greedy-NMS candidate
        set (decode.decode's top-k prefilter — exact while the
        above-conf_thresh candidate count fits it); raise it together
        with very low conf_thresh values, e.g. recall sweeps."""
        # None = serve at the checkpoint's embedded training resolution
        # (falling back to 640); an EXPLICIT value always wins — including
        # an explicit 640 over a small-scale checkpoint (the old ==640
        # sentinel silently overrode it)
        self.image_size = image_size if image_size is not None else 640
        self.half_precision = half_precision
        self.conf_thresh = conf_thresh
        self.max_det = max_det
        # env override reaches the serving modules (which construct
        # YoloModel themselves and expose no kwarg path)
        self.nms_pool = int(os.environ.get("CUAUV_YOLO_NMS_POOL", nms_pool))
        self._tracker = ByteTracker()
        if quantize is None:
            env_q = os.environ.get("CUAUV_YOLO_QUANT", "")
            if env_q:
                quantize = env_q
            elif os.environ.get("CUAUV_YOLO_INT8", "") == "1":
                quantize = "int8"
        if quantize not in (None, "int8", "w8a8"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        self.quantize = quantize

        if weight_path and os.path.exists(weight_path):
            self.model, self.variables, meta = load_checkpoint(weight_path)
            self.task = meta.get("task", task)
            # checkpoint-embedded serving resolution wins over the ctor
            # DEFAULT (single-scale fixtures must serve at their trained
            # size); any explicit ctor value — 640 included — overrides
            if image_size is None and meta.get("image_size"):
                self.image_size = int(meta["image_size"])
            # `or`, not .get(default): a .pt without embedded names stores
            # names as [] — falling through to str(cls_id) names would make
            # every detection miss the name-keyed handler buckets
            self.class_names = list(
                meta.get("names") or class_names or DEFAULT_CLASS_NAMES
            )
        else:
            if weight_path:
                import warnings

                warnings.warn(
                    f"YOLO weight '{weight_path}' not found — serving "
                    f"RANDOM-INIT weights (detections are noise). Fix the "
                    f"path / CUAUV_YOLO_WEIGHT for production.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            self.class_names = list(class_names or DEFAULT_CLASS_NAMES)
            self.task = task
            self.model, self.variables = create_model(
                len(self.class_names),
                size=size,
                task=task,
                image_size=self.image_size,
            )

        model = self.model
        reg_max = model.reg_max
        half = self.half_precision

        # inference-time parameter store: int8+scales when quantized.
        # quantize_weights_int8 returns NUMPY trees; pin them on device
        # once — passing host arrays into the jitted forward would re-upload
        # every weight leaf on every call (measured 124 ms/frame through the
        # tunnel vs 1.6 ms with device-resident weights).
        if self.quantize == "int8":
            self._infer_vars = jax.tree.map(
                jax.device_put, quantize_weights_int8(self.variables)
            )
        else:
            self._infer_vars = self.variables

        def prep_vars(variables):
            """Materialize apply()-ready params from the inference store:
            dequantize int8 kernels (fused into each conv's weight read by
            XLA), bf16-cast the rest when half_precision."""
            if self.quantize == "int8":
                qvars, scales = variables
                # dequant target follows half_precision: the exact-f32
                # debug mode must not add bf16 rounding on top of int8
                tgt = jnp.bfloat16 if half else jnp.float32

                def deq(q, s):
                    if q.dtype == jnp.int8:
                        return q.astype(tgt) * jnp.asarray(s, tgt)
                    if half and jnp.issubdtype(q.dtype, jnp.floating):
                        return q.astype(jnp.bfloat16)
                    return q

                return jax.tree.map(deq, qvars, scales)
            if half:
                from jax.tree_util import DictKey, tree_map_with_path

                skip_kernels = self.quantize == "w8a8"

                def cast(path, p):
                    # w8a8: the interceptor quantizes each conv kernel from
                    # its stored value — bf16-casting kernels first would
                    # waste the cast AND bake bf16 rounding into the int8
                    # scales (the weight-only mode takes scales from f32)
                    if (
                        skip_kernels
                        and path
                        and isinstance(path[-1], DictKey)
                        and path[-1].key == "kernel"
                    ):
                        return p
                    if jnp.issubdtype(p.dtype, jnp.floating):
                        return p.astype(jnp.bfloat16)
                    return p

                return tree_map_with_path(cast, variables)
            return variables

        self._prep_vars = prep_vars

        def forward(variables, image_u8):
            import jax.numpy as jnp

            x = _PREPROCESS(image_u8[None], self.image_size)
            if half:
                x = x.astype(jnp.bfloat16)
            if self.quantize == "w8a8":
                import flax.linen as nn

                with nn.intercept_methods(_w8a8_conv_interceptor):
                    outputs = model.apply(prep_vars(variables), x)
            else:
                outputs = model.apply(prep_vars(variables), x)
            outputs = jax.tree.map(
                lambda o: o.astype(jnp.float32), outputs
            )
            if self.task == "classify":
                return {"probs": jax.nn.softmax(outputs["logits"][0])}
            return decode(
                outputs,
                self.image_size,
                reg_max=reg_max,
                conf_thresh=self.conf_thresh,
                max_det=self.max_det,
                nms_pool=self.nms_pool,
            )

        self._forward = jax.jit(forward)

    def to(self, device: str) -> "YoloModel":
        """Device placement parity shim (reference yolo.py:51-52); JAX
        arrays already live on the default device."""
        return self

    def device_decode(self, image) -> Dict:
        """Traced-friendly forward+decode (image may be a tracer inside an
        outer jit, e.g. a module's @device_fn chain). Returns the raw
        fixed-shape decode dict of device arrays."""
        return self._forward(self._infer_vars, image)

    def device_decode_batch(self, images) -> Dict:
        """Same-camera batched forward: ``[K, H, W, 3]`` queue-drained
        frames (the shape a ``@device_fn(batch=K)`` dispatch carries,
        core/base.py) as ONE K-batch conv stack through the MXU. Every
        leaf of the returned decode dict gains a leading lane axis.

        This is the round-trip-amortization twin of ``device_decode_multi``
        (N *different* cameras). Measured: per-frame device compute RISES
        ~2x at batch 8 (0.375 -> 0.747 ms — the 640^2 convs already fill
        the MXU at batch 1), so the win is K frames per dispatch/fetch
        round trip, which pays exactly where the round trip dominates
        (high-RTT links); see ``device_step_yolo_batch8_720p_ms``.
        """
        import jax

        return jax.vmap(lambda im: self._forward(self._infer_vars, im))(
            images
        )

    def device_decode_multi(self, images) -> Dict:
        """Multi-camera batched forward: letterbox each frame (shapes are
        static per camera at trace time), stack to ``[N, S, S, 3]``, and
        run ONE batched conv stack through the MXU — N cameras cost one
        dispatch instead of N. Every leaf of the returned decode dict
        carries a leading camera axis; slice camera i and pass it to
        summarize_decoded with that camera's original (h, w)."""
        import jax
        import jax.numpy as jnp

        from .decode import decode

        xs = jnp.concatenate(
            [_PREPROCESS(im[None], self.image_size) for im in images], axis=0
        )
        if self.half_precision:
            xs = xs.astype(jnp.bfloat16)
        variables = self._prep_vars(self._infer_vars)

        def one(x):
            if self.quantize == "w8a8":
                import flax.linen as nn

                with nn.intercept_methods(_w8a8_conv_interceptor):
                    outputs = self.model.apply(variables, x[None])
            else:
                outputs = self.model.apply(variables, x[None])
            outputs = jax.tree.map(lambda o: o.astype(jnp.float32), outputs)
            if self.task == "classify":
                return {"probs": jax.nn.softmax(outputs["logits"][0])}
            return decode(
                outputs,
                self.image_size,
                reg_max=self.model.reg_max,
                conf_thresh=self.conf_thresh,
                max_det=self.max_det,
                nms_pool=self.nms_pool,
            )

        return jax.vmap(one)(xs)

    def summarize_decoded(
        self, decoded_np: Dict, orig_hw: Tuple[int, int]
    ) -> List[Dict]:
        """Host half: undo preprocess()'s letterbox (orig = (model_coord -
        pad) / scale) and format ultralytics-style summary dicts. For the
        classify task: top-5 {name, class, confidence} entries (ultralytics
        classification Results.summary())."""
        if self.task == "classify":
            probs = np.asarray(decoded_np["probs"])
            top = np.argsort(probs)[::-1][:5]
            return [
                {
                    "name": (
                        self.class_names[i]
                        if i < len(self.class_names)
                        else str(int(i))
                    ),
                    "class": int(i),
                    "confidence": float(probs[i]),
                }
                for i in top
            ]
        h, w = orig_hw
        scale, left, top, _, _ = letterbox_params(h, w, self.image_size)
        return summarize(
            decoded_np,
            self.class_names,
            (1.0 / scale, 1.0 / scale),
            self.task,
            pad=(left, top),
            clip_wh=(float(w), float(h)),
            image_size=self.image_size,
        )

    def predict(self, image: np.ndarray) -> List[Dict]:
        decoded = self.device_decode(jnp.asarray(image))
        decoded = jax.tree.map(np.asarray, decoded)
        return self.summarize_decoded(decoded, image.shape[:2])

    def track(self, image: np.ndarray, verbose: bool = False) -> List[_Result]:
        summary = self.predict(image)
        if self.task != "classify":  # whole-frame labels carry no boxes
            self._tracker.update(summary)
        return [_Result(summary)]

    def __call__(self, image: np.ndarray) -> List[_Result]:
        return [_Result(self.predict(image))]
