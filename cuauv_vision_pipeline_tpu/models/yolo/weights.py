"""Checkpoint I/O for the YOLO family.

Two formats:

* native ``.msgpack`` checkpoints (flax serialization) with a JSON sidecar
  of task/class names — what train.py writes;
* ultralytics ``.pt`` weights (the reference's obb_v14.pt,
  modules/yolo.py:17): the torch (CPU) state dict is mapped onto the flax
  tree BY NAME — every Conv kernel, BN scale/bias/running stats, and head
  conv/bias lands on its counterpart (model.py mirrors the v8 layer order
  and branch widths precisely so the correspondence is total).  The same
  table runs in reverse (``export_ultralytics_state``), which is also how
  the mapping is validated: flax -> torch-names -> flax round-trips to the
  identical tree (tests/test_yolo.py).

Layer correspondence (ultralytics yolov8*.yaml index -> flax module):

    0..9   backbone Conv/C2f/SPPF      -> ConvBnSilu_0..4, C2f_0..3, SPPF_0
    12,15  neck top-down C2f           -> C2f_4, C2f_5
    16,19  neck bottom-up downsamples  -> ConvBnSilu_5, ConvBnSilu_6
    18,21  neck bottom-up C2f          -> C2f_6, C2f_7
    22     Detect/OBB/Pose/Segment head -> {box,cls,ang,kpt,mask}_{conv1,conv2,out}_{s}
           (+ Segment's model.22.proto.{cv1,upsample,cv2,cv3} -> proto/*)

Within a Conv module: ``.conv.weight`` (OIHW) <-> ``Conv_0/kernel`` (HWIO),
``.bn.{weight,bias,running_mean,running_var}`` <->
``BatchNorm_0/{scale,bias,mean,var}``.  The DFL conv (a frozen arange used
by ultralytics' decode) has no flax counterpart — decode.py computes the
DFL expectation arithmetically.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from .model import YOLO, create_model

# ultralytics yolov8 yaml index for every parameterized non-head layer,
# keyed by the flax auto-name it lands on (call order in model.py).
_BACKBONE_IDX = {
    "ConvBnSilu_0": 0,
    "ConvBnSilu_1": 1,
    "C2f_0": 2,
    "ConvBnSilu_2": 3,
    "C2f_1": 4,
    "ConvBnSilu_3": 5,
    "C2f_2": 6,
    "ConvBnSilu_4": 7,
    "C2f_3": 8,
    "SPPF_0": 9,
    "C2f_4": 12,
    "C2f_5": 15,
    "ConvBnSilu_5": 16,
    "C2f_6": 18,
    "ConvBnSilu_6": 19,
    "C2f_7": 21,
}

_HEAD_IDX = 22
# 8 = the in-repo "p" (pico) width, so our own exported .pt round-trips;
# 16..80 are the published ultralytics v8 stem widths
_WIDTH_TO_SIZE = {8: "p", 16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}


def save_checkpoint(path: str, model: YOLO, variables: Dict, extra: Dict) -> None:
    from flax import serialization

    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(variables))
    meta = {
        "task": model.task,
        "size": model.size,
        "num_classes": model.num_classes,
        "num_keypoints": model.num_keypoints,
        "num_masks": model.num_masks,
        **extra,
    }
    # serve at the trained resolution by default: a pico trained at 128/160
    # is single-scale — letterboxing production frames to the ctor-default
    # 640 would hand it objects 3-4x larger than anything it ever saw
    meta.setdefault("image_size", extra.get("image_size"))
    if meta["image_size"] is None:
        del meta["image_size"]
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(path: str) -> Tuple[YOLO, Dict, Dict]:
    if path.endswith(".pt"):
        return _load_ultralytics(path)

    from flax import serialization

    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as fh:
            meta = json.load(fh)
    model, variables = create_model(
        meta.get("num_classes", 80),
        size=meta.get("size", "n"),
        task=meta.get("task", "detect"),
        num_keypoints=meta.get("num_keypoints", 17),
        num_masks=meta.get("num_masks", 32),
    )
    try:
        with open(path, "rb") as fh:
            variables = serialization.from_bytes(variables, fh.read())
    except Exception as exc:
        raise RuntimeError(
            f"failed to read YOLO weight file '{path}': {exc}"
        ) from exc
    return model, variables, meta


def _module_pairs(
    variables: Dict, task: str
) -> List[Tuple[str, Tuple[str, ...], str]]:
    """(torch module prefix, flax module path, kind) for every mapped module;
    kind is 'convbn' (Conv+BN) or 'conv' (plain 1x1 head conv with bias)."""
    params = variables["params"]
    pairs: List[Tuple[str, Tuple[str, ...], str]] = []
    backbone = _BACKBONE_IDX.items()
    if task == "classify":
        # yolov8-cls reuses backbone indices 0..8 verbatim, then its head
        # (Classify) sits at yaml index 9 — no SPPF, no neck, no detect head
        backbone = [(n, i) for n, i in _BACKBONE_IDX.items() if i <= 8]
    for flax_name, idx in backbone:
        tp = f"model.{idx}"
        if flax_name.startswith("ConvBnSilu"):
            pairs.append((tp, (flax_name,), "convbn"))
            continue
        pairs.append((f"{tp}.cv1", (flax_name, "ConvBnSilu_0"), "convbn"))
        pairs.append((f"{tp}.cv2", (flax_name, "ConvBnSilu_1"), "convbn"))
        if flax_name.startswith("C2f"):
            j = 0
            while f"Bottleneck_{j}" in params.get(flax_name, {}):
                base = (flax_name, f"Bottleneck_{j}")
                pairs.append((f"{tp}.m.{j}.cv1", base + ("ConvBnSilu_0",), "convbn"))
                pairs.append((f"{tp}.m.{j}.cv2", base + ("ConvBnSilu_1",), "convbn"))
                j += 1

    if task == "classify":
        pairs.append(("model.9.conv", ("classify_conv",), "convbn"))
        pairs.append(("model.9.linear", ("classify_linear",), "dense"))
        return pairs

    branches = [("cv2", "box"), ("cv3", "cls")]
    if task == "obb":
        branches.append(("cv4", "ang"))
    elif task == "pose":
        branches.append(("cv4", "kpt"))
    elif task == "segment":
        branches.append(("cv4", "mask"))
    for s in range(3):
        for tb, fb in branches:
            hp = f"model.{_HEAD_IDX}.{tb}.{s}"
            pairs.append((f"{hp}.0", (f"{fb}_conv1_{s}",), "convbn"))
            pairs.append((f"{hp}.1", (f"{fb}_conv2_{s}",), "convbn"))
            pairs.append((f"{hp}.2", (f"{fb}_out_{s}",), "conv"))
    if task == "segment":
        pp = f"model.{_HEAD_IDX}.proto"
        pairs.append((f"{pp}.cv1", ("proto", "ConvBnSilu_0"), "convbn"))
        pairs.append((f"{pp}.upsample", ("proto", "up"), "convT"))
        pairs.append((f"{pp}.cv2", ("proto", "ConvBnSilu_1"), "convbn"))
        pairs.append((f"{pp}.cv3", ("proto", "ConvBnSilu_2"), "convbn"))
    return pairs


def _tensor_entries(
    torch_prefix: str, flax_path: Tuple[str, ...], kind: str
) -> List[Tuple[str, Tuple[str, ...], Any]]:
    """(torch key, flax flat path, layout mode) triples; mode is False
    (copy as-is), True (OIHW<->HWIO conv kernel), or 'convT'
    (ConvTranspose2d IOHW <-> flax ConvTranspose HWIO + spatial flip —
    flax's conv_transpose does NOT flip kernels, torch's computes the
    conv gradient, which does; pinned numerically vs torch in
    tests/test_yolo_segment.py)."""
    if kind == "convT":
        return [
            (f"{torch_prefix}.weight",
             ("params",) + flax_path + ("kernel",), "convT"),
            (f"{torch_prefix}.bias",
             ("params",) + flax_path + ("bias",), False),
        ]
    if kind == "dense":
        # torch Linear (out, in) <-> flax Dense kernel (in, out)
        return [
            (f"{torch_prefix}.weight",
             ("params",) + flax_path + ("kernel",), "dense"),
            (f"{torch_prefix}.bias",
             ("params",) + flax_path + ("bias",), False),
        ]
    if kind == "convbn":
        cb = flax_path + ("Conv_0", "kernel")
        bn = flax_path + ("BatchNorm_0",)
        return [
            (f"{torch_prefix}.conv.weight", ("params",) + cb, True),
            (f"{torch_prefix}.bn.weight", ("params",) + bn + ("scale",), False),
            (f"{torch_prefix}.bn.bias", ("params",) + bn + ("bias",), False),
            (f"{torch_prefix}.bn.running_mean",
             ("batch_stats",) + bn + ("mean",), False),
            (f"{torch_prefix}.bn.running_var",
             ("batch_stats",) + bn + ("var",), False),
        ]
    return [
        (f"{torch_prefix}.weight", ("params",) + flax_path + ("kernel",), True),
        (f"{torch_prefix}.bias", ("params",) + flax_path + ("bias",), False),
    ]


def map_ultralytics_state(
    state: Dict[str, np.ndarray], variables: Dict, task: str
) -> Tuple[Dict, Dict[str, int]]:
    """Name-driven import of an ultralytics v8 state dict onto a flax tree.

    Returns (new variables, report) where report counts mapped / missing /
    shape-mismatched tensors.  Unknown torch keys (e.g. the frozen DFL
    conv) are ignored."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(variables))
    report = {"mapped": 0, "missing": 0, "mismatched": 0}
    for tp, fp, kind in _module_pairs(variables, task):
        for tkey, fkey, transpose in _tensor_entries(tp, fp, kind):
            if tkey not in state:
                report["missing"] += 1
                continue
            arr = np.asarray(state[tkey], np.float32)
            if transpose == "convT":
                # torch IOHW -> flax HWIO, spatially flipped
                arr = np.flip(np.transpose(arr, (2, 3, 0, 1)), axis=(0, 1))
            elif transpose == "dense":
                arr = arr.T  # torch Linear (out, in) -> flax Dense (in, out)
            elif transpose:
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            if fkey not in flat or flat[fkey].shape != arr.shape:
                report["mismatched"] += 1
                continue
            flat[fkey] = jax.numpy.asarray(arr)
            report["mapped"] += 1
    return traverse_util.unflatten_dict(flat), report


def export_ultralytics_state(
    variables: Dict, task: str
) -> Dict[str, np.ndarray]:
    """Inverse of map_ultralytics_state: emit this flax tree under
    ultralytics v8 tensor names (OIHW conv layout) — a converter for tools
    expecting torch checkpoints, and the round-trip oracle for the import
    mapping."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    out: Dict[str, np.ndarray] = {}
    for tp, fp, kind in _module_pairs(variables, task):
        for tkey, fkey, transpose in _tensor_entries(tp, fp, kind):
            arr = np.asarray(flat[fkey])
            if transpose == "convT":
                # flax HWIO (flipped) -> torch IOHW
                arr = np.transpose(np.flip(arr, axis=(0, 1)), (2, 3, 0, 1))
            elif transpose == "dense":
                arr = arr.T  # flax Dense (in, out) -> torch Linear (out, in)
            elif transpose:
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            out[tkey] = arr
    return out


def _load_ultralytics(path: str) -> Tuple[YOLO, Dict, Dict]:
    """Import an ultralytics .pt checkpoint (torch CPU)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as exc:
        raise RuntimeError(
            f"failed to read YOLO weight file '{path}': {exc}"
        ) from exc
    torch_model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    names = getattr(torch_model, "names", None) or (
        ckpt.get("names") if isinstance(ckpt, dict) else None
    )
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names)]
    # task lives in different places across ultralytics versions: a .task
    # attribute on the pickled model, a top-level "task" key, or (most
    # commonly in real exports) ckpt["train_args"]["task"]; fall through to
    # structural inference from the head's cv4 branch below — defaulting an
    # OBB checkpoint to "detect" silently loses the angle branch.
    task = getattr(torch_model, "task", None)
    if not task and isinstance(ckpt, dict):
        task = ckpt.get("task")
        if not task:
            targs = ckpt.get("train_args")
            if isinstance(targs, dict):
                task = targs.get("task")
            elif targs is not None:
                task = getattr(targs, "task", None)
    if hasattr(torch_model, "state_dict"):
        raw = torch_model.state_dict()
    else:
        raw = torch_model  # plain state dict
    state = {k: v.float().numpy() for k, v in raw.items() if hasattr(v, "numpy")}

    stem = state.get("model.0.conv.weight")
    if stem is None:
        raise RuntimeError(
            f"'{path}' has no 'model.0.conv.weight' — not an ultralytics v8 "
            f"state dict (keys start: {sorted(state)[:5]})"
        )
    if stem.shape[0] not in _WIDTH_TO_SIZE:
        raise RuntimeError(
            f"'{path}' stem width {stem.shape[0]} matches no known yolov8 "
            f"size (known widths: {sorted(_WIDTH_TO_SIZE)}); refusing to "
            f"build a mismatched model"
        )
    size = _WIDTH_TO_SIZE[stem.shape[0]]
    cls_bias = state.get(f"model.{_HEAD_IDX}.cv3.0.2.bias")
    num_classes = (
        len(names) if names
        else (cls_bias.shape[0] if cls_bias is not None else 80)
    )
    # the extra head branch identifies the task when nothing declared it:
    # a Proto module means segment; OBB's angle branch ends in 1 channel;
    # pose's keypoint branch in 3*nk (32-channel seg coefs would otherwise
    # be mistaken for a pose branch, so the proto check comes first)
    cv4_bias = state.get(f"model.{_HEAD_IDX}.cv4.0.2.bias")
    has_proto = f"model.{_HEAD_IDX}.proto.cv1.conv.weight" in state
    linear_bias = state.get("model.9.linear.bias")  # -cls head (yaml idx 9)
    if not task:
        if linear_bias is not None:
            task = "classify"
        elif has_proto:
            task = "segment"
        elif cv4_bias is None:
            task = "detect"
        elif cv4_bias.shape[0] == 1:
            task = "obb"
        else:
            task = "pose"
    if task == "classify" and not names and linear_bias is not None:
        num_classes = int(linear_bias.shape[0])  # no detect head to read
    # pose checkpoints carry their kpt_shape in the branch width — a custom
    # nk (e.g. 4-point AUV targets) must not shape-mismatch onto 17
    num_keypoints = (
        int(cv4_bias.shape[0]) // 3
        if task == "pose" and cv4_bias is not None
        else 17
    )
    # seg checkpoints carry nm in the coefficient branch width (default 32)
    num_masks = (
        int(cv4_bias.shape[0])
        if task == "segment" and cv4_bias is not None
        else 32
    )

    model, variables = create_model(
        num_classes, size=size, task=task, num_keypoints=num_keypoints,
        num_masks=num_masks,
    )
    variables, report = map_ultralytics_state(state, variables, task)
    print(
        f"[yolo] .pt import ({task}/{size}): {report['mapped']} tensors mapped, "
        f"{report['missing']} missing, {report['mismatched']} shape-mismatched"
    )
    if report["mapped"] == 0:
        raise RuntimeError(
            f"'{path}': no tensors mapped — checkpoint layout does not match "
            f"yolov8 {task}/{size}"
        )
    if report["missing"] or report["mismatched"]:
        import warnings

        warnings.warn(
            f"'{path}': partial .pt import — {report['missing']} expected "
            f"tensors missing, {report['mismatched']} shape-mismatched "
            f"(mapped {report['mapped']}); the unmapped layers keep their "
            f"random init and the model WILL mispredict",
            RuntimeWarning,
            stacklevel=2,
        )
    meta = {
        "task": task,
        "size": size,
        "names": names or [],
        "num_keypoints": num_keypoints,
        "num_masks": num_masks,
    }
    return model, variables, meta
