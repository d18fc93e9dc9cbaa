"""Checkpoint I/O for the YOLO family.

Two formats:

* native ``.msgpack`` checkpoints (flax serialization) with a JSON sidecar
  of task/class names — what train.py writes;
* ultralytics ``.pt`` weights (the reference's obb_v14.pt,
  modules/yolo.py:17): the torch (CPU) state dict is read and mapped onto
  the flax module tree where layer shapes line up. Mapping covers the
  Conv/BN backbone+neck tensors; mismatched heads fall back to init.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

from .model import YOLO, create_model


def save_checkpoint(path: str, model: YOLO, variables: Dict, extra: Dict) -> None:
    from flax import serialization

    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(variables))
    meta = {
        "task": model.task,
        "size": model.size,
        "num_classes": model.num_classes,
        **extra,
    }
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
    )
    with open(path, "rb") as fh:
        variables = serialization.from_bytes(variables, fh.read())
    return model, variables, meta


def _load_ultralytics(path: str) -> Tuple[YOLO, Dict, Dict]:
    """Best-effort import of an ultralytics .pt (torch CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    torch_model = ckpt.get("model", ckpt)
    names = getattr(torch_model, "names", None)
    if isinstance(names, dict):
        names = [names[k] for k in sorted(names)]
    task = getattr(torch_model, "task", None) or ckpt.get("task", "detect")
    state = {
        k: v.float().numpy()
        for k, v in torch_model.state_dict().items()
        if hasattr(v, "numpy")
    }
    num_classes = len(names) if names else 80
    model, variables = create_model(num_classes, size="n", task=task)
    variables = _map_conv_bn(state, variables)
    meta = {"task": task, "names": names or []}
    return model, variables, meta


def _map_conv_bn(torch_state: Dict[str, np.ndarray], variables: Dict) -> Dict:
    """Shape-driven greedy mapping of torch Conv/BN tensors onto the flax
    tree: tensors are consumed in torch's module order and assigned to flax
    leaves of matching (transposed) shape in traversal order."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    conv_weights = [
        (k, v) for k, v in torch_state.items() if k.endswith(".conv.weight")
    ]
    used = set()

    def try_assign(key, torch_arr):
        arr = np.transpose(torch_arr, (2, 3, 1, 0))  # OIHW -> HWIO
        for fk, fv in flat.items():
            if fk in used or fk[-1] != "kernel":
                continue
            if fv.shape == arr.shape:
                flat[fk] = jax.numpy.asarray(arr)
                used.add(fk)
                return True
        return False

    mapped = sum(try_assign(k, v) for k, v in conv_weights)
    if mapped:
        print(f"[yolo] mapped {mapped}/{len(conv_weights)} conv tensors from .pt")
    return traverse_util.unflatten_dict(flat)
