"""Ahead-of-time chain compilation: persistent-cache priming.

A module process's first dispatch through a remote-attached backend pays a
multi-minute XLA compile per executable — one per ``(want_posts, nlanes)``
pair of its @device_fn (measured live: red_buoy's chain + lane variants
reach first results ~420 s after spawn on a cold cache). The reference had
no equivalent problem (OpenCV has no compile step, reference
core/base.py:761-768); on TPU the compile cache IS the startup-latency
story (core/jaxconfig.py).

:func:`prewarm_chain` builds the EXACT jit target ``ModuleBase.run``
dispatches — the same ``build_packed_fn`` construction, the same
``DevicePipeline`` compile options, the same tuner-scalar dtypes — and
compiles it in the *calling* process. Because the persistent compilation
cache keys on the serialized HLO + compile options (not on Python
function identity), every module process spawned afterwards loads its
chain executables from the shared cache instead of compiling cold:
startup drops from minutes to seconds.

Use it from deployment tooling (or bench.py's ``w`` step) before
launching a vision topology:

    from cuauv_vision_pipeline_tpu.engine.prewarm import prewarm_chain
    from cuauv_vision_pipeline_tpu.modules.red_buoy import BuoyLAB, module_tuners
    prewarm_chain(BuoyLAB, (1080, 1920, 3), tuners=module_tuners,
                  want_posts=(False,))

Modules whose chain needs constructed state (e.g. yolo's model) pass a
prepared instance via ``module=`` — only the attributes the chain touches
need to exist; no bus, no shm.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from ..core.jaxconfig import ensure_compile_cache


def default_tuner_scalars(tuners: Iterable[Any]) -> Dict[str, np.generic]:
    """Default-valued tuner scalars with the EXACT dtypes
    ``ModuleManager.tuner_scalars`` produces (bool_/int32/float64,
    core/base.py) — jit signatures must match or the AOT compile keys a
    different executable than the live module's."""
    out: Dict[str, np.generic] = {}
    for tuner in tuners:
        v = tuner.value
        if isinstance(v, bool):
            out[tuner.name] = np.bool_(v)
        elif isinstance(v, int):
            out[tuner.name] = np.int32(v)
        else:
            out[tuner.name] = np.float64(v)
    return out


def prewarm_chain(
    module_cls: type,
    frame_shapes: Any,
    *,
    tuners: Iterable[Any] = (),
    want_posts: Sequence[bool] = (False, True),
    lane_counts: Optional[Sequence[int]] = None,
    dtype: Any = np.uint8,
    module: Any = None,
    log: Optional[Callable[[str], None]] = None,
) -> Dict[str, float]:
    """Compile a module's device-chain executables into the shared cache.

    ``frame_shapes``: one ``(H, W, C)`` tuple per @device_fn alias (a bare
    tuple of ints is taken as a single shape). For batched chains exactly
    one shape is expected and ``lane_counts`` picks which fresh-lane
    variants to compile (default: every count ``1..batch``, the full set
    ``ModuleBase`` + its background lane warm-up would compile).

    Returns ``{variant_label: seconds}`` per compiled executable. Dispatch
    runs on zero-frames — values are irrelevant, shapes/dtypes are the
    cache key. Failures raise: a prewarm that silently skips a variant
    would hide exactly the cold compile it exists to prevent.
    """
    ensure_compile_cache()
    import jax

    from ..core.base import ModuleBase
    from .executor import DevicePipeline, build_packed_fn

    say = log or (lambda _m: None)
    mod = module if module is not None else module_cls.__new__(module_cls)
    spec = ModuleBase._discover_device_fn(mod, lambda *_a, **_k: None)
    if spec is None:
        raise ValueError(f"{module_cls.__name__} registers no @device_fn")
    dev_bound, aliases, _depth, _async, batch, batch_mode, _latest = spec

    if frame_shapes and isinstance(frame_shapes[0], int):
        frame_shapes = (tuple(frame_shapes),)
    frame_shapes = tuple(tuple(s) for s in frame_shapes)
    if batch > 1 and len(frame_shapes) != 1:
        raise ValueError("batched chains take exactly one frame shape")
    if batch == 1 and len(frame_shapes) != len(aliases):
        raise ValueError(
            f"{module_cls.__name__} chain takes {len(aliases)} frames "
            f"({aliases}); got {len(frame_shapes)} shapes"
        )

    packed_fn, _cells = build_packed_fn(dev_bound, batch, batch_mode)
    pipeline = DevicePipeline(packed_fn, static_argnames=("want_posts",))
    scalars = default_tuner_scalars(tuners)

    timings: Dict[str, float] = {}
    if batch > 1:
        counts = tuple(lane_counts) if lane_counts else tuple(
            range(1, batch + 1)
        )
        variants = [
            ((np.zeros((n,) + frame_shapes[0], dtype),), wp, f"lanes{n}")
            for wp in want_posts
            for n in counts
        ]
    else:
        variants = [
            (
                tuple(np.zeros(s, dtype) for s in frame_shapes),
                wp,
                "single",
            )
            for wp in want_posts
        ]
    for frames, wp, tag in variants:
        label = f"{module_cls.__name__}.{dev_bound.__name__}[{tag},posts={wp}]"
        t0 = time.perf_counter()
        out = pipeline(*frames, tuners=scalars, want_posts=wp)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        timings[label] = dt
        say(f"prewarm {label}: {dt:.1f}s")
    return timings


def main(argv=None) -> int:
    """CLI: AOT-compile one production chain set into the shared cache.

    Deployment tooling runs one short-lived process per stage (``python
    -m cuauv_vision_pipeline_tpu.engine.prewarm red_buoy``): a wedged
    remote-compile RPC can then be killed from outside (a blocked compile
    C call cannot be interrupted by in-process signals — observed live:
    one hung 40+ min), and the caller's own backend state never pays the
    per-process first-readback penalty. Completed executables land in the
    persistent cache either way. The ``bins`` stage honors
    ``CUAUV_BINS_POSE_TEMPLATE`` from the environment like the module.
    """
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="AOT-compile module chain executables into the "
        "shared persistent compile cache (see engine/prewarm.py)"
    )
    ap.add_argument(
        "stage", choices=("red_buoy", "bins", "balance", "yolo")
    )
    ap.add_argument(
        "--shape", default=None, help="HxWxC frame shape override"
    )
    ap.add_argument(
        "--weight",
        default=None,
        help="yolo: checkpoint path (default: the module's own resolution)",
    )
    args = ap.parse_args(argv)
    shape = (
        tuple(int(x) for x in args.shape.split("x")) if args.shape else None
    )

    def say(m: str) -> None:
        print(f"[prewarm] {m}", flush=True)

    if args.stage == "red_buoy":
        from ..modules.red_buoy import BuoyLAB

        t = BuoyLAB.prewarm(shape or (1080, 1920, 3), log=say)
    elif args.stage == "bins":
        from ..modules.bins import BinDetector

        t = BinDetector.prewarm(shape or (720, 1280, 3), log=say)
    elif args.stage == "balance":
        from ..modules.color_balance import ColorBalance

        t = ColorBalance.prewarm(shape or (720, 1280, 3), log=say)
    else:
        from ..modules.yolo import Yolo

        t = Yolo.prewarm(shape or (720, 1280, 3), weight=args.weight, log=say)
    print(
        "PREWARM_RESULT "
        + json.dumps({k: round(v, 1) for k, v in t.items()}),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
