"""Train a YOLO detector on synthetic scenes, end to end in-repo.

The reference pipeline consumes ultralytics weights trained elsewhere
(reference modules/yolo.py:44-55); this framework owns its model
(models/yolo/model.py), trainer (train.py) and data (synth.py), so a
usable checkpoint can be produced from nothing:

    python examples/train_synthetic.py --steps 700 --out /tmp/synth.msgpack

The resulting .msgpack (+ .json sidecar) loads straight into the serving
path (`CUAUV_YOLO_WEIGHT=/tmp/synth.msgpack python -m
cuauv_vision_pipeline_tpu.modules.yolo zed`) and into YoloModel for the
quantization accuracy-budget tests. Fresh scenes are generated every step
(infinite data — no epochs), and a held-out evaluation reports
recall/precision at IoU >= 0.5.

On a TPU mesh the same step functions shard over devices (the multichip
dry-run jits this trainer under dp x tp sharding; __graft_entry__.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(model, variables, args, seed: int = 10_000):
    """Recall/precision at IoU >= 0.5 over fresh held-out scenes, plus the
    task-specific quality term over MATCHED detections: segment -> mean
    prototype-grid mask IoU; obb -> mean absolute angle error (degrees);
    pose -> mean keypoint distance (pixels)."""
    import jax

    from cuauv_vision_pipeline_tpu.models.yolo.decode import decode
    from cuauv_vision_pipeline_tpu.models.yolo.synth import (
        make_task_batch,
        mask_iou,
        match_detections,
        to_model_input,
    )

    task = model.task
    data_task = getattr(args, "data_task", None) or task

    @jax.jit
    def infer(variables, x):
        out = model.apply(variables, x)
        return jax.vmap(
            lambda o: decode(
                jax.tree.map(lambda v: v[None], o),
                args.image_size,
                conf_thresh=args.conf,
                max_det=8,
            )
        )(out)

    rng = np.random.default_rng(seed)
    tp = n_gt = n_pred = 0
    quality = []
    for _ in range(args.eval_scenes // 8):
        batch = make_task_batch(rng, 8, args.image_size, task=data_task)
        imgs, boxes, cls = batch[:3]
        decoded = jax.tree.map(np.asarray, infer(variables, to_model_input(imgs)))
        for b in range(len(imgs)):
            one = jax.tree.map(lambda v: v[b], decoded)
            t, g, p, pairs = match_detections(
                one, boxes[b], cls[b], conf=args.conf, return_pairs=True
            )
            tp, n_gt, n_pred = tp + t, n_gt + g, n_pred + p
            for pi, gi in pairs:
                if task == "segment":
                    quality.append(mask_iou(one["mask"][pi], batch[3][b][gi]))
                elif task == "obb":
                    err = abs(float(one["angle"][pi]) - float(batch[3][b][gi]))
                    # a rectangle's orientation is modulo pi: gt near one
                    # end of the (-pi/4, 3pi/4) range and a prediction at
                    # the other end are the same box
                    err = min(err, abs(np.pi - err))
                    quality.append(np.degrees(err))
                elif task == "pose":
                    gk = batch[3][b][gi]
                    pk = one["kpts"][pi]
                    quality.append(
                        float(
                            np.mean(
                                np.hypot(
                                    pk[:, 0] - gk[:, 0], pk[:, 1] - gk[:, 1]
                                )
                            )
                        )
                    )
    recall = tp / max(n_gt, 1)
    precision = tp / max(n_pred, 1)
    q = float(np.mean(quality)) if quality else float("nan")
    return recall, precision, n_gt, q


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--model-size", default="p", help="SIZES key (p=pico)")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--eval-scenes", type=int, default=64)
    ap.add_argument("--out", default="/tmp/synth_yolo.msgpack")
    ap.add_argument(
        "--task", default="detect",
        choices=("detect", "segment", "obb", "pose", "gate"),
        help="the task branch to train: segment adds the prototype-mask "
        "BCE (exact instance masks), obb the angle L1 (rotated slabs), "
        "pose the keypoint L1+visibility BCE (disc rim points) — all on "
        "the generator's exact labels",
    )
    ap.add_argument(
        "--dp", type=int, default=1,
        help="data-parallel device count (--batch must divide by it); "
        "demo on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8",
    )
    ap.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel device count (shards wide conv channels)",
    )
    args = ap.parse_args()

    from cuauv_vision_pipeline_tpu.core.jaxconfig import (
        apply_env_platform,
        ensure_compile_cache,
    )

    apply_env_platform()
    ensure_compile_cache()

    import jax

    from cuauv_vision_pipeline_tpu.models.yolo.model import create_model
    from cuauv_vision_pipeline_tpu.models.yolo.synth import (
        CLASS_NAMES,
        GATE_CLASS_NAMES,
        OBB_CLASS_NAMES,
        POSE_CLASS_NAMES,
        POSE_NUM_KEYPOINTS,
        make_task_batch,
        to_model_input,
    )
    from cuauv_vision_pipeline_tpu.models.yolo.train import (
        create_train_state,
        make_train_step,
    )
    from cuauv_vision_pipeline_tpu.models.yolo.weights import save_checkpoint

    names = {
        "obb": OBB_CLASS_NAMES, "pose": POSE_CLASS_NAMES,
        "gate": GATE_CLASS_NAMES,
    }.get(args.task, CLASS_NAMES)
    # "gate" is a DATASET choice, not a head: shark/saw scenes train the
    # plain detect head (the serving path buckets by class NAME into the
    # gate handler, modules/yolo.py DETECTORS)
    model_task = "detect" if args.task == "gate" else args.task
    model, variables = create_model(
        len(names),
        size=args.model_size,
        task=model_task,
        image_size=args.image_size,
        seed=args.seed,
        num_keypoints=POSE_NUM_KEYPOINTS,
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(
        f"[train] {args.model_size}-size {args.task} model: {n_params:,} params"
    )

    state, tx = create_train_state(model, variables, learning_rate=args.lr)
    step = jax.jit(make_train_step(model, tx))

    # multi-device: dp shards the frame batch, tp shards wide conv output
    # channels (parallel/mesh.py); XLA GSPMD inserts the gradient psums —
    # the step function is unchanged. Same layout the driver dry-runs in
    # __graft_entry__.dryrun_multichip.
    put = lambda x: x  # noqa: E731 - identity on a single device
    if args.dp * args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cuauv_vision_pipeline_tpu.parallel.mesh import (
            make_mesh,
            param_shardings,
        )

        assert args.batch % args.dp == 0, "--batch must divide by --dp"
        mesh = make_mesh(args.dp * args.tp, dp=args.dp, tp=args.tp)
        repl = NamedSharding(mesh, P())
        data_shard = NamedSharding(mesh, P("data"))
        p_shard = param_shardings(mesh, state.params, min_channels=32)
        state = type(state)(
            params=jax.tree.map(jax.device_put, state.params, p_shard),
            batch_stats=jax.tree.map(
                lambda x: jax.device_put(x, repl), state.batch_stats
            ),
            opt_state=jax.tree.map(
                lambda x: jax.device_put(x, repl), state.opt_state
            ),
            step=jax.device_put(state.step, repl),
        )
        put = lambda x: jax.device_put(x, data_shard)  # noqa: E731
        print(f"[train] mesh: dp={args.dp} tp={args.tp} "
              f"({args.dp * args.tp} devices)")

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for i in range(args.steps):
        batch = make_task_batch(rng, args.batch, args.image_size, task=args.task)
        imgs, boxes, cls = batch[:3]
        extra = tuple(put(part) for part in batch[3:])
        state, loss = step(
            state, put(to_model_input(imgs)), put(boxes), put(cls), *extra
        )
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"[train] step {i:5d}  loss {float(loss):8.4f}  "
                f"({(time.time() - t0):6.1f}s)",
                flush=True,
            )

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    args.data_task = args.task
    recall, precision, n_gt, quality = evaluate(model, trained, args)
    q_note = {
        "segment": f"  mask-IoU {quality:.3f}",
        "obb": f"  angle-err {quality:.2f} deg",
        "pose": f"  kpt-err {quality:.2f} px",
    }.get(args.task, "")
    print(
        f"[eval] recall {recall:.3f}  precision {precision:.3f}{q_note}  "
        f"({n_gt} gt objects, IoU>=0.5, conf>={args.conf})"
    )

    trained_np = jax.tree.map(np.asarray, trained)
    save_checkpoint(
        args.out,
        model,
        trained_np,
        {"names": list(names), "image_size": args.image_size},
    )
    print(f"[train] saved {args.out} (+ .json sidecar)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
