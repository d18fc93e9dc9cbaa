"""decode()'s top-k NMS candidate pool: exact vs the full-anchor loop.

The greedy NMS runs max_det sequential argmax+suppress passes; pooling to
the top nms_pool candidates by score shrinks every pass's vectors ~16x at
640² and is exact whenever the above-threshold candidate count fits the
pool (zeroed scores are never selected). These tests pin that contract
for every task's extras (angle/kpts/mask ride the same gather).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cuauv_vision_pipeline_tpu.models.yolo.decode import decode  # noqa: E402

SIZE = 224  # anchors: 28² + 14² + 7² = 1029 > the 512 default pool


def _random_outputs(rng, task, num_classes=4, hot=60):
    """Raw head-output pytree with ~`hot` above-threshold candidates."""
    shapes = [SIZE // s for s in (8, 16, 32)]
    n_total = sum(h * h for h in shapes)
    hot_flat = rng.choice(n_total, size=hot, replace=False)
    out = {"box": [], "cls": []}
    if task == "obb":
        out["angle"] = []
    if task == "pose":
        out["kpts"] = []
    if task == "segment":
        out["mcoef"] = []
        out["proto"] = jnp.asarray(
            rng.standard_normal((1, SIZE // 4, SIZE // 4, 32)), jnp.float32
        )
    offset = 0
    for h in shapes:
        cls_map = rng.normal(-5.0, 0.7, (1, h, h, num_classes))
        # boost the chosen anchors' best class well above conf 0.25
        local = hot_flat[(hot_flat >= offset) & (hot_flat < offset + h * h)] - offset
        cls_map.reshape(1, h * h, num_classes)[0, local, 0] = rng.normal(
            2.0, 0.5, len(local)
        )
        offset += h * h
        out["cls"].append(jnp.asarray(cls_map, jnp.float32))
        out["box"].append(
            jnp.asarray(rng.normal(0, 1.0, (1, h, h, 64)), jnp.float32)
        )
        if task == "obb":
            out["angle"].append(
                jnp.asarray(rng.normal(0, 1, (1, h, h, 1)), jnp.float32)
            )
        if task == "pose":
            out["kpts"].append(
                jnp.asarray(rng.normal(0, 1, (1, h, h, 9)), jnp.float32)
            )
        if task == "segment":
            out["mcoef"].append(
                jnp.asarray(rng.normal(0, 1, (1, h, h, 32)), jnp.float32)
            )
    return out


@pytest.mark.parametrize("task", ["detect", "obb", "pose", "segment"])
def test_nms_pool_exact_when_candidates_fit(task):
    rng = np.random.default_rng(hash(task) % 2**31)
    outputs = _random_outputs(rng, task)
    pooled = decode(outputs, SIZE, max_det=16, nms_pool=512)
    full = decode(outputs, SIZE, max_det=16, nms_pool=4096)  # >= all anchors
    assert np.asarray(pooled["valid"]).sum() > 0, "test scene found nothing"
    for k in pooled:
        np.testing.assert_allclose(
            np.asarray(pooled[k]), np.asarray(full[k]), rtol=0, atol=0,
            err_msg=f"{task}/{k}",
        )


def test_nms_pool_overflow_keeps_top_candidates():
    """With conf_thresh 0 every anchor is a candidate (1029 > 512): the
    pool keeps the highest-scored ones, so picks match a full run's picks
    as long as the full run's selections all score inside the pool."""
    rng = np.random.default_rng(9)
    outputs = _random_outputs(rng, "detect", hot=40)
    pooled = decode(outputs, SIZE, max_det=8, conf_thresh=0.0, nms_pool=512)
    full = decode(outputs, SIZE, max_det=8, conf_thresh=0.0, nms_pool=4096)
    # the 40 hot anchors dominate the score ordering; both runs pick them
    np.testing.assert_allclose(
        np.asarray(pooled["score"]), np.asarray(full["score"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pooled["xyxy"]), np.asarray(full["xyxy"]), atol=1e-4
    )
