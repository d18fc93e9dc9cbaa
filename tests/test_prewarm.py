"""AOT prewarm (engine/prewarm.py): the exact-executable contract.

The feature's whole value is that a prewarmed executable is the SAME
cache entry the live module later looks up — which holds iff the
construction is shared (`build_packed_fn`) and the tuner scalar dtypes
match ModuleManager's. These tests pin the surface on the CPU backend.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_default_tuner_scalars_dtypes_match_module_manager():
    from cuauv_vision_pipeline_tpu.core.tuners import (
        BoolTuner,
        DoubleTuner,
        IntTuner,
    )
    from cuauv_vision_pipeline_tpu.engine.prewarm import default_tuner_scalars

    scalars = default_tuner_scalars(
        [IntTuner("a", 3, 0, 10), DoubleTuner("b", 0.5, 0, 1), BoolTuner("c", True)]
    )
    # must mirror ModuleManager.tuner_scalars (core/base.py): bool_/int32/
    # float64 — a dtype mismatch keys a DIFFERENT executable and the
    # prewarm silently warms nothing
    assert scalars["a"].dtype == np.int32
    assert scalars["b"].dtype == np.float64
    assert scalars["c"].dtype == np.bool_


def test_prewarm_red_buoy_compiles_every_lane_variant():
    from cuauv_vision_pipeline_tpu.modules.red_buoy import BuoyLAB

    timings = BuoyLAB.prewarm((48, 64, 3), want_posts=(False,))
    # batch=4 chain -> one executable per fresh-lane count
    assert len(timings) == 4
    assert all(t >= 0 for t in timings.values())
    assert {f"lanes{n}" for n in (1, 2, 3, 4)} == {
        k.split("[")[1].split(",")[0] for k in timings
    }


def test_prewarm_rejects_module_without_device_fn():
    from cuauv_vision_pipeline_tpu.engine.prewarm import prewarm_chain
    from cuauv_vision_pipeline_tpu.modules.color_balance import ColorBalance

    with pytest.raises(ValueError, match="no @device_fn"):
        prewarm_chain(ColorBalance, (32, 32, 3))


def test_prewarm_cli_runs_a_stage(capsys):
    from cuauv_vision_pipeline_tpu.engine import prewarm

    rc = prewarm.main(["red_buoy", "--shape", "40x56x3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PREWARM_RESULT" in out
    import json

    line = next(
        ln for ln in out.splitlines() if ln.startswith("PREWARM_RESULT ")
    )
    result = json.loads(line[len("PREWARM_RESULT "):])
    assert len(result) == 4
