"""Bit-exact goldens at XLA's DEFAULT backend optimization level.

The suite runs with --xla_backend_optimization_level=0 for compile speed
(conftest.py), which disables backend fusion heuristics. Production runs at
the default level, so a fusion-introduced numeric divergence would be
invisible to the rest of CI. This test re-runs the core goldens (colorspace
cube slice + Canny) in a SUBPROCESS with the flag stripped — the only way to
change XLA_FLAGS after the parent's backend initialized.

Reference parity target: the reference's cv2 calls (reference
utils/color.py, utils/feature.py) are the golden; ours must match bit-exact
regardless of optimization level.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent(
    """
    import numpy as np, cv2
    import jax
    assert "xla_backend_optimization_level" not in (
        __import__("os").environ.get("XLA_FLAGS", "")
    )
    from cuauv_vision_pipeline_tpu.ops import color as C
    from cuauv_vision_pipeline_tpu.utils import feature as F

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    for ours, code in (
        (C.bgr_to_gray, cv2.COLOR_BGR2GRAY),
        (C.bgr_to_hsv, cv2.COLOR_BGR2HSV),
        (C.bgr_to_lab, cv2.COLOR_BGR2LAB),
    ):
        ref = cv2.cvtColor(img, code)
        got = np.asarray(ours(img))
        n = int((ref != got).sum())
        assert n == 0, f"{ours.__name__}: {n} mismatches at default opt level"

    gray = cv2.GaussianBlur(
        rng.integers(0, 256, (72, 88), np.uint8), (7, 7), 0
    )
    ref = cv2.Canny(gray, 50, 150)
    got = np.asarray(F.canny(gray, 50, 150))
    assert int((ref != got).sum()) == 0, "canny diverged at default opt level"
    print("DEFAULT_OPTLEVEL_GOLDEN_OK")
    """
)


@pytest.mark.slow
def test_goldens_hold_at_default_backend_opt_level():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip the suite's opt-level-0 flag; keep nothing else XLA-specific
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_backend_optimization_level" not in f
        and "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    # fresh compile cache dir: the suite's cache was populated at level 0
    # and a hit there would defeat the point of this test
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DEFAULT_OPTLEVEL_GOLDEN_OK" in out.stdout
