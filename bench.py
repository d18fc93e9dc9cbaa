#!/usr/bin/env python3
"""End-to-end benchmarks: the on-chip device-chain headline FIRST, then the
micro-benches that ground the PCIe-class latency derivations, then all five
BASELINE acceptance configs through the REAL topology (capture process ->
/dev/shm frame bus -> module process -> shm results / post blocks).

Emits one JSON metric line per config to stdout; the headline
{"metric", "value", "unit", "vs_baseline"} (red_buoy 1080p device chain vs
the 2,000 fps/chip target, BASELINE.md) is emitted first AND re-printed as
the final line. All lines are also written to BENCH_RESULTS.json.

Ordering rationale (round-2/3/4 verdicts): the driver's wall clock has
killed four sweeps mid-run (rc=124), so the sweep is: headline first;
then the 'w' PREWARM (engine/prewarm.py compiles every config's exact
module-chain executables in-process — byte-identical HLO, so spawned
module processes hit the shared persistent cache instead of compiling
cold for minutes); then a QUICK pass over all five acceptance configs
(short settle, adaptive stable windows, lines marked pass:"quick",
TIGHT per-config caps) so the tail holds a number for every flagship
metric early no matter where a kill lands; micro-benches + derived
budgets next; then the FULL pass re-measures each config with the long
windows. A config that times out or is budget-skipped re-emits the last
COMMITTED value marked stale (plus this run's progress + module log
tails) — committed measurements are never clobbered by a timeout. Every
step has a hard wall-clock cap (SIGALRM) inside the whole-run
BENCH_TIME_BUDGET_S, which is set below the observed driver kill window
so the sweep exits 0.

Harness context: the chip is tunnel-attached (every H2D/readback pays a
~100-300 ms RTT), so e2e topology numbers measure the tunnel, not the
chain; each device config also gets a COMPUTED `derived_pcie_p50_ms`
line from this run's own measured terms + a documented PCIe link model.
Device-timing discipline: every timed device loop runs BEFORE any
device->host readback in this process (the first readback de-pipelines
the tunnel client; block_until_ready is safe, np.asarray is not).
Env knobs: BENCH_MEASURE_S, BENCH_CONFIGS, BENCH_WARM_S, BENCH_TIME_
BUDGET_S, BENCH_CONFIG_CAP_S, BENCH_QUICK_CAP_S (constants below).
"""

from __future__ import annotations

import contextlib
import ctypes
import json
import os
import signal
import statistics
import subprocess
import sys
import time

import numpy as np

MEASURE_S = float(os.environ.get("BENCH_MEASURE_S", "12"))
WARM_S = float(os.environ.get("BENCH_WARM_S", "1500"))
SETTLE_S = float(os.environ.get("BENCH_SETTLE_S", "45"))
# the driver's wall clock has killed FOUR sweeps mid-run (rc=124 every
# round; the r04 kill landed ~1,900-2,300 s in) — the self-imposed budget
# must finish first so the run exits 0 with every skipped step emitting
# its stale fallback line instead of being cut mid-measure
BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", "1700"))
CONFIG_CAP_S = float(os.environ.get("BENCH_CONFIG_CAP_S", "700"))
# sweep order (round-4 verdict): headline FIRST; then the 'w' prewarm
# AOT-compiles every config's exact module-chain executables in-process
# (engine/prewarm.py — byte-identical HLO -> persistent-cache hits for
# the spawned modules); then the QUICK pass over all five configs with
# tight caps (each line marked pass:"quick"; a cap/budget miss re-emits
# the last committed value marked stale); micro-benches + derived
# budgets next; the 'v' headline-checksum readback after every
# device-timed step; the FULL pass last, overwriting quick lines when it
# gets to run.
CONFIGS = os.environ.get(
    "BENCH_CONFIGS", "h,w,q1,q3,q4,q5,q2,d,s,t,b,y,r,p,v,1,5,2,3,4,8"
).split(",")
QUICK = False  # True while a q* step runs (emit marks + short windows)
QUICK_SETTLE_S = float(os.environ.get("BENCH_QUICK_SETTLE_S", "5"))
QUICK_WINDOW_S = float(os.environ.get("BENCH_QUICK_WINDOW_S", "6"))
# per-config quick caps: with the 'w' prewarm primed, a module subprocess
# pays backend init + trace + cache load + settle (~60-90 s observed
# warm), so the old 640 s cold-compile allowance (which burned the r04
# driver window) shrinks to a tight per-config cap. q2 is larger (its
# record leg runs ~90 s before the measured replay leg spawns).
# BENCH_QUICK_CAP_S overrides all of them (cold-cache debugging).
_QCAP_OVERRIDE = os.environ.get("BENCH_QUICK_CAP_S")
QUICK_CAPS = {"q1": 240.0, "q3": 240.0, "q4": 240.0, "q5": 300.0, "q2": 480.0}
if _QCAP_OVERRIDE:
    QUICK_CAPS = {k: float(_QCAP_OVERRIDE) for k in QUICK_CAPS}
# last observed warm-up/measure state, for degraded emission on timeout
LAST_PROGRESS: dict = {}

# PCIe-class link model for the derived budgets: effective pinned-host
# bandwidth + fixed per-transfer overhead (dispatch + completion). 8 GB/s
# is conservative for gen3 x16 (~12 GB/s effective); production v5e hosts
# are gen4. Both constants are echoed into every derived line.
PCIE_GBPS = 8.0
PCIE_OH_MS = 0.2

RESULTS: list = []
TERMS: dict = {}  # measured micro-terms feeding the derived budgets
_HEADLINE_LINE: dict = {}


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def emit(metric: str, value, unit: str, **extra) -> None:
    line = {"metric": metric, "value": value, "unit": unit}
    if QUICK:
        line["pass"] = "quick"
    line.update(extra)
    # the full pass REFINES the quick pass: one line per metric in the
    # results file, newest wins (stdout keeps both — the tail is a log)
    RESULTS[:] = [r for r in RESULTS if r.get("metric") != metric]
    RESULTS.append(line)
    print(json.dumps(line), flush=True)
    # persist incrementally (a hard-killed run still leaves its metrics),
    # MERGING into the existing file so a subset run (BENCH_CONFIGS=4)
    # refreshes its own metrics without dropping the rest of the sweep
    try:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULTS.json"
        )
        try:
            with open(path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = []
        # rank passes ACROSS runs: a quick line never displaces a
        # FULL-pass row already in the file (it still prints + lives in
        # RESULTS); the full pass always overwrites
        full_rows = {r["metric"] for r in existing if "pass" not in r}
        writable = [
            r
            for r in RESULTS
            if not (r.get("pass") == "quick" and r["metric"] in full_rows)
        ]
        fresh = {r["metric"] for r in writable}
        merged = [
            r for r in existing if r.get("metric") not in fresh
        ] + writable
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    except OSError:
        pass


def _preexec() -> None:
    # children die with the bench (PR_SET_PDEATHSIG = 1)
    ctypes.CDLL(None, use_errno=True).prctl(1, signal.SIGKILL, 0, 0, 0)


def _backend_alive(timeout_s: float = 240.0) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout. The remote
    tunnel can wedge so hard that backend init never returns (observed
    live: bare jax.devices() hung >30 min) — and SIGALRM cannot interrupt
    a blocked C call, so the per-step deadlines below never fire and the
    wedge would silently burn the whole driver window."""
    probe = (
        "from cuauv_vision_pipeline_tpu.core.jaxconfig import "
        "apply_env_platform; apply_env_platform(); "
        "import jax; jax.devices()"
    )
    try:
        # DEVNULL, not pipes: on timeout subprocess.run kills only the
        # direct child then drains pipes UNTIMED — a transport helper
        # that inherited them would wedge the anti-wedge probe itself
        subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            preexec_fn=_preexec,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        log(f"backend probe failed: {type(e).__name__}")
        return False


# log files of processes spawned by the CURRENT step (reset per step):
# a degraded/timeout line attaches their tails so a wedged config in the
# driver environment tells you what each process was doing (the artifact
# IS the debugger there — round-4 verdict).
SPAWNED_LOGS: list = []


def _log_tails(max_bytes: int = 2000, max_lines: int = 20) -> dict:
    tails: dict = {}
    for tag, path in SPAWNED_LOGS[-8:]:
        try:
            with open(path, "rb") as f:
                f.seek(0, os.SEEK_END)
                size = f.tell()
                f.seek(max(0, size - max_bytes))
                text = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        tails[tag] = text.splitlines()[-max_lines:]
    return tails


def spawn(argv: list, tag: str, env: dict = None) -> subprocess.Popen:
    import warnings

    logf = open(f"/tmp/bench_{tag}.log", "wb")
    SPAWNED_LOGS.append((tag, f"/tmp/bench_{tag}.log"))
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    # fork+exec is safe with JAX threads (child execs immediately);
    # silence only JAX's at-fork warning for this call
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message=r"os\.fork\(\) was called")
        return subprocess.Popen(
            [sys.executable, "-m"] + argv,
            stdout=logf,
            stderr=subprocess.STDOUT,
            preexec_fn=_preexec,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=full_env,
        )


def stop(*procs: subprocess.Popen) -> None:
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGINT)
    deadline = time.monotonic() + 8
    for p in procs:
        try:
            p.wait(timeout=max(0.1, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()


def clean_shm() -> None:
    for name in os.listdir("/dev/shm"):
        if name.startswith("auv_visiond_") or name.startswith("auv_shm_"):
            try:
                os.unlink(os.path.join("/dev/shm", name))
            except OSError:
                pass


class StepTimeout(Exception):
    pass


@contextlib.contextmanager
def hard_deadline(name: str, cap_s: float):
    """SIGALRM-enforced wall-clock cap: a config that stalls (compile
    storm, dead module, wedged link) raises out of its blocking wait so
    the sweep provably fits the budget. Child processes are cleaned up by
    the config's own finally/stop on unwind."""

    def _handler(signum, frame):
        raise StepTimeout(f"{name}: exceeded {cap_s:.0f}s hard cap")

    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(max(1, int(cap_s)))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


class PostWatch:
    """Counts writes + samples camera->post latency on a module post block
    (posts carry the camera acquisition time, core/base.py)."""

    def __init__(self, name_substr: str, deadline_s: float):
        from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
            BLOCK_STUB,
            BlockAccessor,
        )
        import glob as _glob

        end = time.monotonic() + deadline_s
        found = None
        LAST_PROGRESS.clear()
        LAST_PROGRESS.update(
            what=f"post block '{name_substr}'", stage="discover"
        )
        while time.monotonic() < end:
            hits = [
                p
                for p in _glob.glob(BLOCK_STUB + "module_*_post%*")
                if name_substr in p
            ]
            if hits:
                found = sorted(hits)[0][len(BLOCK_STUB) :]
                break
            time.sleep(0.25)
        if found is None:
            raise TimeoutError(f"no post block matching '{name_substr}'")
        self.block_name = found
        self._acc = BlockAccessor(found)
        self._acc.__enter__()

    def uid(self) -> int:
        return self._acc.latest_uid

    def sample_latency_ms(self):
        from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import ReadStatus

        status, _, acq = self._acc.read_frame()
        if status == ReadStatus.SUCCESS:
            return int(time.monotonic() * 1000) - acq
        return None

    def close(self) -> None:
        self._acc.__exit__(None, None, None)


def measure_counter(
    read_count,
    sample_latency=None,
    seconds: float = None,
    sample_latency2=None,
):
    """Rate of a monotonic counter + optional latency samples on change.
    ``sample_latency2`` collects a second series (e.g. newest-lane-only
    latency) at the same instants; returns (rate, lats[, lats2])."""
    if seconds is None:
        seconds = MEASURE_S
    LAST_PROGRESS.update(stage="measure", window_s=seconds)
    c0 = read_count()
    t0 = time.monotonic()
    last = c0
    lats: list = []
    lats2: list = []
    while time.monotonic() - t0 < seconds:
        c = read_count()
        if c != last:
            if sample_latency is not None:
                v = sample_latency()
                if v is not None and v >= 0:
                    lats.append(v)
            if sample_latency2 is not None:
                v = sample_latency2()
                if v is not None and v >= 0:
                    lats2.append(v)
        last = c
        time.sleep(0.002)
    dt = time.monotonic() - t0
    rate = (last - c0) / dt
    if sample_latency2 is not None:
        return rate, lats, lats2
    return rate, lats


def wait_counter(read_count, deadline_s: float, what: str, min_advance: int = 3) -> None:
    """Wait until the counter advances by min_advance (a single bump can be
    a module's init write, not flowing results), then let the pipeline
    SETTLE before the caller measures: the first results after a module's
    warm-up drain frames that queued during the first-readback compile
    penalty (stale camera stamps, trickle rate) and would poison a window
    that starts immediately."""
    c0 = read_count()
    t0 = time.monotonic()
    end = t0 + deadline_s
    settle = QUICK_SETTLE_S if QUICK else SETTLE_S
    LAST_PROGRESS.clear()
    LAST_PROGRESS.update(what=what, stage="warm", advances=0, elapsed_s=0.0)
    while time.monotonic() < end:
        adv = read_count() - c0
        LAST_PROGRESS.update(
            advances=int(adv), elapsed_s=round(time.monotonic() - t0, 1)
        )
        if adv >= min_advance:
            log(f"{what}: flowing; settling {settle:.0f}s before measuring")
            LAST_PROGRESS.update(stage="settle")
            time.sleep(settle)
            return
        time.sleep(0.25)
    raise TimeoutError(f"no progress on {what} within {deadline_s:.0f}s")


def p50(xs) -> float:
    return float(statistics.median(xs)) if xs else float("nan")


def measure_cfg(
    read_count,
    sample_latency=None,
    seconds: float = None,
    sample_latency2=None,
):
    """Config measurement window, quick-pass aware.

    Full pass: one plain measure_counter window. Quick pass: the module's
    background lane-trace compiles are usually still running when the
    warm gate opens (observed live: a 5 s window right after first results
    reads 0.0 fps because every dispatch is stuck behind a remote compile),
    so take short windows repeatedly until two consecutive ones agree
    within ~2x (steady flow) or the attempts run out, and report the last
    window. Quick numbers are precision-degraded by construction — the
    stability gate just keeps them from being compile-artifacts."""
    if not QUICK:
        return measure_counter(
            read_count, sample_latency, seconds, sample_latency2
        )
    prev_rate = None
    out = None
    for attempt in range(10):
        out = measure_counter(
            read_count, sample_latency, QUICK_WINDOW_S, sample_latency2
        )
        rate = out[0]
        LAST_PROGRESS.update(
            stage="quick-measure", attempt=attempt, rate=round(rate, 2)
        )
        if (
            prev_rate is not None
            and rate > 0
            and prev_rate > 0
            and 0.5 <= rate / prev_rate <= 2.0
        ):
            break
        prev_rate = rate
    return out


# ---------------------------------------------------------------------------
# device-resident benches (NO readbacks — see module docstring)
# ---------------------------------------------------------------------------


# known HBM bandwidths (GB/s) by jax device_kind — the speed-of-light
# denominator for the headline's physics check (BENCH_NOTES). Values are
# public spec-sheet numbers.
HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}

# headline measurement discipline (round-4 verdict): fixed-iteration
# windows measured ~3-21 ms of wall time and swung 2.4x between rounds,
# crossing the chip's bandwidth floor. Windows are now TIME-targeted
# (>= HEADLINE_WINDOW_S each) and repeated until two consecutive windows
# agree within 20% — the reported number is the last window, and the line
# records chip identity + window metadata so it is adjudicable against
# speed-of-light for the chip it came from.
HEADLINE_WINDOW_S = float(os.environ.get("BENCH_HEADLINE_WINDOW_S", "3"))
_HEADLINE_VERIFY: dict = {}


def _chained_windows(step, min_s: float, start_iters: int, max_windows: int = 5):
    """Dependence-chained dispatch windows of >= min_s wall each.

    ``step()`` enqueues ONE dispatch whose inputs depend on the previous
    dispatch's outputs (the caller's carry) and returns the value to
    block on. Iteration counts adapt: each attempt's count scales from
    the previous attempt's rate until a window spans min_s; QUALIFYING
    (>= min_s) windows then repeat until two consecutive agree within
    20%, or max_windows. Returns (qualifying_fps_list, iters,
    elapsed_of_last) — the caller reports the MEDIAN of the qualifying
    windows (the tunnel transport drifts 1.2-1.7x between windows;
    BENCH_NOTES round-5 differential runs). block_until_ready at the
    window end includes the full drain of every enqueued dispatch, so
    the rate cannot measure enqueue overlap."""
    import jax

    iters = start_iters
    qualifying: list = []
    fps = 0.0
    elapsed = 0.0
    for _ in range(max_windows):
        t0 = time.perf_counter()
        last = None
        for _i in range(iters):
            last = step()
        jax.block_until_ready(last)
        elapsed = time.perf_counter() - t0
        fps = iters / elapsed
        if elapsed < min_s:  # too short to trust: scale up and retry
            iters = max(iters + 1, int(iters * (min_s * 1.2) / elapsed))
            continue
        qualifying.append(fps)
        if (
            len(qualifying) >= 2
            and min(qualifying[-2:]) > 0
            and max(qualifying[-2:]) / min(qualifying[-2:]) <= 1.2
        ):
            break
    return qualifying or [fps], iters, elapsed


def headline_device_chain() -> None:
    """Device-resident red_buoy chain throughput: the chip-capacity
    headline, emitted FIRST so no later step can take it down."""
    import jax

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import buoy_frame
    from cuauv_vision_pipeline_tpu.engine.chains import red_buoy_fused

    H, W = 1080, 1920
    N_DISTINCT = 8

    device_kind = jax.devices()[0].device_kind
    hbm = HBM_GBPS.get(device_kind)

    host_frames = [buoy_frame((H, W), t / 9.0) for t in range(N_DISTINCT)]
    dev_frames = [jax.device_put(f) for f in host_frames]
    jax.block_until_ready(dev_frames)

    tmin = np.int32(130)
    tmax = np.int32(255)

    # Chains are enqueued asynchronously (back-to-back dispatch keeps the
    # chip busy) and each window synchronizes once at its end; per-frame
    # scalar readback is excluded because on this harness any host round
    # trip measures the ~100 ms tunnel, not the chain. Each iteration's
    # threshold carries the previous iteration's area (same executable —
    # thresholds are traced data): a scalar data dependence that forces
    # true serialization, so the loop cannot measure enqueue/overlap
    # artifacts. The carry also accumulates a running area checksum that
    # the late 'v' step materializes and checks (readback AFTER all
    # device-timed steps — the first readback de-pipelines the tunnel
    # client, BENCH_NOTES.md).
    import jax.numpy as _jnp

    @jax.jit
    def one_dep(frame, tmin, tmax, prev):
        area0, csum = prev
        t = tmin + area0.astype(_jnp.int32) % 2
        threshed, cleaned, best = red_buoy_fused(frame, t, tmax)
        a = best["area"].astype(_jnp.int32)
        return best, (best["area"], csum + a)

    carry1 = (jax.device_put(np.int32(0)), jax.device_put(np.int32(0)))
    out = one_dep(dev_frames[0], tmin, tmax, carry1)
    jax.block_until_ready(out)  # compile

    idx = [0]

    def step1():
        nonlocal carry1
        best, carry1 = one_dep(
            dev_frames[idx[0] % N_DISTINCT], tmin, tmax, carry1
        )
        idx[0] += 1
        return best

    fps1_windows, iters1, win1_s = _chained_windows(
        step1, HEADLINE_WINDOW_S, 400
    )
    per_dispatch_fps = float(statistics.median(fps1_windows))
    TERMS["red_buoy_step_ms"] = 1000.0 / per_dispatch_fps
    log(
        f"device chain (per-frame dispatch): {per_dispatch_fps:.1f} fps "
        f"(windows {[round(f, 1) for f in fps1_windows]}, last {win1_s:.2f}s)"
    )

    # Batched lane: the SAME chain through the @device_fn(batch=K) dispatch
    # shape (one [B,H,W,3] lax.map executable per B frames — the red_buoy
    # module's production batch path). One dispatch RPC carries B frames,
    # so the number tracks chip capacity instead of the harness transport's
    # per-dispatch cost (which swings 0.03-0.15 ms between windows and
    # dominates a 0.04 ms chain).
    BATCH = 8
    batched_frames = jax.device_put(np.stack(host_frames))
    jax.block_until_ready(batched_frames)

    import jax.numpy as jnp

    @jax.jit
    def batched_dep(frames, tmin, tmax, prev):
        area0, csum = prev
        t = tmin + area0.astype(jnp.int32) % 2
        threshed, cleaned, best = jax.lax.map(
            lambda im: red_buoy_fused(im, t, tmax), frames
        )
        a = best["area"].astype(jnp.int32)
        return threshed, cleaned, best, (best["area"][0], csum + a.sum())

    carry = (jax.device_put(np.int32(0)), jax.device_put(np.int32(0)))
    out = batched_dep(batched_frames, tmin, tmax, carry)
    jax.block_until_ready(out)  # compile

    def stepb():
        nonlocal carry
        _t, _c, best, carry = batched_dep(batched_frames, tmin, tmax, carry)
        return best

    fpsb_windows, itersb, winb_s = _chained_windows(
        stepb, HEADLINE_WINDOW_S, 256
    )
    batched_fps = float(statistics.median(fpsb_windows)) * BATCH
    TERMS["red_buoy_batched_step_ms"] = 1000.0 / batched_fps
    log(
        f"device chain (batch={BATCH} dispatch): {batched_fps:.1f} fps "
        f"(windows {[round(f * BATCH, 1) for f in fpsb_windows]}, "
        f"last {winb_s:.2f}s)"
    )

    # Bandwidth control (same process, same window discipline): one pure
    # ~199 MB read per dispatch (a 4x stack of the frame set, so device
    # read time >> the ~34 us Python enqueue cost — a 50 MB version was
    # enqueue-limited and under-read the link) calibrates what the
    # chip+transport sustain RIGHT NOW. Chain numbers are judged against
    # THIS, not a datasheet: measured live, the control exceeded the
    # "TPU v5 lite" datasheet 819 GB/s by 1.8x, and identical chain
    # graphs swing up to 4x between processes (BENCH_NOTES round 5).
    ctrl_stack = jax.device_put(np.concatenate([np.stack(host_frames)] * 4))
    jax.block_until_ready(ctrl_stack)

    @jax.jit
    def _readsum(fr, prev):
        return (fr.astype(jnp.int32) + prev).sum()

    rc = jax.device_put(np.int32(0))
    out_rc = _readsum(ctrl_stack, rc % 3)
    jax.block_until_ready(out_rc)

    def step_rc():
        nonlocal rc
        rc = _readsum(ctrl_stack, rc % 3)
        return rc

    rc_windows, _it_rc, _el_rc = _chained_windows(
        step_rc, min(HEADLINE_WINDOW_S, 2.0), 1024, max_windows=3
    )
    ctrl_dps = float(statistics.median(rc_windows))
    read_gbps = ctrl_dps * ctrl_stack.size / 1e9
    log(f"read control: {read_gbps:.0f} GB/s sustained")

    # late verification handles: materialized by the 'v' step after every
    # device-timed step has run (first readback de-pipelines the client)
    _HEADLINE_VERIFY.update(
        carry_batched=carry, carry_single=carry1, last_best=out[2]
    )

    def stability_pct(windows):
        if len(windows) < 2:
            return None
        lo, hi = min(windows[-2:]), max(windows[-2:])
        return round((hi / lo - 1.0) * 100, 1) if lo > 0 else None

    chain_fps, lane = max(
        (per_dispatch_fps, "per_frame_dispatch"),
        (batched_fps, f"batched_{BATCH}"),
    )
    # speed-of-light floor for the winning lane on THIS chip: the chain's
    # unavoidable HBM traffic is ~11 MB/frame (BENCH_NOTES speed-of-light
    # accounting: 6.2 MB u8 input read + fused mask-pass intermediates)
    floor_us = (11.0e6 / (hbm * 1e9)) * 1e6 if hbm else None
    target = 2000.0
    _HEADLINE_LINE.update(
        {
            "metric": "red_buoy_1080p_device_chain_fps_per_chip",
            "value": round(chain_fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(chain_fps / target, 4),
            "lane": lane,
            "per_dispatch_fps": round(per_dispatch_fps, 2),
            f"batched_{BATCH}_fps": round(batched_fps, 2),
            "device_kind": device_kind,
            "hbm_gbps_assumed": hbm,
            "window_s": round(winb_s, 2),
            "window_dispatches": itersb,
            "windows_fps": [round(f * BATCH, 1) for f in fpsb_windows],
            "window_stability_pct": stability_pct(
                [f * BATCH for f in fpsb_windows]
            ),
            "frame_us": round(1e6 / chain_fps, 2),
            "bandwidth_floor_us_per_frame": (
                round(floor_us, 2) if floor_us else None
            ),
            # same-process pure-read calibration: judge the chain against
            # the link's MEASURED bandwidth, not the datasheet
            "read_control_gbps": round(read_gbps, 1),
            "input_read_gbps_at_headline": round(
                chain_fps * H * W * 3 / 1e9, 1
            ),
        }
    )
    emit(**_HEADLINE_LINE)


def headline_verify() -> None:
    """Materialize the headline's running checksums (the FIRST readback in
    this process — scheduled after every device-timed step). Confirms the
    dependence chain executed: the accumulated area checksum is nonzero
    and the final detection is sane.

    The materialization runs on a helper thread with a hard bound: the
    per-process first readback pays an uncacheable remote transfer
    compile (measured 150-545 s) and on a degraded transport has been
    observed to never return — a wedged readback must still leave an
    explanatory line instead of dying in the step cap."""
    import threading

    if not _HEADLINE_VERIFY:
        raise RuntimeError("headline never ran; nothing to verify")
    box: dict = {}

    def _work() -> None:
        try:
            box["csum_b"] = int(np.asarray(_HEADLINE_VERIFY["carry_batched"][1]))
            box["csum_1"] = int(np.asarray(_HEADLINE_VERIFY["carry_single"][1]))
            box["found"] = bool(
                np.asarray(_HEADLINE_VERIFY["last_best"]["found"]).any()
            )
        except Exception as e:  # pragma: no cover - link-dependent
            box["err"] = f"{type(e).__name__}: {e}"

    t0 = time.perf_counter()
    th = threading.Thread(target=_work, daemon=True)
    th.start()
    th.join(timeout=560.0)
    if th.is_alive() or "err" in box:
        emit(
            "headline_checksum",
            0,
            "bool",
            verified=False,
            readback_timed_out=th.is_alive(),
            error=box.get("err"),
            elapsed_s=round(time.perf_counter() - t0, 1),
            note=(
                "checksum readback did not complete: the transport "
                "wedged on this process's first device->host fetch (the "
                "uncacheable per-process transfer compile). The headline "
                "windows themselves synchronized via block_until_ready, "
                "which does not require the fetch path; the dependence "
                "carry still serializes every dispatch."
            ),
        )
        return
    emit(
        "headline_checksum",
        1 if (box["csum_b"] != 0 and box["csum_1"] != 0 and box["found"]) else 0,
        "bool",
        verified=True,
        batched_area_checksum=box["csum_b"],
        single_area_checksum=box["csum_1"],
        warmup_found=box["found"],
        note=(
            "running area checksum accumulated through every headline "
            "window's dependence carry, materialized after all device-"
            "timed steps; nonzero proves each window's dispatches "
            "executed the full chain (no elision/overlap artifact)"
        ),
    )


def prewarm_module_chains() -> None:
    """Compile the exact chain executables the topology configs' module
    subprocesses will run (engine/prewarm.py: same build_packed_fn
    construction, same DevicePipeline options, same tuner dtypes ->
    byte-identical HLO -> persistent-cache hits), so every spawned module
    loads its chain from .jax_cache instead of compiling cold (round-3/4
    verdicts: a cold chain compile takes minutes per executable — q5
    produced 0 detections in 640 s because its yolo subprocess was still
    compiling when the cap fired).

    Each stage runs in its OWN subprocess (engine.prewarm CLI): a wedged
    remote-compile RPC gets killed at the stage cap instead of blocking
    the sweep (SIGALRM cannot interrupt a blocked compile C call —
    observed live: one hung 40+ min in-process), and this process's
    pipelined transport never pays the stage's first-readback penalty.
    Completed executables are cached either way; failures recorded."""
    import json as _json

    t_start = time.perf_counter()
    timings: dict = {}
    failures: dict = {}

    gate_w = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests",
        "fixtures",
        "gate_pico_detect.msgpack",
    )
    # stage order mirrors the quick-config order (q1,q3,q4,q5,q2); the
    # config-5b batch=8 lane variants warm LAST (cheapest to sacrifice).
    stages = [
        ("red_buoy", ["red_buoy"], None, 420),
        ("bins", ["bins"], {"CUAUV_BINS_POSE_TEMPLATE": "builtin"}, 600),
        ("balance", ["balance"], None, 240),
        ("yolo", ["yolo"], None, 480),
        ("yolo_gate", ["yolo", "--weight", gate_w], None, 480),
        ("yolo_b8", ["yolo"], {"CUAUV_YOLO_BATCH": "8"}, 600),
    ]
    current = None
    try:
        for label, argv, env, cap in stages:
            t0 = time.perf_counter()
            current = spawn(
                ["cuauv_vision_pipeline_tpu.engine.prewarm"] + argv,
                f"warm_{label}",
                env=env,
            )
            try:
                rc = current.wait(timeout=cap)
                current = None
            except subprocess.TimeoutExpired:
                current.kill()
                current.wait()
                current = None
                failures[label] = (
                    f"stage killed at its {cap}s cap (wedged compile RPC "
                    "or an oversized graph); completed executables up to "
                    "the kill are cached"
                )
                log(f"prewarm {label}: killed at {cap}s cap")
                continue
            tail = ""
            try:
                with open(f"/tmp/bench_warm_{label}.log") as f:
                    tail = f.read()[-4000:]
            except OSError:
                pass
            if rc != 0:
                failures[label] = (
                    f"rc={rc} after {time.perf_counter() - t0:.0f}s: "
                    + tail.strip().splitlines()[-1][-200:]
                    if tail.strip()
                    else f"rc={rc}"
                )
                log(f"prewarm {label}: FAILED rc={rc}")
                continue
            for line in tail.splitlines():
                if line.startswith("PREWARM_RESULT "):
                    timings.update(_json.loads(line[len("PREWARM_RESULT "):]))
            log(f"prewarm {label}: done in {time.perf_counter() - t0:.0f}s")
    except StepTimeout:
        # the whole-step cap fired between stage waits: kill the live
        # child, record the partial result, let the deadline unwind
        if current is not None and current.poll() is None:
            current.kill()
            current.wait()
        failures["<step>"] = "step cap fired mid-prewarm"
        _emit_prewarm_line(t_start, timings, failures)
        raise
    _emit_prewarm_line(t_start, timings, failures)


def _emit_prewarm_line(t_start, timings, failures) -> None:
    emit(
        "prewarm_compile_s",
        round(time.perf_counter() - t_start, 1),
        "seconds",
        per_executable={k: round(v, 1) for k, v in timings.items()},
        failures=failures or None,
        note=(
            "per-stage subprocess AOT compile of every topology config's "
            "exact module-chain executables (engine/prewarm.py CLI); "
            "spawned module processes load these from the shared "
            "persistent cache, so config warm-up is backend-init + trace "
            "+ cache-load instead of a cold XLA compile per executable"
        ),
    )


def stereo_fanin_bench() -> None:
    """Batched CCL fan-in: both ZED eyes in ONE device dispatch (the
    red_buoy_stereo module's chain), device-resident pairs/sec."""
    import jax

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import buoy_frame
    from cuauv_vision_pipeline_tpu.modules.red_buoy_stereo import BuoyStereo

    H, W = 720, 1280  # production ZED HD720
    frames = [
        (
            jax.device_put(buoy_frame((H, W), t / 7.0)),
            jax.device_put(buoy_frame((H, W), t / 5.0 + 1)),
        )
        for t in range(4)
    ]
    jax.block_until_ready(frames)

    module = BuoyStereo.__new__(BuoyStereo)  # chain only; no bus setup
    chain = jax.jit(
        lambda a, b, tmin, tmax: BuoyStereo.stereo_chain(
            module, a, b, tuners={"thresh_min": tmin, "thresh_max": tmax},
            want_posts=False,
        ),
        static_argnames=(),
    )
    tmin, tmax = np.int32(140), np.int32(255)
    out = chain(*frames[0], tmin, tmax)
    jax.block_until_ready(out)

    ITERS = 200
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = chain(*frames[i % 4], tmin, tmax)
    jax.block_until_ready(out)
    pairs_per_s = ITERS / (time.perf_counter() - t0)
    emit(
        "red_buoy_stereo_720p_pairs_per_sec",
        round(pairs_per_s, 2),
        "stereo pairs/sec",
        note="both eyes labeled in one batched Pallas CCL dispatch, device-resident",
    )


def device_step_bench() -> None:
    """Amortized per-frame device step time of each config's chain at its
    config resolution — the `step` term of the derived PCIe budgets. All
    loops block once at the end (no readbacks)."""
    import jax

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import (
        bins_frame,
        buoy_frame,
    )

    H, W = 720, 1280
    ITERS = 100

    # Transport state probe: a trivial jitted op's amortized dispatch cost.
    # In pipelined mode this is 0.03-0.05 ms; a congested window (or a
    # de-pipelined client after an accidental readback) reads 1-300 ms and
    # explains any inflated step numbers below without guesswork.
    tiny = jax.device_put(np.zeros((8, 128), np.float32))
    bump = jax.jit(lambda x: x + 1.0)
    out = bump(tiny)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(200):
        out = bump(out)
    jax.block_until_ready(out)
    dispatch_ms = (time.perf_counter() - t0) / 200 * 1000
    TERMS["dispatch_overhead_ms"] = dispatch_ms
    log(f"dispatch overhead: {dispatch_ms:.4f} ms/call")
    emit(
        "dispatch_overhead_per_call_ms",
        round(dispatch_ms, 4),
        "ms",
        note=(
            "amortized cost of a trivial jitted dispatch; the transport-"
            "state probe for interpreting every device step below"
        ),
    )

    def timed(name, fn, frames):
        out = fn(frames[0])
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(frames[i % len(frames)])
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / ITERS * 1000
        TERMS[name] = ms
        log(f"device step {name}: {ms:.3f} ms/frame")
        return ms

    # bins chain (config 3): HSV + inRange + open -> cleaned mask
    from cuauv_vision_pipeline_tpu.modules.bins import BinDetector

    bins_mod = BinDetector.__new__(BinDetector)
    bins_chain = jax.jit(
        lambda img: BinDetector.bins_chain(
            bins_mod, img, tuners={}, want_posts=False
        )
    )
    bin_frames = [
        jax.device_put(bins_frame((H, W), t / 5.0)) for t in range(4)
    ]
    jax.block_until_ready(bin_frames)
    bins_ms = timed("bins_step_ms", bins_chain, bin_frames)

    # color-balance chain (config 4): default-flag balance pipeline
    from cuauv_vision_pipeline_tpu.ops.balance import BalanceConfig, balance

    cfg = BalanceConfig()
    cb = jax.jit(lambda img: balance(img, cfg))
    cb_frames = [
        jax.device_put(buoy_frame((H, W), t / 5.0)) for t in range(4)
    ]
    jax.block_until_ready(cb_frames)
    cb_ms = timed("balance_step_ms", cb, cb_frames)

    # yolo forward+decode+NMS (config 5) at the production 720p input
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel

    model = YoloModel(None, task="obb")
    yolo = lambda img: model.device_decode(img)
    yolo_ms = timed("yolo_step_ms", yolo, cb_frames)

    # weight-only int8 (conv kernels int8+scale, dequant fused on-chip)
    model_i8 = YoloModel(None, task="obb", quantize="int8")
    yolo_i8 = lambda img: model_i8.device_decode(img)
    yolo_i8_ms = timed("yolo_int8_step_ms", yolo_i8, cb_frames)

    # w8a8: TRUE int8 x int8 MXU convs (dynamic activation scales)
    model_w8 = YoloModel(None, task="obb", quantize="w8a8")
    yolo_w8 = lambda img: model_w8.device_decode(img)
    yolo_w8_ms = timed("yolo_w8a8_step_ms", yolo_w8, cb_frames)

    # multi-camera batched forward: 2 cameras, ONE MXU dispatch
    import jax as _jax

    flir_frames = [
        jax.device_put(buoy_frame((600, 800), t / 4.0)) for t in range(4)
    ]
    jax.block_until_ready(flir_frames)
    multi = _jax.jit(lambda a, b: model.device_decode_multi((a, b)))
    out = multi(cb_frames[0], flir_frames[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(100):
        out = multi(cb_frames[i % 4], flir_frames[i % 4])
    jax.block_until_ready(out)
    multi_ms = (time.perf_counter() - t0) / 100 * 1000
    TERMS["yolo_multicam_step_ms"] = multi_ms

    # same-camera batch=8: the @device_fn(batch=K) dispatch shape for yolo
    # (CUAUV_YOLO_BATCH). One [8,720p] stack -> ONE 8-batch conv stack.
    # Measures the per-frame device-compute cost of batching (observed ~2x
    # at batch 8 — the 640^2 convs already fill the MXU at batch 1); the
    # e2e win is round-trip amortization, measured by config 5b.
    BATCH = 8
    stack = jax.device_put(  # re-render on host: np.asarray of a DEVICE
        np.stack([buoy_frame((H, W), t / 5.0) for t in range(4)] * 2)
    )  # array here was this process's first readback -> de-pipelined it
    jax.block_until_ready(stack)
    batched = jax.jit(lambda ims: model.device_decode_batch(ims))
    out = batched(stack)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(50):
        out = batched(stack)
    jax.block_until_ready(out)
    batch_ms = (time.perf_counter() - t0) / 50 * 1000
    TERMS["yolo_batch8_step_ms"] = batch_ms
    log(
        f"device step yolo batch=8: {batch_ms:.3f} ms/dispatch "
        f"({batch_ms / BATCH:.3f} ms/frame)"
    )

    note = (
        "amortized async dispatch at 720p (red_buoy at 1080p from the "
        "headline); the `step` term of the derived budgets"
    )
    emit("device_step_bins_720p_ms", round(bins_ms, 3), "ms/frame", note=note)
    emit("device_step_balance_720p_ms", round(cb_ms, 3), "ms/frame", note=note)
    emit(
        "device_step_yolo_720p_ms",
        round(yolo_ms, 3),
        "ms/frame",
        note=note + " (full forward+decode+NMS, bf16 conv stack)",
    )
    emit(
        "device_step_yolo_int8_720p_ms",
        round(yolo_i8_ms, 3),
        "ms/frame",
        bf16_ms=round(yolo_ms, 3),
        note="weight-only int8 conv kernels (per-channel scales, on-chip dequant to bf16); parity pinned by tests/test_yolo.py",
    )
    emit(
        "device_step_yolo_w8a8_720p_ms",
        round(yolo_w8_ms, 3),
        "ms/frame",
        bf16_ms=round(yolo_ms, 3),
        note="int8 x int8 MXU convs (per-channel weight scales, dynamic per-tensor activation scales, int32 accumulate); parity pinned by tests/test_yolo.py",
    )
    emit(
        "device_step_yolo_multicam_2cam_ms",
        round(multi_ms, 3),
        "ms/2 frames",
        per_camera_ms=round(multi_ms / 2, 3),
        single_camera_ms=round(yolo_ms, 3),
        note="zed 720p + flir 600p letterboxed into ONE batched MXU dispatch (modules/yolo_multicam.py chain)",
    )
    emit(
        "device_step_yolo_batch8_720p_ms",
        round(batch_ms / 8, 3),
        "ms/frame",
        dispatch_ms=round(batch_ms, 3),
        single_frame_ms=round(yolo_ms, 3),
        note="8 same-camera 720p frames as ONE 8-batch conv stack (the CUAUV_YOLO_BATCH=8 @device_fn dispatch shape); per-frame = dispatch/8 — device compute per frame RISES vs batch 1 (640^2 convs fill the MXU at batch 1); the e2e win is K frames per round trip (config 5b / yolo_e2e_batch8_fps)",
    )


def train_step_bench() -> None:
    """On-chip training throughput: the detect train step (forward + TAL
    assignment + CIoU/BCE/DFL losses + backward + adam update) at n-width,
    batch 16, 320^2 — the in-repo training capability the reference lacks
    (it consumed externally-trained ultralytics weights, reference
    modules/yolo.py:44-55). Weights and batch stay device-resident; the
    loop is dependence-chained by construction (state feeds state)."""
    import jax

    from cuauv_vision_pipeline_tpu.models.yolo.model import create_model
    from cuauv_vision_pipeline_tpu.models.yolo.train import (
        create_train_state,
        make_train_step,
    )

    image_size, batch = 320, 16
    model, variables = create_model(
        num_classes=8, size="n", task="detect", image_size=image_size
    )
    state, tx = create_train_state(model, variables)
    step = jax.jit(make_train_step(model, tx))

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((batch, image_size, image_size, 3), np.float32).astype(
            np.float32
        )
    )
    t_xyxy = jax.device_put(
        (rng.random((batch, 6, 4)).astype(np.float32) * image_size)
    )
    t_cls = jax.device_put(rng.integers(0, 8, (batch, 6)).astype(np.int32))
    state = jax.device_put(state)

    new_state, loss = step(state, images, t_xyxy, t_cls)
    jax.block_until_ready(loss)  # compile
    ITERS = 30
    t0 = time.perf_counter()
    for _ in range(ITERS):
        new_state, loss = step(new_state, images, t_xyxy, t_cls)
    jax.block_until_ready(loss)
    ms = (time.perf_counter() - t0) / ITERS * 1000
    log(f"train step (detect n, b{batch}@{image_size}): {ms:.2f} ms")
    emit(
        "train_step_detect_n_b16_320_ms",
        round(ms, 2),
        "ms/step",
        images_per_sec=round(batch * 1000.0 / ms, 1),
        loss=float(loss),
        note=(
            "full detect train step on one chip (forward + TAL assign + "
            "CIoU/BCE/DFL + backward + adam), n-width, batch 16 @ 320^2, "
            "state device-resident and dependence-chained; beyond-reference "
            "capability (models/yolo/train.py)"
        ),
    )


def transfer_bench() -> None:
    """H2D transfer: single 1080p BGR frame (6.2 MB), sync / pipelined /
    zero-copy (dlpack, no numpy bounce). Grounds the 'what would PCIe do'
    derivation for the e2e numbers."""
    import jax

    frame = np.random.default_rng(0).integers(
        0, 255, (1080, 1920, 3), np.uint8
    )
    # sync single-frame H2D (each put materialized before the next)
    for _ in range(2):
        jax.block_until_ready(jax.device_put(frame))
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        jax.block_until_ready(jax.device_put(frame))
    sync_ms = (time.perf_counter() - t0) / N * 1000

    # pipelined: keep transfers in flight (what the depth-N executor does)
    t0 = time.perf_counter()
    M = 40
    bufs = [jax.device_put(frame) for _ in range(M)]
    jax.block_until_ready(bufs)
    piped_ms = (time.perf_counter() - t0) / M * 1000

    # zero-copy: wrap the staging buffer via dlpack (no host bounce copy)
    # then device_put the cpu-backed array. Invisible behind the tunnel
    # RTT; on PCIe hosts it removes one 6.2 MB host memcpy per frame.
    zc_ms = None
    try:
        import jax.numpy as jnp

        cpu_view = jnp.from_dlpack(frame)
        dev = jax.devices()[0]
        jax.block_until_ready(jax.device_put(cpu_view, dev))
        t0 = time.perf_counter()
        for _ in range(N):
            jax.block_until_ready(jax.device_put(cpu_view, dev))
        zc_ms = (time.perf_counter() - t0) / N * 1000
    except Exception as e:
        log(f"zero-copy H2D unavailable: {type(e).__name__}: {e}")

    mb = frame.nbytes / 1e6
    TERMS["h2d_sync_ms"] = sync_ms
    emit(
        "h2d_1080p_frame_ms",
        round(sync_ms, 2),
        "ms",
        pipelined_ms=round(piped_ms, 2),
        frame_mb=round(mb, 1),
        sync_mbps=round(mb / (sync_ms / 1000), 1),
        pipelined_mbps=round(mb / (piped_ms / 1000), 1),
        note="tunnel-attached chip; production PCIe-class links move 6.2MB in <1ms",
    )
    if zc_ms is not None:
        emit(
            "h2d_zero_copy_ms",
            round(zc_ms, 2),
            "ms",
            copy_path_ms=round(sync_ms, 2),
            note="staging buffer -> dlpack cpu array -> device_put (no numpy bounce); tunnel RTT dominates here, the saving is the host memcpy on PCIe hosts",
        )


def bus_roundtrip_bench() -> None:
    """Camera->bus->module-host latency with NO device in the loop: writer
    process publishes frames through the real /dev/shm seqlock ring, a
    reader consumes them; p50 of (read time - acquisition stamp). This is
    the pure host leg of the camera-to-detection budget, at both config
    resolutions."""
    for label, (h, w) in (("720p", (720, 1280)), ("1080p", (1080, 1920))):
        _bus_roundtrip_once(label, h, w)


def _bus_roundtrip_once(label: str, h: int, w: int) -> None:
    import uuid

    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
        BlockAccessor,
        ReadStatus,
    )

    direction = f"bench_bus_{uuid.uuid4().hex[:8]}"
    writer_code = (
        "import sys, time, numpy as np\n"
        "from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor\n"
        f"acc = BlockAccessor('{direction}', max_entry_size_bytes={h}*{w}*3, slot_count=8)\n"
        f"frame = np.random.default_rng(0).integers(0,255,({h},{w},3),np.uint8)\n"
        "with acc:\n"
        "    end = time.monotonic() + 25\n"
        "    while time.monotonic() < end:\n"
        "        acc.write_frame(int(time.monotonic()*1000), frame)\n"
        "        time.sleep(1/60)\n"
    )
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message=r"os\.fork\(\) was called")
        proc = subprocess.Popen(
            [sys.executable, "-c", writer_code],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT,
            preexec_fn=_preexec,
        )
    lats = []
    try:
        reader = BlockAccessor(direction)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                with reader:
                    reader.block_thread()
                    end = time.monotonic() + 10
                    while time.monotonic() < end and len(lats) < 400:
                        status, data, acq = reader.read_frame()
                        if status == ReadStatus.SUCCESS and data is not None:
                            # touch one byte per page-ish to include the
                            # consumer-visible cost, then stamp
                            _ = int(data[0, 0, 0]) + int(data[-1, -1, -1])
                            lats.append(time.monotonic() * 1000 - acq)
                break
            except Exception:
                time.sleep(0.5)  # writer not up yet
    finally:
        stop(proc)
    TERMS[f"bus_{label}_p50_ms"] = p50(lats)
    emit(
        f"bus_roundtrip_{label}_p50_ms",
        round(p50(lats), 2),
        "ms",
        n_samples=len(lats),
        note="capture proc -> /dev/shm seqlock ring -> reader (no device); the host leg of camera-to-detection",
    )


def yolo_host_path_bench() -> None:
    """Host half of the YOLO module tick: summarize_decoded (letterbox
    undo + validity filter) + tracker.update + class bucketing + all six
    OBB handlers on a realistic decode dict. With the device forward
    measured separately and H2D/bus measured, this completes the
    camera-to-detection budget without the tunnel in the loop.

    Runs in a SUBPROCESS: model construction touches the device and its
    first host readback would de-pipeline this process's dispatch path
    (BENCH_NOTES.md "de-pipelining trap")."""
    code = (
        "from bench import _yolo_host_path_inner\n"
        "print('YOLO_HOST_MS', _yolo_host_path_inner())\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    ms = None
    for line in out.stdout.splitlines():
        if line.startswith("YOLO_HOST_MS"):
            ms = float(line.split()[1])
    if ms is None:
        raise RuntimeError(f"host-path subprocess failed: {out.stderr[-800:]}")
    TERMS["yolo_host_ms"] = ms
    emit(
        "yolo_host_path_ms",
        round(ms, 2),
        "ms",
        note="summarize + tracker.update + bucketing + six OBB handlers per frame, host only (perf mode)",
    )


def _yolo_host_path_inner() -> float:
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.models.yolo.data import MAP_FN
    from cuauv_vision_pipeline_tpu.models.yolo.predictor import YoloModel
    from cuauv_vision_pipeline_tpu.modules.yolo import (
        HANDLERS,
        TUNERS,
        Yolo,
        _ACTIVE_FLAG,
    )
    from cuauv_vision_pipeline_tpu.core.handlers import HandlerMixin

    rng = np.random.default_rng(0)
    module = object.__new__(Yolo)
    module.post = lambda *a, **k: None
    module._performance_enabled = True
    values = {t.name: 0.05 for t in TUNERS}

    class _T(dict):
        def __getitem__(self, k):
            return values[k]

    module._module_manager = _T()
    module.normalize = lambda c: (c[0] / 640 - 0.5, c[1] / 640 - 0.5)
    module.normalize_axis = lambda c, a: c / 640 - 0.5
    module.get_latency = lambda: 0
    HandlerMixin.__init__(module, HANDLERS)
    module.model = YoloModel(None, task="obb", image_size=640, max_det=32)
    module.map_fn = MAP_FN["obb"]
    for flag in _ACTIVE_FLAG.values():
        shm.active_objects.set_field(flag, True)
        shm.active_objects.set_field(f"{flag}_direction", "forward")

    # realistic decode dict: max_det candidates, ~8 valid
    n = module.model.max_det
    decoded = {
        "xyxy": rng.random((n, 4), np.float32) * 640,
        "score": rng.random((n,), np.float32),
        "cls": rng.integers(0, 15, (n,)).astype(np.float32),
        "angle": rng.random((n,), np.float32),
        "valid": (np.arange(n) < 8),
    }
    image = rng.integers(0, 255, (720, 1280, 3), np.uint8)

    def tick():
        # the REAL on_device_result sequence (modules/yolo.py:123-136):
        # summarize, tracker update, bucket + handlers
        results = module.model.summarize_decoded(dict(decoded), (720, 1280))
        module.model._tracker.update(results)
        module._dispatch_detections("forward", image, results)

    tick()  # warm
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        tick()
    return (time.perf_counter() - t0) / N * 1000


def host_leg_bench() -> None:
    """Tiny host legs of the non-yolo configs: shm result write (config 1)
    and contour+minAreaRect extraction on a bin-plate mask (config 3)."""
    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.utils.feature import (
        min_enclosing_rect,
        outer_contours,
    )

    g = shm.red_buoy_results
    t0 = time.perf_counter()
    for i in range(1000):
        g.set(visible=True, center_x=0.1, center_y=0.2, area=123.0,
              latency_ms=1.0, latency_newest_ms=1.0)
    TERMS["shm_set_ms"] = (time.perf_counter() - t0)  # /1000 its in ms

    # representative cleaned mask: the bin plate rectangle at 720p
    mask = np.zeros((720, 1280), np.uint8)
    mask[300:460, 480:800] = 255
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        rects = [
            min_enclosing_rect(c) for c in outer_contours(mask)
        ]
    TERMS["bins_host_ms"] = (time.perf_counter() - t0) / N * 1000

    # config 4 host legs (the chain is three parallel consumers of one
    # source): the preprocessor's stage stack at the bench topology's
    # default tuners (pass-through; per-stage costs only when tuned on)
    # and auto_calibrate's control loop (LAB-L mean + box means + copy +
    # rect annotation — pure host by design, reference
    # modules/auto_calibrate.py:56-259)
    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import buoy_frame
    from cuauv_vision_pipeline_tpu.ops.color_np import lab_l_np
    from cuauv_vision_pipeline_tpu.utils.draw import Color, draw_rect

    img = buoy_frame((720, 1280), 0.3)
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        l_chan = lab_l_np(img[::4, ::4])  # default sample_stride tuner
        _ = float(l_chan.mean())
        box = img[100:150, 100:150].astype(np.float32)
        _ = box.reshape(-1, 3).mean(0)
        annotated = img.copy()
        draw_rect(annotated, (100, 100), (150, 150), Color.GREEN, 2)
    TERMS["auto_calibrate_host_ms"] = (time.perf_counter() - t0) / N * 1000

    t0 = time.perf_counter()
    for _ in range(N):
        out = img  # default tuner stack: every stage off -> identity
        _ = out.shape
    TERMS["preprocess_host_default_ms"] = (time.perf_counter() - t0) / N * 1000
    log(
        f"host legs: shm set {TERMS['shm_set_ms']:.4f} ms, bins contours "
        f"{TERMS['bins_host_ms']:.3f} ms ({len(rects)} rect), "
        f"auto_calibrate {TERMS['auto_calibrate_host_ms']:.3f} ms, "
        f"preprocess(default) {TERMS['preprocess_host_default_ms']:.4f} ms"
    )


def derived_budget_bench() -> None:
    """COMPUTED camera-to-detection p50 on a PCIe-class host, per device
    config, from THIS RUN's measured terms. The two tunnel-hidden legs use
    the documented link model (PCIE_GBPS effective + PCIE_OH_MS/transfer);
    every term is echoed so the arithmetic is auditable."""

    def xfer_ms(mbytes: float) -> float:
        return PCIE_OH_MS + mbytes / (PCIE_GBPS * 1000.0)

    link = f"pcie-class link model: {PCIE_GBPS} GB/s effective + {PCIE_OH_MS} ms/transfer"

    def derive(metric, bus_key, frame_mb, step_key, fetch_mb, host_ms, note):
        bus = TERMS.get(bus_key)
        step = TERMS.get(step_key)
        if bus is None or step is None or host_ms is None:
            log(f"{metric}: missing terms (bus={bus}, step={step}, host={host_ms})")
            return
        h2d = xfer_ms(frame_mb)
        fetch = xfer_ms(fetch_mb)
        total = bus + h2d + step + fetch + host_ms
        emit(
            metric,
            round(total, 2),
            "ms",
            bus_ms=round(bus, 3),
            h2d_ms=round(h2d, 3),
            step_ms=round(step, 3),
            fetch_ms=round(fetch, 3),
            host_ms=round(host_ms, 3),
            frame_mb=round(frame_mb, 2),
            fetch_mb=round(fetch_mb, 3),
            link_model=link,
            note=note,
        )

    derive(
        "derived_pcie_p50_ms_config1_red_buoy",
        "bus_1080p_p50_ms",
        1080 * 1920 * 3 / 1e6,
        "red_buoy_step_ms",
        0.001,  # packed detection scalars
        TERMS.get("shm_set_ms"),
        "1080p frame up, detection scalars back, shm result write",
    )
    derive(
        "derived_pcie_p50_ms_config3_bins",
        "bus_720p_p50_ms",
        720 * 1280 * 3 / 1e6,
        "bins_step_ms",
        720 * 1280 / 1e6,  # cleaned mask rides the packed fetch
        TERMS.get("bins_host_ms"),
        "720p frame up, cleaned mask back, host contours+minAreaRect (SIFT pose excluded: optional flow, measured separately in config 3)",
    )
    derive(
        "derived_pcie_p50_ms_config4_balance",
        "bus_720p_p50_ms",
        720 * 1280 * 3 / 1e6,
        "balance_step_ms",
        720 * 1280 * 3 / 1e6,  # balanced u8 image back
        0.0,
        "720p frame up, balanced image back; preprocessor/auto_calibrate idle at default tuners (perf mode: no post copies)",
    )
    # config 4's CHAIN decomposition (round-3 verdict: the balance line
    # alone had no leg breakdown for the other two consumers): the three
    # modules consume the same source in parallel, so the chain p50 is the
    # max of the three per-module budgets, each assembled from measured
    # legs. preprocessor/auto_calibrate are host-only (no device legs);
    # their post/annotation writes ride the same bus cost as the read.
    bus = TERMS.get("bus_720p_p50_ms")
    bal = TERMS.get("balance_step_ms")
    pre_h = TERMS.get("preprocess_host_default_ms")
    ac_h = TERMS.get("auto_calibrate_host_ms")
    if None not in (bus, bal, pre_h, ac_h):
        mb = 720 * 1280 * 3 / 1e6
        balance_total = bus + xfer_ms(mb) + bal + xfer_ms(mb)
        pre_total = bus + pre_h + bus  # read + stage stack + post write
        ac_total = bus + ac_h  # read + control loop (annotation included)
        emit(
            "derived_pcie_p50_ms_config4_chain",
            round(max(balance_total, pre_total, ac_total), 2),
            "ms",
            balance_ms=round(balance_total, 2),
            balance_legs={
                "bus_ms": round(bus, 3),
                "h2d_ms": round(xfer_ms(mb), 3),
                "step_ms": round(bal, 3),
                "fetch_ms": round(xfer_ms(mb), 3),
            },
            preprocess_ms=round(pre_total, 2),
            preprocess_legs={
                "bus_read_ms": round(bus, 3),
                "host_stages_default_ms": round(pre_h, 4),
                "post_write_ms": round(bus, 3),
            },
            auto_calibrate_ms=round(ac_total, 2),
            auto_calibrate_legs={
                "bus_read_ms": round(bus, 3),
                "host_control_loop_ms": round(ac_h, 3),
            },
            link_model=link,
            note=(
                "config 4 chain = three parallel consumers of one source; "
                "chain p50 = max of the three per-module budgets; every "
                "leg measured this run except the link-model transfers"
            ),
        )

    derive(
        "derived_pcie_p50_ms_config5_yolo",
        "bus_720p_p50_ms",
        720 * 1280 * 3 / 1e6,
        "yolo_step_ms",
        0.005,  # fixed-shape decode dict (max_det rows)
        TERMS.get("yolo_host_ms"),
        "720p frame up, decode dict back, summarize+tracker+6 OBB handlers on host; p50-of-sum approximated by sum of leg p50s (legs are independent and low-variance on PCIe)",
    )


def sift_pose_leg_bench() -> None:
    """Config 3's optional SIFT pose flow, decomposed term by term: host
    keypoint detection (cv2 SIFT — the same detector the reference uses,
    reference utils/sift.py:14-30), the MXU descriptor-match step, the
    ratio-test epilogue, the batched minimal-set solve, and the consensus
    score step — then a COMPUTED per-frame pose cost on a PCIe-class host
    (config 3's measured e2e number is tunnel-RTT bound). Runs LAST in the
    derived step: a timeout here can only lose the pose line."""
    import jax
    import jax.numpy as jnp

    from cuauv_vision_pipeline_tpu.capture_sources.synthetic import (
        bin_texture,
        bins_frame,
    )
    from cuauv_vision_pipeline_tpu.ops.color_np import bgr_to_gray_np
    from cuauv_vision_pipeline_tpu.utils import sift as S

    scene = bgr_to_gray_np(bins_frame((720, 1280), 0.3))
    template = bgr_to_gray_np(np.asarray(bin_texture()))
    # detector pinned to cv2: this section is the REFERENCE-PARITY line;
    # an exported CUAUV_SIFT_DETECTOR=device must not silently swap the
    # 236 ms host leg for the ~1 ms device one
    sift = S.SIFT(detector="cv2")
    kp_t, _ = sift.add_source("bin", template)

    # host leg: scene keypoint detect+describe (pure host, every frame)
    kp_s, des_s = S.detect_and_compute(scene, method="cv2")  # warm
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        kp_s, des_s = S.detect_and_compute(scene, method="cv2")
    TERMS["sift_detect_ms"] = (time.perf_counter() - t0) / N * 1000

    # real padded shapes (template query is device-resident: add_source
    # pins it once, so NO per-frame upload for the template side)
    q_dev, nq = sift.sources["bin"]["des_prep"]
    nt = len(des_s)
    t_dev, _ = S.prepare_descriptors(des_s, "train")
    jax.block_until_ready((q_dev, t_dev))

    # device leg: descriptor-match step (dependence-chained inside ONE jit
    # so the tunnel RTT cannot enter the per-iteration time)
    K = 50

    @jax.jit
    def match_chain(q, t):
        def body(c, _):
            d2, _ = S._distance_topk(q + c, t)
            return d2[0, 0] * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    jax.block_until_ready(match_chain(q_dev, t_dev))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(match_chain(q_dev, t_dev))
    TERMS["sift_match_step_ms"] = (time.perf_counter() - t0) / K * 1000

    # ratio-test epilogue on host (numpy over the fetched top-2 buffers)
    d2_dev, idx_dev = S._distance_topk(q_dev, t_dev)
    d2_np, idx_np = np.asarray(d2_dev), np.asarray(idx_dev)

    def epilogue():
        d = np.sqrt(d2_np[:nq])
        ix = idx_np[:nq]
        good = d[:, 0] < 0.7 * d[:, 1]
        return [
            (int(i), int(ix[i, 0]), float(d[i, 0]))
            for i in np.nonzero(good)[0]
        ]

    good = epilogue()
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        epilogue()
    TERMS["sift_ratio_host_ms"] = (time.perf_counter() - t0) / N * 1000

    if len(good) < 8:
        log(f"sift pose legs: only {len(good)} matches on the bins scene; "
            "skipping the pose derivation")
        return
    src_pts = np.asarray([kp_t[a] for a, _, _ in good], np.float64)
    dst_pts = np.asarray([kp_s[b] for _, b, _ in good], np.float64)

    # host leg: batched minimal-set solve + inlier refit
    cands = S.solve_minimal_sets(src_pts, dst_pts, 256, 0)  # warm
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        cands = S.solve_minimal_sets(src_pts, dst_pts, 256, 0)
    solve_ms = (time.perf_counter() - t0) / N * 1000
    H_full, mask = S.ransac_homography(src_pts, dst_pts)
    refit_ms = 0.0
    if H_full is not None and mask.sum() >= 4:
        t0 = time.perf_counter()
        for _ in range(N):
            S._refit(src_pts[mask], dst_pts[mask])
        refit_ms = (time.perf_counter() - t0) / N * 1000
    TERMS["sift_solve_host_ms"] = solve_ms + refit_ms

    # device leg: consensus score step (dependence-chained)
    if len(cands) == 0:  # all minimal sets degenerate (collinear matches)
        log("sift pose legs: zero usable RANSAC candidates; "
            "skipping the score step + derivation")
        return
    Hs = np.asarray(cands[:256], np.float32)
    if len(Hs) < 256:
        Hs = np.concatenate([Hs, np.repeat(Hs[-1:], 256 - len(Hs), axis=0)])
    n = len(src_pts)
    nb = S._next_pow2(n)
    s_buf = np.ones((nb, 3), np.float32)
    s_buf[:n, :2] = src_pts
    d_buf = np.full((nb, 2), 1.0e9, np.float32)
    d_buf[:n] = dst_pts
    Hs_d, s_d, d_d = (jax.device_put(a) for a in (Hs, s_buf, d_buf))

    @jax.jit
    def score_chain(Hs, s, d):
        def body(c, _):
            m = S._ransac_score(Hs, s + c, d, jnp.float32(5.0))
            return jnp.sum(m).astype(jnp.float32) * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    jax.block_until_ready(score_chain(Hs_d, s_d, d_d))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(score_chain(Hs_d, s_d, d_d))
    TERMS["sift_score_step_ms"] = (time.perf_counter() - t0) / K * 1000

    def xfer(mb: float) -> float:
        return PCIE_OH_MS + mb / (PCIE_GBPS * 1000.0)

    gray_mb = 720 * 1280 / 1e6  # gray frame rides config 3's packed fetch
    desc_mb = t_dev.nbytes / 1e6  # scene descriptors up (template cached)
    topk_mb = q_dev.shape[0] * 2 * 8 / 1e6  # d2 f32 + idx i32 back
    ransac_up_mb = (Hs.nbytes + s_buf.nbytes + d_buf.nbytes) / 1e6
    mask_mb = nb / 1e6
    total = (
        xfer(gray_mb)
        + TERMS["sift_detect_ms"]
        + xfer(desc_mb)
        + TERMS["sift_match_step_ms"]
        + xfer(topk_mb)
        + TERMS["sift_ratio_host_ms"]
        + TERMS["sift_solve_host_ms"]
        + xfer(ransac_up_mb)
        + TERMS["sift_score_step_ms"]
        + xfer(mask_mb)
        + TERMS.get("shm_set_ms", 0.0)
    )
    emit(
        "derived_pcie_p50_ms_config3_pose",
        round(total, 2),
        "ms",
        detect_host_ms=round(TERMS["sift_detect_ms"], 3),
        match_step_ms=round(TERMS["sift_match_step_ms"], 4),
        ratio_host_ms=round(TERMS["sift_ratio_host_ms"], 4),
        solve_host_ms=round(TERMS["sift_solve_host_ms"], 3),
        score_step_ms=round(TERMS["sift_score_step_ms"], 4),
        xfer_ms=round(
            xfer(gray_mb) + xfer(desc_mb) + xfer(topk_mb)
            + xfer(ransac_up_mb) + xfer(mask_mb),
            3,
        ),
        matches=len(good),
        n_keypoints=int(nt),
        link_model=(
            f"pcie-class link model: {PCIE_GBPS} GB/s effective + "
            f"{PCIE_OH_MS} ms/transfer"
        ),
        note=(
            "config 3's optional pose flow per frame: gray fetch + cv2 SIFT "
            "detect (host, reference's own detector) + MXU 2-NN match + "
            "ratio test + batched DLT solve + consensus score; template "
            "descriptors are device-resident (no per-frame upload)"
        ),
    )

    # --- device-detector mode (the bins module DEFAULT): detect + describe
    # + template 2-NN all inside one traced graph (ops/feature.
    # detect_describe + utils/sift.device_match_topk) — the cv2 host
    # detect leg disappears and only keypoints + top-2 buffers (~6 KB,
    # riding the module's existing packed fetch) cross the link.
    from cuauv_vision_pipeline_tpu.ops.feature import detect_describe
    from cuauv_vision_pipeline_tpu.utils.sift import device_match_topk

    sift_dev = S.SIFT(detector="device")
    sift_dev.add_source("bin", template)
    prep = sift_dev.sources["bin"]["des_prep"]
    g32 = jax.device_put(scene.astype(np.float32))

    @jax.jit
    def pose_chain(g):
        def body(c, _):
            _, des, n = detect_describe(g + c, 512)
            d2, _ = device_match_topk(prep, des, n)
            return d2[0, 0] * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    jax.block_until_ready(pose_chain(g32))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(pose_chain(g32))
    TERMS["sift_pose_chain_step_ms"] = (time.perf_counter() - t0) / K * 1000

    # the device-mode match actually recovers the pose (sanity, not timing)
    from cuauv_vision_pipeline_tpu.ops.feature import detect_describe_jit

    kp_d, des_d, n_d = detect_describe_jit(jnp.asarray(scene), 512)
    d2_d, idx_d = device_match_topk(prep, des_d, n_d)
    res_dev = sift_dev.match_device_topk(
        "bin", np.asarray(d2_d), np.asarray(idx_d), np.asarray(kp_d),
        min_match=8,
    )
    dev_inliers = res_dev[0]["inliers"] if res_dev else 0

    fetch_mb = (512 * 2 * 4 + prep[0].shape[0] * 2 * 8) / 1e6
    total_dev = (
        TERMS["sift_pose_chain_step_ms"]
        + xfer(fetch_mb)
        + TERMS["sift_ratio_host_ms"]
        + TERMS["sift_solve_host_ms"]
        + xfer(ransac_up_mb)
        + TERMS["sift_score_step_ms"]
        + xfer(mask_mb)
        + TERMS.get("shm_set_ms", 0.0)
    )
    emit(
        "derived_pcie_p50_ms_config3_pose_device",
        round(total_dev, 2),
        "ms",
        chain_step_ms=round(TERMS["sift_pose_chain_step_ms"], 4),
        ratio_host_ms=round(TERMS["sift_ratio_host_ms"], 4),
        solve_host_ms=round(TERMS["sift_solve_host_ms"], 3),
        score_step_ms=round(TERMS["sift_score_step_ms"], 4),
        inliers=int(dev_inliers),
        vs_cv2_detect_ms=round(TERMS["sift_detect_ms"], 1),
        link_model=(
            f"pcie-class link model: {PCIE_GBPS} GB/s effective + "
            f"{PCIE_OH_MS} ms/transfer"
        ),
        note=(
            "bins module default pose flow: detect+describe+template-match "
            "in the SAME dispatch as the mask chain (kp + top-2 buffers "
            "ride the existing packed fetch); host work is ratio test + "
            "RANSAC. The cv2-detect line above is the reference-parity "
            "mode (CUAUV_SIFT_DETECTOR=cv2)."
        ),
    )


# ---------------------------------------------------------------------------
# topology configs (capture process -> bus -> module process -> shm)
# ---------------------------------------------------------------------------


def config1_red_buoy_e2e() -> None:
    """BASELINE config 1: red_buoy on the production 4-plane zed layout,
    1080p, capture process -> bus -> module process (performance mode,
    @device_fn fast path) -> shm.red_buoy_results."""
    from cuauv_vision_pipeline_tpu.core import shm

    clean_shm()
    src = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "zed",
            "--scene",
            "zed",
            "--fps",
            "60",
            "--precompute",
            "8",
        ],
        "c1_src",
    )
    mod = spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.red_buoy",
            "zed",
            "--fps",
            "1000",
            "--enable-performance",
        ],
        "c1_mod",
    )
    try:
        grp = shm.red_buoy_results
        wait_counter(lambda: grp.seq, WARM_S, "red_buoy results")
        fps, lats, newest = measure_cfg(
            lambda: grp.seq,
            lambda: grp.latency_ms.get(),
            sample_latency2=lambda: grp.latency_newest_ms.get(),
        )
        emit(
            "red_buoy_1080p_e2e_topology_fps",
            round(fps, 2),
            "frames/sec",
            p50_latency_ms=round(p50(lats), 1),
            p50_latency_newest_lane_ms=round(p50(newest), 1),
            note="capture proc -> bus -> module proc (device_fn, perf mode); tunnel-attached chip. all-lane latency counts drained stale lanes; newest-lane is the latest-wins-comparable number",
        )
    finally:
        stop(mod, src)


def config2_gate_video() -> None:
    """BASELINE config 2: gate localization on RECORDED VIDEO through the
    system's OWN record->replay loop, with detections from the REAL yolo
    module serving the in-repo gate checkpoint (no synthesized stand-ins).

    Leg A (record): synthetic gate scene -> bus -> modules.record
    RecordMono (mission active) -> mp4. Leg B (replay, the measured leg):
    capture_sources/video.py replays that mp4 -> modules.yolo with the
    gate-trained checkpoint (shark/saw detections bucket into the GateOBB
    handler) -> shm.yolo_gate + posts. Ref: reference
    modules/record.py:101-133, capture_sources/video.py:9-56,
    modules/yolo.py:101-165, handlers/gate.py:51-163."""
    import glob as _glob
    import tempfile

    from cuauv_vision_pipeline_tpu.core import shm

    clean_shm()
    d = tempfile.mkdtemp(prefix="bench_gate_rec_")
    # --- leg A: record the gate scene through the bus ---
    shm.active_mission.log_path.set(d)
    shm.active_mission.active.set(True)
    src = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "gatecam",
            "--scene",
            "gate",
            "--width",
            "1280",
            "--height",
            "720",
            "--fps",
            "30",
        ],
        "c2_recsrc",
    )
    rec = spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.record",
            "--mono",
            "gatecam",
            "--fps",
            "30",
        ],
        "c2_rec",
    )
    try:
        deadline = time.monotonic() + 90
        clip = None
        while time.monotonic() < deadline:
            hits = _glob.glob(os.path.join(d, "record-mono-*.mp4"))
            if hits and os.path.getsize(hits[0]) > 200_000:
                clip = hits[0]
                break
            time.sleep(0.5)
        # mission off -> recorder releases the writer (finalizes the moov
        # atom); give it a moment before replay opens the file
        shm.active_mission.active.set(False)
        time.sleep(2.0)
    finally:
        stop(rec, src)
    if clip is None:
        raise RuntimeError(f"record leg produced no playable mp4 in {d}")

    # --- leg B: replay the recording into the real yolo->gate path ---
    clean_shm()
    src = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.video",
            f"{clip}:gatecam",
            "--loop",
        ],
        "c2_src",
    )
    weight = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests",
        "fixtures",
        "gate_pico_detect.msgpack",
    )
    mod = spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.yolo",
            "gatecam",
            "--fps",
            "1000",
        ],
        "c2_mod",
        env={"CUAUV_YOLO_WEIGHT": weight},
    )
    try:
        grp = shm.yolo_gate
        watch = PostWatch("Yolo", WARM_S)
        wait_counter(lambda: shm.yolo_status.seq, WARM_S, "gate detections")
        fps, lats = measure_cfg(
            lambda: shm.yolo_status.seq,
            lambda: shm.yolo_status.latency_ms.get(),
        )
        gate_writes, _ = measure_counter(lambda: grp.seq, seconds=4)
        g = grp.get()
        watch.close()
        emit(
            "gate_localization_720p_e2e_fps",
            round(fps, 2),
            "frames/sec",
            p50_latency_ms=round(p50(lats), 1),
            shm_gate_writes_per_s=round(gate_writes, 2),
            shark_visible=bool(g.shark_visible),
            saw_visible=bool(g.saw_visible),
            shark_confidence=round(float(g.shark_confidence), 3),
            saw_confidence=round(float(g.saw_confidence), 3),
            recorded_clip_bytes=os.path.getsize(clip),
            note=(
                "record->replay loop: gate scene recorded to mp4 by "
                "modules.record (mission-gated), replayed by capture_"
                "sources/video.py into the REAL yolo module (in-repo "
                "gate checkpoint; shark/saw -> GateOBB handler: "
                "order_points, gating, normalize, shm.yolo_gate, draw)"
            ),
        )
    finally:
        stop(mod, src)


def config3_bins() -> None:
    """BASELINE config 3: bins module — HSV chain + minAreaRect + SIFT
    pose estimation (utils/feature + utils/sift) on the textured bins
    scene."""
    from cuauv_vision_pipeline_tpu.core import shm

    clean_shm()
    src = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "binscam",
            "--scene",
            "bins",
            "--width",
            "1280",
            "--height",
            "720",
            "--fps",
            "60",
            "--precompute",
            "8",
        ],
        "c3_src",
    )
    mod = spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.bins",
            "binscam",
            "--fps",
            "1000",
        ],
        "c3_mod",
        env={"CUAUV_BINS_POSE_TEMPLATE": "builtin"},
    )
    try:
        grp = shm.bins_pose
        watch = PostWatch("BinDetector", WARM_S)
        wait_counter(watch.uid, 60, "bins posts")
        fps, lats = measure_cfg(watch.uid, watch.sample_latency_ms)
        pose_fps, pose_lats = measure_counter(
            lambda: grp.seq,
            lambda: grp.latency_ms.get(),
            seconds=min(MEASURE_S, 8),
        )
        g = grp.get()
        watch.close()
        emit(
            "bins_sift_720p_e2e_fps",
            round(fps, 2),
            "frames/sec",
            p50_latency_ms=round(p50(lats), 1),
            pose_results_per_s=round(pose_fps, 2),
            pose_visible=bool(g.visible),
            pose_inliers=int(g.inliers),
            pose_p50_latency_ms=round(p50(pose_lats), 1),
            note="bins scene -> bins module (HSV device chain + host rect pose + SIFT template match on MXU) -> shm.bins_pose + post",
        )
    finally:
        stop(mod, src)


def config4_preprocess_chain() -> None:
    """BASELINE config 4: preprocessor + color_balance + auto_calibrate
    correction chain, all three consuming the same source."""
    clean_shm()
    src = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "precam",
            "--width",
            "1280",
            "--height",
            "720",
            "--fps",
            "30",
            "--precompute",
            "8",
        ],
        "c4_src",
    )
    pre = spawn(
        ["cuauv_vision_pipeline_tpu.modules.preprocessor", "precam"],
        "c4_pre",
    )
    cb = spawn(
        ["cuauv_vision_pipeline_tpu.modules.color_balance", "precam"],
        "c4_cb",
    )
    ac = spawn(
        ["cuauv_vision_pipeline_tpu.modules.auto_calibrate", "precam"],
        "c4_ac",
    )
    try:
        w_pre = PostWatch("Preprocessor", WARM_S)
        w_cb = PostWatch("ColorBalance", WARM_S)
        wait_counter(w_pre.uid, 60, "preprocessor posts")
        wait_counter(w_cb.uid, 60, "color_balance posts")
        fps_pre, lats = measure_cfg(w_pre.uid, w_pre.sample_latency_ms)
        fps_cb, _ = measure_counter(w_cb.uid, seconds=min(MEASURE_S, 6))
        w_pre.close()
        w_cb.close()
        ac_alive = ac.poll() is None
        emit(
            "preprocess_chain_720p_e2e_fps",
            round(min(fps_pre, fps_cb), 2),
            "frames/sec",
            p50_latency_ms=round(p50(lats), 1),
            preprocessor_fps=round(fps_pre, 2),
            color_balance_fps=round(fps_cb, 2),
            auto_calibrate_alive=ac_alive,
            note="three correction modules on one bus source",
        )
    finally:
        stop(ac, cb, pre, src)


def config5_yolo_latency() -> None:
    """BASELINE config 5: yolo + all six OBB handlers, concurrent ZED-stereo
    + FLIR stand-ins. Headline: p50 camera-to-detection latency."""
    from cuauv_vision_pipeline_tpu.core import shm

    clean_shm()
    zed = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "zed",
            "--scene",
            "zed",
            "--width",
            "1280",
            "--height",
            "720",
            "--fps",
            "15",
            "--precompute",
            "4",
        ],
        "c5_zed",
    )
    flir = spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "flir",
            "--width",
            "800",
            "--height",
            "600",
            "--fps",
            "10",
        ],
        "c5_flir",
    )
    mod = spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.yolo",
            "zed",
            "flir",
            "--fps",
            "1000",
        ],
        "c5_mod",
    )
    try:
        grp = shm.yolo_status
        wait_counter(lambda: grp.seq, WARM_S, "yolo detections")
        fps, lats = measure_cfg(
            lambda: grp.seq,
            lambda: grp.latency_ms.get(),
            seconds=max(MEASURE_S, 15),
        )
        emit(
            "yolo_p50_camera_to_detection_ms",
            round(p50(lats), 1),
            "ms",
            fps=round(fps, 2),
            n_samples=len(lats),
            target_ms=5.0,
            derived_pcie_p50_ms=next(
                (
                    r["value"]
                    for r in RESULTS
                    if r["metric"] == "derived_pcie_p50_ms_config5_yolo"
                ),
                None,
            ),
            note="concurrent zed-stereo + flir stand-ins -> yolo (6 OBB handlers); tunnel-attached chip (measured number is tunnel RTT-dominated; see derived_pcie_p50_ms_config5_yolo)",
        )
    finally:
        stop(mod, flir, zed)


def config5b_yolo_batch_throughput() -> None:
    """Config 5 under SATURATION with queue-depth batching: the zed
    stand-in runs at 30 fps (far above what one-dispatch-per-frame can
    drain on this link) and the yolo module runs CUAUV_YOLO_BATCH=8, so
    each tick drains up to 8 queued frames into ONE 8-batch conv stack.
    yolo_status.seq advances once per LANE, so its rate is true e2e
    frames/sec. The amortization factor compares against a batch=1 run
    under the SAME single-zed 30 fps saturated topology measured first in
    this step (ADVICE r3: config 5's latency-mode zed+flir number is a
    different offered load and conflated batching gain with topology).
    Mean drain depth is frames/dispatches over the window — two counters
    the module bumps per-lane and per-dispatch respectively — not a mean
    of per-lane `lanes` samples, which is lane-count weighted (ADVICE r3).
    The latency samples mix lanes (oldest lanes carry queueing delay by
    design — that is the throughput trade; latest-wins is the
    CUAUV_YOLO_LATEST_ONLY knob)."""
    from cuauv_vision_pipeline_tpu.core import shm

    def one_run(batch: int, tag: str, window_s: float):
        clean_shm()
        zed = spawn(
            [
                "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
                "zed",
                "--scene",
                "zed",
                "--width",
                "1280",
                "--height",
                "720",
                "--fps",
                "30",
                "--precompute",
                "4",
            ],
            f"{tag}_zed",
        )
        mod = spawn(
            [
                "cuauv_vision_pipeline_tpu.modules.yolo",
                "zed",
                "--fps",
                "1000",
            ],
            f"{tag}_mod",
            env={"CUAUV_YOLO_BATCH": str(batch)},
        )
        try:
            grp = shm.yolo_status
            # min_advance=80: the module pre-compiles one trace per
            # fresh-lane count (1..batch) after its first dispatch; a
            # handful of early lane deliveries does NOT mean the batched
            # flow is warm (a 3-advance gate once opened the window
            # mid-compile and measured 0.2 fps)
            wait_counter(
                lambda: grp.seq,
                WARM_S,
                f"yolo batch={batch} detections",
                min_advance=80 if batch > 1 else 20,
            )
            d0 = int(grp.dispatches.get())
            fps, lats = measure_counter(
                lambda: grp.seq,
                lambda: grp.latency_ms.get(),
                seconds=window_s,
            )
            d1 = int(grp.dispatches.get())
            f1 = int(grp.seq)
            return (
                fps,
                lats,
                d1 - d0,
                float(grp.latency_newest_ms.get()),
                f1,
            )
        finally:
            stop(mod, zed)

    # batch=1 baseline FIRST under identical saturation (shorter window —
    # it only anchors the ratio; its own number is config 5's job)
    fps1, _, _, _, _ = one_run(1, "c5b1", min(MEASURE_S, 10))
    fps, lats, dispatches, newest_ms, _ = one_run(
        8, "c5b", max(MEASURE_S, 15)
    )
    frames_in_window = len(lats)  # seq advances sampled; exact is below
    emit(
        "yolo_e2e_batch8_fps",
        round(fps, 2),
        "frames/sec",
        p50_latency_ms=round(p50(lats), 1),
        n_samples=frames_in_window,
        mean_lanes_per_dispatch=(
            round(fps * max(MEASURE_S, 15) / dispatches, 2)
            if dispatches > 0
            else None
        ),
        latency_newest_ms=round(newest_ms, 1),
        batch1_saturated_fps=round(fps1, 2),
        amortization_x=(round(fps / fps1, 2) if fps1 > 0 else None),
        note=(
            "30 fps zed stand-in -> yolo CUAUV_YOLO_BATCH=8 (up to 8 "
            "queued frames per 8-batch conv stack); seq counts lanes = "
            "true e2e frames/sec. batch1_saturated_fps is a CUAUV_YOLO_"
            "BATCH=1 run under the SAME single-zed 30 fps saturation, "
            "measured first in this step — the apples-to-apples "
            "amortization anchor. mean_lanes_per_dispatch = lane-frames / "
            "dispatch counter over the window (exact, unweighted). "
            "Latency mixes lanes (queueing delay is the deliberate "
            "trade; CUAUV_YOLO_LATEST_ONLY restores latest-wins). On a "
            "slow tunnel the per-tick cost is H2D-byte-bound, capping "
            "amortization below K; on PCIe H2D is sub-ms and the round "
            "trip being amortized is latency, not bytes"
        ),
    )


def _emit_degraded(fallback, name: str, err: Exception) -> None:
    """A config that timed out, died, or was budget-skipped must still
    leave a USEFUL metric line (round-3 verdict: a StepTimeout emitted
    NOTHING; round-4 verdict: the 0.0 fallback then OVERWROTE committed
    measurements). Resolution order:

    1. a good line from an earlier pass of this run -> re-print it;
    2. the last committed sweep's value -> re-emit marked ``stale: true``
       (committed measurements are never clobbered by a timeout), with
       this run's failure evidence attached under ``this_run``;
    3. nothing anywhere -> a zero line marked degraded.

    Every fallback carries the last observed warm-up progress AND the
    tail of each spawned process's log — on the driver's environment the
    artifact IS the debugger."""
    metric, unit = fallback
    prior = next(
        (
            r
            for r in RESULTS
            if r.get("metric") == metric
            and not r.get("degraded")
            and not r.get("stale")
        ),
        None,
    )
    if prior is not None:
        print(json.dumps(prior), flush=True)
        return
    evidence = dict(
        error=f"{type(err).__name__}: {err}",
        progress=dict(LAST_PROGRESS),
        module_log_tail=_log_tails(),
    )
    committed = next(
        (
            r
            for r in _last_committed_sweep(mark_stale=False)
            if r.get("metric") == metric
        ),
        None,
    )
    # fallback lines go to STDOUT ONLY — writing them through emit()
    # would clobber the last committed GOOD value in BENCH_RESULTS.json
    # (and stale/degraded rows are excluded from future fallbacks by
    # design, so the provenance chain would end). The file keeps the best
    # known measurement; the tail carries this run's explanation.
    if committed is not None:
        line = dict(committed)
        line.update(
            stale=True,
            stale_note=(
                f"{name} did not complete this run; value re-emitted "
                "verbatim from the last committed healthy sweep "
                "(this_run records how far this run got)"
            ),
            this_run=evidence,
        )
        if QUICK:
            line["pass"] = "quick"
        print(json.dumps(line), flush=True)
        return
    line = dict(
        metric=metric,
        value=0.0,
        unit=unit,
        degraded=True,
        note=(
            f"{name} did not complete a measurement window and no "
            "committed value exists; progress records the last observed "
            "warm-up/measure state before the cap fired"
        ),
        **evidence,
    )
    if QUICK:
        line["pass"] = "quick"
    print(json.dumps(line), flush=True)


def _last_committed_sweep(mark_stale: bool = True) -> list:
    """Last-known-good metrics from the committed BENCH_RESULTS.json,
    marked ``stale: true`` unless the caller annotates them itself.
    Prefers the HEAD-committed file (the working file can carry junk from
    CPU smoke runs); falls back to the working file outside a git
    checkout. Abort markers, degraded zero-lines, and already-stale lines
    are dropped — stale/degraded provenance must never chain."""
    root = os.path.dirname(os.path.abspath(__file__))
    raw = None
    try:
        raw = subprocess.run(
            ["git", "show", "HEAD:BENCH_RESULTS.json"],
            cwd=root,
            timeout=30,
            check=True,
            capture_output=True,
        ).stdout
    except Exception:
        try:
            with open(os.path.join(root, "BENCH_RESULTS.json"), "rb") as f:
                raw = f.read()
        except OSError:
            return []
    try:
        rows = json.loads(raw)
    except ValueError:
        return []
    out = []
    for r in rows:
        if not isinstance(r, dict) or "metric" not in r:
            continue
        if r["metric"] == "bench_aborted_device_backend_unreachable":
            continue
        if r.get("stale") or r.get("degraded"):
            continue
        r = dict(r)
        if mark_stale:
            r["stale"] = True
            r["stale_note"] = (
                "transport wedged this run; value re-emitted verbatim from "
                "the last committed healthy sweep (see "
                "bench_aborted_device_backend_unreachable)"
            )
        out.append(r)
    return out


def main() -> None:
    from cuauv_vision_pipeline_tpu.core.jaxconfig import (
        apply_env_platform,
        ensure_compile_cache,
    )

    # an explicit JAX_PLATFORMS (e.g. cpu smoke runs) must win over the
    # device plugin's import-time override — env alone is ignored, and the
    # plugin's backend init can block forever on a wedged transport
    apply_env_platform()
    ensure_compile_cache()

    if not _backend_alive():
        # a wedged transport must still produce a parseable, explanatory
        # run: re-emit the last committed healthy sweep (every line clearly
        # marked stale) so the driver's capture keeps the flagship number,
        # measure fresh the steps that never touch the device, then emit
        # the diagnostic (rc stays 0; drivers parse the tail)
        stale = _last_committed_sweep()
        headline_stale = next(
            (
                r
                for r in stale
                if r.get("metric") == "red_buoy_1080p_device_chain_fps_per_chip"
            ),
            None,
        )
        if headline_stale is not None:
            print(json.dumps(headline_stale), flush=True)
        try:
            bus_roundtrip_bench()
            host_leg_bench()
        except Exception as e:
            log(f"host-only benches FAILED: {type(e).__name__}: {e}")
        fresh = {r["metric"] for r in RESULTS}
        for r in stale:
            if r.get("metric") not in fresh and r is not headline_stale:
                print(json.dumps(r), flush=True)
        emit(
            "bench_aborted_device_backend_unreachable",
            1,
            "bool",
            note=(
                "backend init (jax.devices()) did not return within 240 s "
                "in a probe subprocess — the remote transport is wedged; "
                "device benches skipped (their deadlines cannot interrupt "
                "a blocked backend-init C call). Host-only benches are "
                "fresh; every line carrying stale=true is re-emitted "
                "verbatim from the last committed healthy sweep."
            ),
        )
        if headline_stale is not None:
            print(json.dumps(headline_stale), flush=True)
        return

    # healthy backend: scrub a stale abort marker from a previous wedged
    # run — the merge in emit() only replaces re-emitted metric names, so
    # nothing else would ever clear it
    try:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULTS.json"
        )
        with open(path) as f:
            existing = json.load(f)
        cleaned = [
            r for r in existing
            if r.get("metric") != "bench_aborted_device_backend_unreachable"
        ]
        if len(cleaned) != len(existing):
            with open(path, "w") as f:
                json.dump(cleaned, f, indent=1)
    except (OSError, ValueError):
        pass

    # order (round-3 verdict): headline FIRST, then the QUICK pass over
    # all five topology configs (short settle, adaptive stable windows,
    # lines marked pass:"quick") so the driver tail holds a number for
    # every flagship metric early no matter where its kill lands. The
    # micro-benches + derived budgets come next, then the FULL pass
    # re-measures each config with the long windows — its module
    # subprocesses load every chain executable from the persistent cache
    # the quick pass just populated, so full-pass warm-up is seconds.
    configs_meta = {
        "1": (
            "config 1: red_buoy e2e topology",
            config1_red_buoy_e2e,
            ("red_buoy_1080p_e2e_topology_fps", "frames/sec"),
        ),
        "5": (
            "config 5: yolo p50 latency",
            config5_yolo_latency,
            ("yolo_p50_camera_to_detection_ms", "ms"),
        ),
        "2": (
            "config 2: gate localization",
            config2_gate_video,
            ("gate_localization_720p_e2e_fps", "frames/sec"),
        ),
        "3": (
            "config 3: bins + sift pose",
            config3_bins,
            ("bins_sift_720p_e2e_fps", "frames/sec"),
        ),
        "4": (
            "config 4: preprocess chain",
            config4_preprocess_chain,
            ("preprocess_chain_720p_e2e_fps", "frames/sec"),
        ),
        "8": (
            "config 5b: yolo batch=8 saturated throughput",
            config5b_yolo_batch_throughput,
            ("yolo_e2e_batch8_fps", "frames/sec"),
        ),
    }
    steps = {
        # caps must survive a fully COLD persistent cache: each new graph
        # compiles through a remote helper (minutes) — and SIGALRM only
        # raises AFTER a blocked compile C-call returns, so a too-tight
        # cap kills the step right before its seconds-long measurement.
        "h": ("headline: device chain", headline_device_chain, 1200, None),
        "w": ("prewarm module chains", prewarm_module_chains, 1100, None),
        "s": ("stereo fan-in chain", stereo_fanin_bench, 500, None),
        "d": ("device chain steps", device_step_bench, 900, None),
        "t": ("H2D transfer", transfer_bench, 300, None),
        "b": ("bus roundtrip", bus_roundtrip_bench, 120, None),
        "y": ("yolo host path", yolo_host_path_bench, 620, None),
        "r": ("train step", train_step_bench, 500, None),
        "p": ("derived PCIe budgets", _derived_with_host_legs, 650, None),
        # v pays the process's FIRST device->host readback: an uncacheable
        # per-process remote transfer compile, measured 150-545 s on this
        # harness (BENCH_NOTES) — the cap must cover it
        "v": ("headline checksum verify", headline_verify, 650, None),
    }
    for k, (name, fn, fallback) in configs_meta.items():
        # full-pass caps: the 'w' prewarm + quick pass warmed the compile
        # cache, so the default CONFIG_CAP_S is generous; quick caps are
        # tight per-config values (QUICK_CAPS above).
        steps[k] = (name, fn, CONFIG_CAP_S, fallback)
        steps["q" + k] = (
            f"quick {name}",
            fn,
            QUICK_CAPS.get("q" + k, 300.0),
            fallback,
        )
    t_start = time.monotonic()
    global QUICK
    for key in CONFIGS:
        key = key.strip()
        name, fn, cap, fallback = steps.get(key, (None, None, 0, None))
        if fn is None:
            continue
        remaining = BUDGET_S - (time.monotonic() - t_start)
        if remaining < 30:
            log(f"--- {name} SKIPPED: over {BUDGET_S:.0f}s budget ---")
            # a budget-skipped config still leaves its fallback line
            # (stale re-emit of the last committed value) so the artifact
            # holds a number for every flagship metric no matter where
            # the budget ran out
            if fallback is not None:
                _emit_degraded(
                    fallback,
                    name,
                    StepTimeout(
                        f"{name}: skipped — {BUDGET_S:.0f}s budget exhausted"
                    ),
                )
            continue
        log(f"--- {name} (cap {min(cap, remaining):.0f}s) ---")
        QUICK = key.startswith("q")
        SPAWNED_LOGS.clear()  # log tails attach per-step evidence
        try:
            with hard_deadline(name, min(cap, remaining)):
                fn()
        except Exception as e:  # a failed step must not kill the rest
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            if fallback is not None:
                _emit_degraded(fallback, name, e)
        finally:
            QUICK = False
        # keep the headline as the MOST RECENT metric line on stdout after
        # every step: the driver records the last parsed JSON line of the
        # tail and its kill can land anywhere (r02's landed mid-sweep), so
        # a plain end-of-run re-print only helps if the run finishes.
        if _HEADLINE_LINE:
            print(json.dumps(_HEADLINE_LINE), flush=True)

    # re-print the headline as the LAST line (drivers parse the tail)
    if _HEADLINE_LINE:
        print(json.dumps(_HEADLINE_LINE), flush=True)
    else:
        log("WARNING: headline never ran")


def _derived_with_host_legs() -> None:
    host_leg_bench()
    derived_budget_bench()
    # last: its two jit compiles are the only way this step can run long,
    # and a deadline here must not cost the four config budgets above
    sift_pose_leg_bench()


if __name__ == "__main__":
    sys.exit(main())
