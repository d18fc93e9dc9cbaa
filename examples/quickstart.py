#!/usr/bin/env python3
"""Quickstart: the whole pipeline in one script.

Launches a synthetic ZED-layout camera, the red_buoy detection module, and
the web viewer as separate OS processes (the production topology), tunes the
threshold live, prints detections, then shuts everything down.

    python examples/quickstart.py [--seconds 30] [--port 8080]

Open http://localhost:<port> while it runs to watch the debug posts.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spawn(*module_and_args: str) -> subprocess.Popen:
    return subprocess.Popen([sys.executable, "-m", *module_and_args])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=30.0)
    parser.add_argument("--port", type=int, default=8080)
    # 1080p is the chip-sized default; CPU-only hosts should pass
    # something like --width 480 --height 270 (a 1080p batch dispatch
    # takes minutes per frame on one CPU core)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    args = parser.parse_args()

    procs = [
        spawn(
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "zed", "--scene", "zed", "--fps", "10",
            "--width", str(args.width), "--height", str(args.height),
        ),
        spawn("cuauv_vision_pipeline_tpu.modules.red_buoy", "zed"),
        spawn(
            "cuauv_vision_pipeline_tpu.misc.web_viewer",
            "--port", str(args.port),
        ),
    ]
    print(f"pipeline up; GUI at http://localhost:{args.port}")
    print("(first TPU compile may take a minute on a cold cache)")

    try:
        from cuauv_vision_pipeline_tpu.core import shm
        from cuauv_vision_pipeline_tpu.core.base import ModuleReader

        tuned = False
        deadline = time.monotonic() + args.seconds
        while time.monotonic() < deadline:
            time.sleep(2)
            results = shm.red_buoy_results.get()
            print(
                f"red_buoy: visible={results.visible} "
                f"area={results.area:.0f} "
                f"center=({results.center_x:+.3f}, {results.center_y:+.3f})"
            )
            if not tuned and results.visible:
                # live-tune the threshold so only the red disc passes
                reader = None
                try:
                    reader = ModuleReader("BuoyLAB-on-zed")
                    reader.run_forever()
                    reader.update_tuner_value("thresh_min", 140)
                    tuned = True
                    print(">> tuned thresh_min=140 (isolating the buoy)")
                except (RuntimeError, KeyError) as e:
                    # retry next sample (a stale visible=True from a prior
                    # run can fire before the new module's blocks exist);
                    # say why instead of hiding it
                    print(f">> tuner attempt failed ({e!r}); will retry")
                finally:
                    # stop the poll thread even on a failed attempt —
                    # leaked readers accumulate threads + shm handles
                    if reader is not None and reader._thread is not None:
                        reader.unblock()
    finally:
        import signal

        for proc in procs:
            proc.send_signal(signal.SIGINT)
        for proc in procs:
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                # a mid-compile SIGINT can leave the runtime blocked in a
                # call that won't return; escalate instead of raising
                proc.kill()
                proc.wait()
        print("clean shutdown")


if __name__ == "__main__":
    main()
