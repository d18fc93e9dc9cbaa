"""Crash-robustness: SIGKILLed writers must not wedge the bus.

A writer killed mid-write leaves a slot's seqlock odd; a successor writer
must self-heal (re-odd, finish even) so readers keep getting consistent
frames. The reference's robust-mutex EOWNERDEAD path covered only the
blocking-wait lock (cmf.cpp:384-393); this covers the data protocol itself.
"""

import multiprocessing as mp
import os
import signal
import time

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
    BlockAccessor,
    ReadStatus,
)

SHAPE = (64, 96, 3)


def _writer_proc(direction, start_value):
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor

    with BlockAccessor(direction, int(np.prod(SHAPE))) as writer:
        i = start_value
        while True:  # runs until SIGKILLed / SIGTERMed
            i += 1
            writer.write_frame(i, np.full(SHAPE, i % 251, dtype=np.uint8))


@pytest.mark.slow
def test_writer_sigkill_mid_stream_then_recovery(unique_direction):
    ctx = mp.get_context("spawn")

    # keep the block alive across writer generations so the name persists
    with BlockAccessor(unique_direction, int(np.prod(SHAPE))) as anchor:
        with BlockAccessor(unique_direction) as reader:
            total_seen = 0
            last_t = 0
            for generation in range(4):
                proc = ctx.Process(
                    target=_writer_proc,
                    args=(unique_direction, generation * 1_000_000),
                )
                proc.start()
                deadline = time.monotonic() + 20
                seen = 0
                while time.monotonic() < deadline and seen < 25:
                    status, data, t = reader.read_frame()
                    if status == ReadStatus.SUCCESS:
                        # every read must be internally consistent
                        assert (data == data.flat[0]).all(), "torn frame"
                        assert data.flat[0] == t % 251
                        assert t > last_t
                        last_t = t
                        seen += 1
                assert seen >= 25, f"generation {generation}: bus wedged"
                total_seen += seen
                # SIGKILL mid-write: no cleanup, maximum violence
                os.kill(proc.pid, signal.SIGKILL)
                proc.join(timeout=10)
            assert total_seen >= 100
