"""Env-gated stage timing for pipeline diagnosis.

``FLOODER_TIMING=1`` makes ``flood_complex`` and the Pallas engine print
one ``[flooder-timing] <stage>: <sec>`` line per internal stage to
stderr. The TPU analogue of the reference's ``--cuda-events`` per-kernel
timing (reference cli.py:94-97, 120-125), but at pipeline-stage
granularity: compile vs host-prep vs kernel time is indistinguishable
in a wall-clock number, and this is how the scale-tier gaps
(tpu_runs/session_20260819_081004_r5scale.log) get attributed.

Timing mode inserts ``block_until_ready`` fences so each stage's device
work is attributed to that stage; the fences themselves serialize
host/device overlap, so timed totals are a (slight) upper bound on the
untimed pipeline. When the env var is unset every helper is a no-op and
no fence is inserted.
"""

import os
import sys
import time
from contextlib import contextmanager

ENABLED = os.environ.get("FLOODER_TIMING", "").strip().lower() not in (
    "", "0", "false", "no", "off",
)


def note(msg: str) -> None:
    """Print a timing annotation (counts, shapes) when enabled."""
    if ENABLED:
        print(f"[flooder-timing] {msg}", file=sys.stderr, flush=True)


def fence(*arrays) -> None:
    """block_until_ready each array, only in timing mode."""
    if ENABLED:
        for a in arrays:
            try:
                a.block_until_ready()
            except AttributeError:
                pass


@contextmanager
def stage(name: str):
    """Time a pipeline stage (stderr, timing mode only)."""
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(
            f"[flooder-timing] {name}: {time.perf_counter() - t0:.3f}s",
            file=sys.stderr,
            flush=True,
        )
