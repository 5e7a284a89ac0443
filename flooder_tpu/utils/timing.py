"""Step-level profiling, the TPU equivalent of the reference StepTimer.

The reference (cli.py:41-137) records wall clock, process CPU time, RSS
delta (psutil) and CUDA peak memory / event time per pipeline step. Here the
device-side metrics come from JAX: steps are fenced with
``jax.block_until_ready`` by the caller, peak device memory comes from
``jax.Device.memory_stats()`` and optional profiler traces from
``jax.profiler``.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax

try:
    import psutil
except Exception:  # pragma: no cover - psutil is optional
    psutil = None


@dataclass
class StepStats:
    name: str
    wall_s: float
    cpu_s: float
    ram_delta_mib: Optional[float]
    device_peak_mib: Optional[float]
    device_kind: Optional[str]


def _device_bytes_in_use(device: Optional[jax.Device]) -> Optional[int]:
    if device is None:
        return None
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if stats:
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
    # Fallback for platforms whose runtime exposes no allocator stats
    # (the axon TPU tunnel returns an empty dict): account the live
    # arrays resident on this device. This is bytes-in-use at call time
    # — a lower bound on the step's true peak — which still fills the
    # reference's populated "Device peak (MiB)" column (ref
    # cli.py:117-119) with a real number instead of a dash.
    try:
        total = 0
        for arr in jax.live_arrays():
            try:
                if device in arr.devices():
                    total += arr.nbytes // len(arr.devices())
            except Exception:
                continue
        return total
    except Exception:
        return None


class StepTimer:
    """Context manager timing one pipeline step.

    Args:
        name: Step label.
        device: jax.Device whose memory to track (None => no device stats).
        trace_dir: if set, wraps the step in a ``jax.profiler`` trace.
    """

    def __init__(
        self,
        name: str,
        device: Optional[jax.Device] = None,
        trace_dir: Optional[str] = None,
    ):
        self.name = name
        self.device = device
        self.trace_dir = trace_dir
        self._proc = psutil.Process(os.getpid()) if psutil else None
        self._ram_before = None
        self.stats: Optional[StepStats] = None

    def __enter__(self):
        self._t0_wall = time.perf_counter()
        self._t0_cpu = time.process_time()
        if self._proc:
            try:
                self._ram_before = self._proc.memory_info().rss
            except Exception:
                self._ram_before = None
        self._dev_before = _device_bytes_in_use(self.device)
        if self.trace_dir:
            jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.trace_dir:
            jax.profiler.stop_trace()
        wall = time.perf_counter() - self._t0_wall
        cpu = time.process_time() - self._t0_cpu

        ram_delta_mib = None
        if self._proc and self._ram_before is not None:
            try:
                ram_delta_mib = (
                    self._proc.memory_info().rss - self._ram_before
                ) / (1024**2)
            except Exception:
                ram_delta_mib = None

        dev_after = _device_bytes_in_use(self.device)
        # under the live-array fallback each probe is instantaneous
        # in-use, not a running peak: keep the larger endpoint
        if dev_after is not None and self._dev_before is not None:
            dev_after = max(dev_after, self._dev_before)
        device_peak_mib = dev_after / (1024**2) if dev_after is not None else None

        self.stats = StepStats(
            name=self.name,
            wall_s=wall,
            cpu_s=cpu,
            ram_delta_mib=ram_delta_mib,
            device_peak_mib=device_peak_mib,
            device_kind=self.device.platform if self.device else None,
        )
        return False
