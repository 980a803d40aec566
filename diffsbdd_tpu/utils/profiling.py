"""Profiling and timing utilities.

The reference only has coarse wall-clock timing (test.py:84,152-176,
lightning_modules.py:391-410).  Here the same reports exist plus real device
profiling: ``jax.profiler`` trace capture for TensorBoard/Perfetto and a
step timer that synchronizes on device completion.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir="profile", create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir),
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with device synchronization and running stats."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() called before start()")
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": 0.0, "std_s": 0.0, "min_s": 0.0, "n": 0}
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()), "std_s": float(arr.std()),
                "min_s": float(arr.min()), "n": len(arr)}


class PocketTimer:
    """Per-pocket wall-time bookkeeping with the reference's report format
    ('Time per pocket: mean \\pm std', test.py:174-176)."""

    def __init__(self):
        self.time_per_pocket: Dict[str, float] = {}
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, pocket_name: str) -> float:
        if self._t0 is None:
            raise RuntimeError("PocketTimer.stop() called before start()")
        dt = time.time() - self._t0
        self.time_per_pocket[str(pocket_name)] = dt
        return dt

    def write(self, path):
        with open(path, "w") as f:
            for k, v in self.time_per_pocket.items():
                f.write(f"{k} {v}\n")

    def report(self) -> str:
        times = np.array(list(self.time_per_pocket.values()))
        return (f"Time per pocket: {times.mean():.3f} \\pm "
                f"{times.std():.2f}")
