"""Profiling / timing harness.

The reference's only profiling hook is Lightning's AdvancedProfiler
(src/train_nerf.py:47-49,72-74). TPU equivalents here:

- `trace(logdir)`: context manager around jax.profiler for a TensorBoard
  trace of whatever runs inside.
- `Timer`: block_until_ready wall timing with warmup, for ad-hoc
  microbenchmarks.
- `summarize_trace(path)`: parse a written trace.json.gz and return the
  top device ops by total time (what we used to find the sampling-gather
  hotspot — see ops/sampling.py docstrings).
"""

from __future__ import annotations

import contextlib
import glob
import time
from typing import Callable, Dict, List, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


class Timer:
    """Median-of-n wall timing of a jitted callable (device-synchronized)."""

    def __init__(self, warmup: int = 1, repeats: int = 20):
        self.warmup = warmup
        self.repeats = repeats

    def time(self, fn: Callable, *args, **kwargs) -> float:
        out = None
        for _ in range(self.warmup):
            out = fn(*args, **kwargs)
        if out is not None:
            jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(self.repeats):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / self.repeats


def summarize_trace(trace_dir: str, top: int = 20) -> List[Tuple[str, float]]:
    """Top device ops by accumulated duration (ms) from a jax.profiler trace."""
    import collections
    import gzip
    import json

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(files[-1]))
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    durs: Dict[str, float] = collections.defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            durs[e["name"]] += e.get("dur", 0) / 1000.0
    return sorted(durs.items(), key=lambda kv: -kv[1])[:top]
