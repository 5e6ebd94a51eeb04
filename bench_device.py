"""Device-time measurement via jax.profiler traces.

Wall-clock through the tunneled PJRT here is noisy (stalls of tens of
ms); the profiler's device timeline is not.  ``device_time_ms(fn,
*args)`` runs the jitted fn several times under a trace and returns the
median on-device duration of its top-level executable event.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile

import numpy as np


def _device_events(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    events = []
    for p in paths:
        with gzip.open(p) as f:
            tr = json.load(f)
        pids = {
            e["pid"]: e["args"].get("name")
            for e in tr.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and str(
                pids.get(e.get("pid"), "")
            ).startswith("/device:TPU"):
                events.append(e)
    return events


def device_time_ms(fn, *args, iters: int = 5, match: str = "jit") -> float:
    """Median on-device ms of fn(*args)'s top-level executable."""
    import jax

    jax.block_until_ready(fn(*args))  # compile outside the trace
    tmp = tempfile.mkdtemp(prefix="devtime_")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        jax.profiler.stop_trace()
        evs = _device_events(tmp)
        # top-level executable events: named jit_<...>(fingerprint)
        durs = [
            e["dur"]
            for e in evs
            if e.get("name", "").startswith(match) and "(" in e.get("name", "")
        ]
        if not durs:
            raise RuntimeError(
                f"no device events matching {match!r}; got "
                f"{sorted({e.get('name') for e in evs})[:20]}"
            )
        durs.sort()
        # drop the first (cold) if we have spares
        return float(np.median(durs)) / 1e3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def device_breakdown_ms(fn, *args, iters: int = 3):
    """{op_name: total_ms / iters} over one trace -- per-fusion view."""
    import jax

    jax.block_until_ready(fn(*args))
    tmp = tempfile.mkdtemp(prefix="devbrk_")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        jax.profiler.stop_trace()
        evs = _device_events(tmp)
        # keep leaf ops (skip the top-level jit_* envelope)
        out = {}
        for e in evs:
            name = e.get("name", "")
            if name.startswith("jit_") or name.startswith("jit("):
                continue
            out[name] = out.get(name, 0.0) + e["dur"] / 1e3
        return {k: v / iters for k, v in sorted(out.items(), key=lambda kv: -kv[1])}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
