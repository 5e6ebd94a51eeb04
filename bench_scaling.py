"""Scaling-efficiency report: sharded bank scoring at 1..N devices.

BASELINE.json:5: "Report audio-seconds/s scaling efficiency at 1 chip,
1 host, and N hosts (N >= 2)".  This harness:

* initializes multi-host JAX if a pod environment is detected
  (``parallel.bootstrap.initialize_distributed``),
* runs ``parallel.sharded_bank_scores`` (or the frequency-domain
  fast path ``parallel.sharded_fft_bank_scores`` with
  SCALE_BACKEND=fft) on meshes of 1, 2, ..., all devices
  (bank-sharded by default; override axes via env),
* prints one JSON line per mesh size plus a final summary line with
  ``efficiency[n] = throughput[n] / (n * throughput[1])``.

On this dev box only one real TPU chip is visible, so real multi-chip
numbers require a pod; run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to exercise the logic on fake devices (numbers then measure CPU, not
TPU).  Env knobs: SCALE_B / SCALE_T / SCALE_K / SCALE_L, SCALE_AXIS
(bank | data | time), SCALE_BACKEND (conv | fft).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from template_speech_recognition_tpu.config import MeshConfig
    from template_speech_recognition_tpu.parallel import (
        build_mesh,
        sharded_bank_scores,
        sharded_fft_bank_scores,
    )
    from template_speech_recognition_tpu.parallel.bootstrap import (
        initialize_distributed,
    )

    initialize_distributed()

    b = int(os.environ.get("SCALE_B", 8))
    t = int(os.environ.get("SCALE_T", 2048))
    k = int(os.environ.get("SCALE_K", 1024))
    length = int(os.environ.get("SCALE_L", 32))
    axis = os.environ.get("SCALE_AXIS", "bank")
    backend = os.environ.get("SCALE_BACKEND", "conv")
    f, e = 64, 8
    hop_seconds = 0.010

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        (rng.random((b, t, f, e)) < 0.15).astype(np.float32), jnp.bfloat16
    )
    w = jnp.asarray(
        rng.standard_normal((k, length, f, e)).astype(np.float32), jnp.bfloat16
    )
    c = jnp.asarray(rng.standard_normal((k,)).astype(np.float32))
    if backend == "fft":
        from template_speech_recognition_tpu.detect.fft_scorer import (
            build_fft_bank,
        )

        fbank = build_fft_bank(w, c)

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    results = {}
    for n in sizes:
        cfg = {"data": 1, "bank": 1, "time": 1}
        cfg[axis] = n
        mesh = build_mesh(MeshConfig(**cfg), devices=jax.devices()[:n])

        def run():
            if backend == "fft":
                out = sharded_fft_bank_scores(feats, fbank, mesh)
            else:
                out = sharded_bank_scores(feats, w, c, mesh)
            return float(jnp.sum(out))  # forced readback completes the step

        run()  # compile + warmup
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        thr = b * t * hop_seconds / dt
        results[n] = thr
        print(json.dumps({
            "mesh_devices": n, "axis": axis, "backend": backend,
            "audio_s_per_s": round(thr, 1), "step_ms": round(dt * 1e3, 2),
        }))
    summary = {
        "metric": "scaling_efficiency_" + axis,
        "backend": backend,
        "devices": sizes,
        "audio_s_per_s": [round(results[n], 1) for n in sizes],
        "efficiency": [
            round(results[n] / (n * results[sizes[0]]), 3) for n in sizes
        ],
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(summary))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
