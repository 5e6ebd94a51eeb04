"""Tunnel-floor microbenchmark (round-4 verdict, weak item 3 done-bar:
"a committed microbenchmark proving [which tunnel cost] binds").

Measures the three fixed costs every corpus-scan batch pays on the
axon-tunneled PJRT, separately:

  upload    host->device ``device_put`` bandwidth at several sizes
            (the corpus scan uploads every padded waveform batch);
  dispatch  round trip of dispatching a trivial jit (no data);
  fetch     device->host round trip of a tiny result (np.asarray).

Then states the implied corpus-scan ceiling: the soak corpus is
~3624 audio-s of 16 kHz f32 waveforms (~232 MB unpadded), so at the
measured upload bandwidth the scan cannot exceed
``audio_bytes_ceiling`` audio-s/s regardless of device speed --
the device step itself is ~90 ms of compute for the whole corpus
(BENCH e2e ~40k audio-s/s).

Writes TUNNEL_r05.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import _enable_compile_cache


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    out = {"round": 5}

    # -- upload bandwidth ---------------------------------------------
    uploads = {}
    for mb in (1, 8, 32, 64):
        n = mb * 1024 * 1024 // 4
        host = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        # warm
        a = jax.device_put(host)
        a.block_until_ready()
        times = []
        for i in range(5):
            host[i] = i  # defeat any caching by content
            t0 = time.perf_counter()
            a = jax.device_put(host)
            a.block_until_ready()
            times.append(time.perf_counter() - t0)
        dt = float(np.min(times))
        uploads[f"{mb}MB"] = {
            "s": round(dt, 4),
            "mb_per_s": round(mb / dt, 1),
        }
        print(f"[tunnel] upload {mb}MB: {mb/dt:.1f} MB/s",
              file=sys.stderr)
    out["upload"] = uploads
    bw = uploads["64MB"]["mb_per_s"] * 1e6

    # -- dispatch round trip ------------------------------------------
    x = jnp.zeros((8, 8), jnp.float32)

    @jax.jit
    def f(a):
        return a + 1.0

    f(x).block_until_ready()
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        y = f(x)
        times.append(time.perf_counter() - t0)  # async dispatch cost
    out["dispatch_async_ms"] = round(float(np.min(times)) * 1e3, 2)
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))                    # full round trip
        times.append(time.perf_counter() - t0)
    out["dispatch_plus_fetch_ms"] = round(float(np.min(times)) * 1e3, 2)

    # -- fetch round trip at triple-like sizes ------------------------
    big = jax.device_put(np.zeros((8, 3, 32, 128), np.float32))
    big.block_until_ready()
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(big)
        times.append(time.perf_counter() - t0)
    out["fetch_48KB_ms"] = round(float(np.min(times)) * 1e3, 2)

    # -- implied corpus ceiling ---------------------------------------
    corpus_audio_s = 3623.9
    corpus_bytes = corpus_audio_s * 16000 * 4
    t_upload = corpus_bytes / bw
    out["soak_ceiling"] = {
        "corpus_audio_s": corpus_audio_s,
        "corpus_mb_f32": round(corpus_bytes / 1e6, 1),
        "upload_bound_s": round(t_upload, 2),
        "audio_s_per_s_ceiling": round(corpus_audio_s / t_upload, 1),
        "note": (
            "the waveform upload stream alone bounds the tunneled "
            "corpus scan; device compute for the whole corpus is "
            "~0.1 s (BENCH e2e).  On a pod with local hosts this "
            "cost does not exist -- hosts feed their own chips over "
            "PCIe at GB/s (parallel/feeding.py places per-host rows)"
        ),
    }
    with open("TUNNEL_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "upload_mb_per_s": uploads["64MB"]["mb_per_s"],
        "dispatch_async_ms": out["dispatch_async_ms"],
        "soak_audio_s_per_s_ceiling":
        out["soak_ceiling"]["audio_s_per_s_ceiling"],
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
