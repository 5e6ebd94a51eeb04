"""DTW wavefront-kernel device-time bench vs its HBM roofline.

The band-compressed kernel's binding resource is the skband stream
from HBM: bytes = N * (L+M-1) * W * 4 with W = min(2*band+1, L).  The
DP itself is one VPU step per diagonal (L+M-1 steps of [bp, W] work),
so at production widths the kernel should sit near the stream
roofline (BASELINE.md "DTW kernels speed-of-light per chip").

Timing: slope method over in-jit repeats (see bench.py docstring); the
tunneled PJRT's fixed ~23 ms readback cancels in the slope.

Prints one JSON line with pairs/s, device ms, and roofline fraction.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HBM_GBPS = float(os.environ.get("DTW_HBM_GBPS", 819))  # v5e-class chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from template_speech_recognition_tpu.ops.dtw_pallas import (
        band_skew_cost,
        banded_dtw_pallas,
    )

    n = int(os.environ.get("DTW_N", 2048))       # pairs = B * peaks * K
    length = int(os.environ.get("DTW_L", 32))
    m = int(os.environ.get("DTW_M", 64))
    band = int(os.environ.get("DTW_BAND", 6))
    bp_env = os.environ.get("DTW_BP")
    bp = int(bp_env) if bp_env else None
    w = min(2 * band + 1, length)
    k_diag = length + m - 1

    @jax.jit
    def make():
        key = jax.random.PRNGKey(0)
        cost = jax.random.normal(key, (n, length, m), jnp.float32) + 2.0
        lens = jnp.full((n,), m, jnp.int32)
        return cost, lens

    cost, lens = make()
    cost.block_until_ready()

    reps = (2, 8)
    t_at = {}
    for r in reps:
        @jax.jit
        def run(c0, ln):
            # unrolled repeat chain (a lax.scan wrapper around the
            # custom call compiled pathologically slowly)
            acc = jnp.float32(0.0)
            for i in range(r):
                acc = acc + jnp.sum(
                    banded_dtw_pallas(
                        c0 + (i + 1) * 1e-6, ln, band, block_pairs=bp
                    )
                )
            return acc

        t0 = time.perf_counter()
        float(run(cost, lens))
        print(f"[bench_dtw] compile r={r}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(run(cost, lens))
            times.append(time.perf_counter() - t0)
        t_at[r] = float(np.min(times))
    dt = (t_at[reps[1]] - t_at[reps[0]]) / (reps[1] - reps[0])

    # stream roofline: skewed-cost bytes at the layout the dispatcher
    # picks (full lanes unless band compression saves whole 128-lane
    # registers), plus the skew prep's read+write of the cost tensor.
    lanes = w if -(-w // 128) < -(-length // 128) else length
    skband_bytes = n * k_diag * lanes * 4 + 2 * n * length * m * 4
    roofline_s = skband_bytes / (HBM_GBPS * 1e9)
    out = {
        "metric": "dtw_pairs_per_s",
        "value": round(n / dt, 1),
        "unit": "pairs_per_second",
        "pairs": n, "L": length, "M": m, "band": band, "W": w,
        "device_ms": round(dt * 1e3, 3),
        "skband_mb": round(skband_bytes / 1e6, 2),
        "roofline_ms": round(roofline_s * 1e3, 3),
        "roofline_frac": round(roofline_s / dt, 3),
    }
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
