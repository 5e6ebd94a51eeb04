"""Stage breakdown of the top_r=1 DTW rescore path at the bench shape
(round-5: the kernel is now 0.32 of roofline but the e2e add is still
~3.4 ms -- where does it go?), plus a probe of the tunnel's
per-execution cost vs argument size (the K=10k scan's ~10 s/batch
mystery: device-resident args may be re-shipped per execute).

Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import _enable_compile_cache, _slope_time


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    b, t, k, length, d = 8, 3000, 1024, 32, 2048
    p, m_seg, band = 123, 38, 6
    n = b * p

    @jax.jit
    def make():
        k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
        binary = jax.random.bernoulli(k0, 0.15, (b, t, d)).astype(
            jnp.float32
        )
        w16 = jax.random.normal(k1, (k, length, d), jnp.bfloat16)
        c_rows = jax.random.normal(k2, (k, length), jnp.float32)
        times = jax.random.randint(k3, (b, p), 0, t - m_seg, jnp.int32)
        ids = jax.random.randint(k3, (b, p), 0, k, jnp.int32)
        return binary, w16, c_rows, times, ids

    binary, w16, c_rows, times, ids = make()
    jax.block_until_ready(binary)

    out = {}

    def seg_gather(bm, tm):
        idx = jnp.clip(
            tm[:, :, None] + jnp.arange(m_seg)[None, None, :], 0, t - 1
        )
        segs = jax.vmap(lambda x, ix: jnp.take(x, ix, axis=0))(
            bm.astype(jnp.bfloat16), idx
        )
        return jnp.sum(segs.astype(jnp.float32))

    out["seg_gather_s"] = _slope_time(seg_gather, binary, times,
                                      reps=(2, 8))

    def seg_gather_flat(bm, tm):
        idx = jnp.clip(
            tm[:, :, None] + jnp.arange(m_seg)[None, None, :], 0, t - 1
        )
        rows = (
            jnp.arange(b, dtype=jnp.int32)[:, None, None] * t + idx
        ).reshape(-1)
        segs = jnp.take(
            bm.astype(jnp.bfloat16).reshape(b * t, d), rows, axis=0
        )
        return jnp.sum(segs.astype(jnp.float32))

    out["seg_gather_flat_s"] = _slope_time(seg_gather_flat, binary,
                                           times, reps=(2, 8))

    def w_gather(w, ii):
        wk = jnp.take(w, ii.reshape(-1), axis=0)
        return jnp.sum(wk.astype(jnp.float32))

    out["w_gather_s"] = _slope_time(
        w_gather, w16, ids, reps=(2, 8)
    )

    def pair_gemm(bm, tm, w, ii):
        idx = jnp.clip(
            tm[:, :, None] + jnp.arange(m_seg)[None, None, :], 0, t - 1
        )
        segs = jax.vmap(lambda x, ix: jnp.take(x, ix, axis=0))(
            bm.astype(jnp.bfloat16), idx
        ).reshape(n, m_seg, d)
        wk = jnp.take(w, ii.reshape(-1), axis=0)
        llr = jnp.einsum(
            "nld,nmd->nlm", wk, segs,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(llr)

    out["gathers_plus_gemm_s"] = _slope_time(
        pair_gemm, binary, times, w16, ids, reps=(2, 8)
    )

    from template_speech_recognition_tpu.align.dtw import (
        dtw_pairwise_scores,
    )

    def full_pairwise(bm, tm, w, ii, cr):
        idx = jnp.clip(
            tm[:, :, None] + jnp.arange(m_seg)[None, None, :], 0, t - 1
        )
        segs = jax.vmap(lambda x, ix: jnp.take(x, ix, axis=0))(
            bm.astype(jnp.bfloat16), idx
        ).reshape(n, m_seg, d)
        wk = jnp.take(w, ii.reshape(-1), axis=0)
        ck = jnp.take(cr, ii.reshape(-1), axis=0)
        lens = jnp.full((n,), m_seg, jnp.int32)
        return jnp.sum(
            dtw_pairwise_scores.__wrapped__(segs, lens, wk, ck, band,
                                            True)
        )

    out["full_pairwise_s"] = _slope_time(
        full_pairwise, binary, times, w16, ids, c_rows, reps=(2, 8)
    )

    # -- tunnel per-execute cost vs resident argument size -------------
    @jax.jit
    def tiny(a, x):
        return jnp.sum(a[0, :8]) + x

    probes = {}
    for name, arr in (
        ("16MB", jnp.zeros((2048, 2048), jnp.bfloat16)),
        ("512MB", jnp.zeros((128, 2048, 1024), jnp.bfloat16)),
        ("2GB", jnp.zeros((512, 2048, 1024), jnp.bfloat16)),
    ):
        arr.block_until_ready()
        float(tiny(arr, jnp.float32(0.0)))      # warm per shape
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(tiny(arr, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        probes[name] = round(float(np.min(ts)), 4)
        del arr
    out["execute_roundtrip_s_by_resident_arg"] = probes

    print(json.dumps(out))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
