"""Slope-timed stage breakdown of the PRODUCTION fft scoring path
(the exact pallas kernels `fft_sliding_scores` runs on chip).

Usage: python bench_fft_prod_stages.py   [BENCH_B=8 BENCH_T=3000 ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache, _slope_time
    from template_speech_recognition_tpu.detect.fft_scorer import (
        _dft_mats,
        _idft_mats,
        build_fft_bank,
        fft_sliding_scores,
    )
    from template_speech_recognition_tpu.ops.fft_binmm_pallas import (
        fft_binmm_pallas,
    )
    from template_speech_recognition_tpu.ops.fft_dft_pallas import (
        fft_block_dft_pallas,
    )
    from template_speech_recognition_tpu.ops.fft_idft_pallas import (
        fft_idft_pallas,
    )

    _enable_compile_cache()
    b = int(os.environ.get("BENCH_B", 8))
    t = int(os.environ.get("BENCH_T", 3000))
    k = int(os.environ.get("BENCH_K", 1024))
    length = int(os.environ.get("BENCH_L", 32))
    f, e = 256, 8
    d = f * e

    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        feats = jax.random.bernoulli(k0, 0.15, (b, t, f, e)).astype(
            jnp.bfloat16
        )
        w = jax.random.normal(k1, (k, length, f, e), jnp.bfloat16)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return feats, w, c

    fj, wj, cj = make_data()
    fj.block_until_ready()
    bank = build_fft_bank(wj, cj)
    jax.block_until_ready(bank.w2)

    nfft = bank.nfft
    hop = nfft - length + 1
    halo = length - 1
    bins = nfft // 2 + 1
    tout = t - length + 1
    nblk = -(-tout // hop)
    m = b * nblk
    tneed = nblk * hop + halo
    mm = bank.w2.dtype
    cmat, smat = _dft_mats(nfft, mm)
    g = jnp.concatenate([cmat, -smat], axis=1)
    dft_dc = next(
        c for c in (512, 256, 128)
        if d % c == 0 and tneed * c * 2 <= 4 * 1024 * 1024
    )
    print(
        f"[shape] b={b} t={t} k={k} L={length} nfft={nfft} hop={hop} "
        f"bins={bins} nblk={nblk} m={m} dft_dc={dft_dc}",
        file=sys.stderr,
    )

    # --- stage inputs (on device) -----------------------------------
    @jax.jit
    def prep(feats):
        x = feats.reshape(b, t, d)
        xp = jnp.zeros((b, tneed, d), mm).at[:, : min(t, tneed)].set(
            x[:, :tneed].astype(mm)
        )
        return xp

    xp = prep(fj)
    xp.block_until_ready()

    def stage_dft(xp_in, g_in):
        xr4, xi4 = fft_block_dft_pallas(xp_in, g_in, nfft, hop, nblk, dc=dft_dc)
        return jnp.sum(xr4.astype(jnp.float32)) + jnp.sum(
            xi4.astype(jnp.float32)
        )

    dt_dft = _slope_time(stage_dft, xp, g)

    xr4, xi4 = jax.jit(
        lambda a, gg: fft_block_dft_pallas(a, gg, nfft, hop, nblk, dc=dft_dc)
    )(xp, g)
    xr = xr4.reshape(bins, m, d)
    xi = xi4.reshape(bins, m, d)
    xr.block_until_ready()

    def stage_binmm(xr_in, xi_in, w2_in):
        y = fft_binmm_pallas(xr_in, xi_in, w2_in, dc=512)
        return jnp.sum(y.astype(jnp.float32))

    dt_binmm = _slope_time(stage_binmm, xr, xi, bank.w2)

    ycat = jax.jit(lambda a, bb, w2: fft_binmm_pallas(a, bb, w2, dc=512))(
        xr, xi, bank.w2
    )
    ycat.block_until_ready()
    icmat, ismat = _idft_mats(nfft, hop, mm)
    imat = jnp.concatenate([icmat, -ismat], axis=0)
    yflat = ycat.reshape(2 * bins, m * k)

    def stage_idft(y_in, imat_in, c_in):
        s = fft_idft_pallas(y_in, imat_in, c_in, nblk)
        return jnp.sum(s)

    dt_idft = _slope_time(stage_idft, yflat, imat, cj)

    def stage_full(feats, bk):
        return jnp.sum(fft_sliding_scores(feats, bk, time_major=True))

    dt_full = _slope_time(stage_full, fj, bank)

    print(
        f"dft={dt_dft*1e3:.3f}ms binmm={dt_binmm*1e3:.3f}ms "
        f"idft={dt_idft*1e3:.3f}ms sum={1e3*(dt_dft+dt_binmm+dt_idft):.3f}ms "
        f"full={dt_full*1e3:.3f}ms"
    )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
