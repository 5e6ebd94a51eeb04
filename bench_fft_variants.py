"""Ad-hoc variant timings for the fft pallas kernels (tuning tool).

Variants are measured INTERLEAVED (round-robin, several rounds, min per
variant) so the tunnel's run-to-run drift cancels; only compare numbers
from the same process.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def interleaved(variants, rounds=3):
    """variants: list of (name, slope_thunk) where slope_thunk() -> sec."""
    results = {name: [] for name, _ in variants}
    for r in range(rounds):
        for name, thunk in variants:
            results[name].append(thunk())
    for name, ts in results.items():
        print(f"{name}: {1e3*min(ts):.3f}ms  {[round(1e3*t,3) for t in ts]}")
        sys.stdout.flush()


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache, _slope_time
    from template_speech_recognition_tpu.detect.fft_scorer import (
        _dft_mats,
        _idft_mats,
        build_fft_bank,
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

    @jax.jit
    def prep(feats):
        x = feats.reshape(b, t, d)
        return (
            jnp.zeros((b, tneed, d), mm)
            .at[:, : min(t, tneed)]
            .set(x[:, :tneed].astype(mm))
        )

    xp = prep(fj)
    xp.block_until_ready()
    xr4, xi4 = jax.jit(
        lambda a, gg: fft_block_dft_pallas(a, gg, nfft, hop, nblk, dc=512)
    )(xp, g)
    xr = xr4.reshape(bins, m, d)
    xi = xi4.reshape(bins, m, d)
    ycat = jax.jit(lambda a, bb, w2: fft_binmm_pallas(a, bb, w2, dc=512))(
        xr, xi, bank.w2
    )
    ycat.block_until_ready()
    icmat, ismat = _idft_mats(nfft, hop, mm)
    imat = jnp.concatenate([icmat, -ismat], axis=0)
    yflat = ycat.reshape(2 * bins, m * k)

    NOLIM = None
    LIM = 100 * 1024 * 1024
    variants = []

    def add_idft(name, **kw):
        variants.append(
            (
                name,
                lambda kw=kw: _slope_time(
                    lambda y_in, i_in, c_in: jnp.sum(
                        fft_idft_pallas(y_in, i_in, c_in, nblk, **kw)
                    ),
                    yflat,
                    imat,
                    cj,
                ),
            )
        )

    def add_dft(name, **kw):
        variants.append(
            (
                name,
                lambda kw=kw: _slope_time(
                    lambda a, gg: jnp.sum(
                        fft_block_dft_pallas(a, gg, nfft, hop, nblk, **kw)[
                            0
                        ].astype(jnp.float32)
                    ),
                    xp,
                    g,
                ),
            )
        )

    def add_binmm(name, **kw):
        variants.append(
            (
                name,
                lambda kw=kw: _slope_time(
                    lambda a, bb, w2: jnp.sum(
                        fft_binmm_pallas(a, bb, w2, **kw).astype(jnp.float32)
                    ),
                    xr,
                    xi,
                    bank.w2,
                ),
            )
        )

    which = os.environ.get("VARIANTS", "idft,dft,binmm").split(",")
    if "idft" in which:
        add_idft("idft bk=256 nolim", bk=256, vmem_limit=NOLIM)
        add_idft("idft bk=512 lim", bk=512, vmem_limit=LIM)
        add_idft("idft bk=1024 nolim", bk=1024, vmem_limit=NOLIM)
        add_idft("idft bk=1024 lim", bk=1024, vmem_limit=LIM)
    if "dft" in which:
        add_dft("dft dc=512 nolim", dc=512, vmem_limit=NOLIM)
        add_dft("dft dc=512 lim", dc=512, vmem_limit=LIM)
        add_dft("dft dc=1024 lim", dc=1024, vmem_limit=LIM)
        add_dft("dft dc=2048 lim", dc=2048, vmem_limit=LIM)
    if "binmm" in which:
        add_binmm("binmm dc=512 nolim", dc=512, vmem_limit=NOLIM)
        add_binmm("binmm dc=512 lim", dc=512, vmem_limit=LIM)
        add_binmm("binmm dc=1024 lim", dc=1024, vmem_limit=LIM)
        add_binmm("binmm dc=2048 lim", dc=2048, vmem_limit=LIM)

    interleaved(variants, rounds=int(os.environ.get("ROUNDS", 3)))
    os._exit(0)


if __name__ == "__main__":
    main()
