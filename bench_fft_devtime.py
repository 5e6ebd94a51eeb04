"""Device-time stage/variant timings for the fft scorer (tuning tool)."""
from __future__ import annotations
import os, sys
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from bench import _enable_compile_cache
    from bench_device import device_time_ms, device_breakdown_ms
    from template_speech_recognition_tpu.detect.fft_scorer import (
        _dft_mats, _idft_mats, build_fft_bank, fft_sliding_scores,
    )
    from template_speech_recognition_tpu.ops.fft_binmm_pallas import fft_binmm_pallas
    from template_speech_recognition_tpu.ops.fft_dft_pallas import fft_block_dft_pallas
    from template_speech_recognition_tpu.ops.fft_idft_pallas import fft_idft_pallas

    _enable_compile_cache()
    b = int(os.environ.get("BENCH_B", 8)); t = int(os.environ.get("BENCH_T", 3000))
    k = int(os.environ.get("BENCH_K", 1024)); length = int(os.environ.get("BENCH_L", 32))
    f, e = 256, 8; d = f * e

    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        feats = jax.random.bernoulli(k0, 0.15, (b, t, f, e)).astype(jnp.bfloat16)
        w = jax.random.normal(k1, (k, length, f, e), jnp.bfloat16)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return feats, w, c

    fj, wj, cj = make_data(); fj.block_until_ready()
    bank = build_fft_bank(wj, cj); jax.block_until_ready(bank.w2)
    nfft = bank.nfft; hop = nfft - length + 1; halo = length - 1
    bins = nfft // 2 + 1; tout = t - length + 1
    nblk = -(-tout // hop); m = b * nblk; tneed = nblk * hop + halo
    mm = bank.w2.dtype
    cmat, smat = _dft_mats(nfft, mm); g = jnp.concatenate([cmat, -smat], axis=1)

    @jax.jit
    def prep(feats):
        x = feats.reshape(b, t, d)
        return jnp.zeros((b, tneed, d), mm).at[:, : min(t, tneed)].set(x[:, :tneed].astype(mm))

    xp = prep(fj); xp.block_until_ready()
    xr4, xi4 = jax.jit(lambda a, gg: fft_block_dft_pallas(a, gg, nfft, hop, nblk, dc=512))(xp, g)
    xr = xr4.reshape(bins, m, d); xi = xi4.reshape(bins, m, d)
    ycat = jax.jit(lambda a, bb, w2: fft_binmm_pallas(a, bb, w2, dc=512))(xr, xi, bank.w2)
    ycat.block_until_ready()
    icmat, ismat = _idft_mats(nfft, hop, mm)
    imat = jnp.concatenate([icmat, -ismat], axis=0)
    yflat = ycat.reshape(2 * bins, m * k)

    NOLIM = None; LIM = 100 * 1024 * 1024
    for bk in (256, 512, 1024):
        for lim, ln in ((NOLIM, "nolim"), (LIM, "lim")):
            fn = jax.jit(lambda y, i, c, bk=bk, lim=lim: fft_idft_pallas(y, i, c, nblk, bk=bk, vmem_limit=lim))
            print(f"idft bk={bk} {ln}: {device_time_ms(fn, yflat, imat, cj):.3f}ms"); sys.stdout.flush()
    for dc in (256, 512, 1024, 2048):
        for lim, ln in ((NOLIM, "nolim"), (LIM, "lim")):
            if dc >= 1024 and lim is NOLIM: continue
            fn = jax.jit(lambda a, gg, dc=dc, lim=lim: fft_block_dft_pallas(a, gg, nfft, hop, nblk, dc=dc, vmem_limit=lim))
            print(f"dft dc={dc} {ln}: {device_time_ms(fn, xp, g):.3f}ms"); sys.stdout.flush()
    for dc in (256, 512, 1024, 2048):
        for lim, ln in ((NOLIM, "nolim"), (LIM, "lim")):
            if dc >= 1024 and lim is NOLIM: continue
            fn = jax.jit(lambda a, bb, w2, dc=dc, lim=lim: fft_binmm_pallas(a, bb, w2, dc=dc, vmem_limit=lim))
            print(f"binmm dc={dc} {ln}: {device_time_ms(fn, xr, xi, bank.w2):.3f}ms"); sys.stdout.flush()

    full = jax.jit(lambda fb, bkk: fft_sliding_scores(fb, bkk, time_major=True))
    print(f"full: {device_time_ms(full, fj, bank):.3f}ms")
    brk = device_breakdown_ms(full, fj, bank)
    for name, ms in list(brk.items())[:12]:
        print(f"  {ms:8.3f}ms  {name}")
    os._exit(0)

if __name__ == "__main__":
    main()
