"""Device-time sweep of nfft for the fused fft scoring path."""
from __future__ import annotations
import os, sys

def main():
    import jax, jax.numpy as jnp
    from bench import _enable_compile_cache
    from bench_device import device_time_ms
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank, fft_sliding_scores,
    )
    _enable_compile_cache()
    b = int(os.environ.get("BENCH_B", 8)); t = int(os.environ.get("BENCH_T", 3000))
    k = int(os.environ.get("BENCH_K", 1024)); length = int(os.environ.get("BENCH_L", 32))
    f, e = 256, 8; d = f * e

    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        feats = jax.random.bernoulli(k0, 0.15, (b, t, d)).astype(jnp.bfloat16)
        w = jax.random.normal(k1, (k, length, f, e), jnp.bfloat16)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return feats, w, c

    fj, wj, cj = make_data(); fj.block_until_ready()
    for nfft in (111, 127, 143, 159, 191, 223, 255, 287):
        hop = nfft - length + 1
        if hop % 16:
            print(f"nfft={nfft}: skip (hop {hop} unaligned)")
            continue
        bank = build_fft_bank(wj, cj, nfft=nfft); jax.block_until_ready(bank.w2)
        fn = jax.jit(lambda fb, bkk: fft_sliding_scores(fb, bkk, time_major=True, trim=False))
        ms = device_time_ms(fn, fj, bank)
        print(f"nfft={nfft} bins={nfft//2+1} hop={hop}: {ms:.3f}ms")
        sys.stdout.flush()
    os._exit(0)

if __name__ == "__main__":
    main()
