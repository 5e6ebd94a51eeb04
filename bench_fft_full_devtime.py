"""Device-time of the full fft scoring step + per-fusion breakdown."""
from __future__ import annotations
import os, sys

def main():
    import jax, jax.numpy as jnp
    from bench import _enable_compile_cache
    from bench_device import device_time_ms, device_breakdown_ms
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
    bank = build_fft_bank(wj, cj); jax.block_until_ready(bank.w2)
    full = jax.jit(lambda fb, bkk: fft_sliding_scores(fb, bkk, time_major=True, trim=False))
    print(f"full trim=False: {device_time_ms(full, fj, bank):.3f}ms")
    brk = device_breakdown_ms(full, fj, bank)
    for name, ms in list(brk.items())[:12]:
        print(f"  {ms:8.3f}ms  {name}")
    full2 = jax.jit(lambda fb, bkk: fft_sliding_scores(fb, bkk, time_major=True))
    print(f"full trim=True:  {device_time_ms(full2, fj, bank):.3f}ms")
    os._exit(0)

if __name__ == "__main__":
    main()
