"""Stage-by-stage timing of the FFT-correlation path (tuning tool)."""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench_formulations as bf
from bench_formulations import B, D, K, L, T, TOUT, _dft_mats, _idft_mats


def tm(f, *args, iters=6):
    jf = jax.jit(lambda *a: jnp.sum(f(*a)[-1] if isinstance(f(*a), tuple) else f(*a)))
    float(jf(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    nfft = 256
    hop = nfft - L + 1
    halo = L - 1
    bins = nfft // 2 + 1
    nblk = -(-TOUT // hop)
    m = B * nblk
    mm = jnp.bfloat16

    x, w, c = bf.make_data()
    wr, wi = jax.jit(functools.partial(bf._fft_bank, nfft=nfft, mm_dtype=mm))(w)
    wr.block_until_ready()

    def stage_blocks(x):
        tneed = nblk * hop + halo
        xp = jnp.zeros((B, tneed, D), x.dtype).at[:, :T].set(x)
        chunks = xp[:, : nblk * hop].reshape(B, nblk, hop, D)
        halos = jnp.concatenate(
            [chunks[:, 1:, :halo], xp[:, nblk * hop :][:, None]], axis=1
        )
        blocks = jnp.concatenate([chunks, halos], axis=2)
        bt = jnp.transpose(blocks.reshape(m, nfft, D), (1, 0, 2)).reshape(
            nfft, m * D
        )
        return bt

    def stage_dft(bt):
        cmat, smat = _dft_mats(nfft, mm)
        xr = jax.lax.dot_general(cmat.T, bt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        xi = jax.lax.dot_general(-smat.T, bt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return jnp.concatenate(
            [xr.reshape(bins, m, D), xi.reshape(bins, m, D)], axis=1
        ).astype(mm)

    def stage_binmm(xcat, wr, wi):
        pr = jax.lax.dot_general(xcat, wr, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        pi = jax.lax.dot_general(xcat, wi, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        yr = pr[:, :m] + pi[:, m:]
        yi = pr[:, m:] - pi[:, :m]
        return jnp.concatenate([yr, yi], axis=0).astype(mm)

    def stage_idft(ycat, c):
        icmat, ismat = _idft_mats(nfft, hop, mm)
        imat = jnp.concatenate([icmat, -ismat], axis=0)
        scores = jax.lax.dot_general(
            imat.T, ycat.reshape(2 * bins, m * K), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores.reshape(hop, B, nblk, K)
        scores = jnp.transpose(scores, (1, 3, 2, 0)).reshape(B, K, nblk * hop)
        return scores[:, :, :TOUT] + c[None, :, None]

    bt = jax.jit(stage_blocks)(x); bt.block_until_ready()
    xcat = jax.jit(stage_dft)(bt); xcat.block_until_ready()
    ycat = jax.jit(stage_binmm)(xcat, wr, wi); ycat.block_until_ready()

    print(f"nfft={nfft} bins={bins} nblk={nblk} m={m}")
    print(f"blocks  {tm(stage_blocks, x):8.2f} ms")
    print(f"dft     {tm(stage_dft, bt):8.2f} ms")
    print(f"binmm   {tm(stage_binmm, xcat, wr, wi):8.2f} ms   "
          f"({2*2*bins*2*m*D*K/1e12:.2f} Tflop)")
    print(f"idft    {tm(stage_idft, ycat, c):8.2f} ms")
    os._exit(0)


if __name__ == "__main__":
    main()
