"""Micro-benchmark: alternative formulations of the hot sliding-score
kernel on the real chip.  Not part of the test suite -- a tuning tool.

    scores[b, k, t] = sum_{l, d} W[k, l, d] * X[b, t+l, d] + c[k]

Formulations:
  conv_nch   -- current production path (lax.conv, NCH/OIH)
  conv_nhc   -- time-major conv layout (NHC/HIO)
  gemm_shift -- one [B*T, D] @ [D, L*K] GEMM, then L shifted adds
  gemm_shift_scan -- same GEMM blockwise under lax.scan (bounded Y)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(os.environ.get("BF_B", 8))
T, K, L = 3000, 1024, 32
F, E = 256, 8
D = F * E
TOUT = T - L + 1
FLOPS = 2.0 * B * T * K * L * D


def make_data():
    @jax.jit
    def gen():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.bernoulli(k0, 0.15, (B, T, D)).astype(jnp.bfloat16)
        w = jax.random.normal(k1, (K, L, D), jnp.bfloat16)
        c = jax.random.normal(k2, (K,), jnp.float32)
        return x, w, c

    out = gen()
    out[0].block_until_ready()
    return out


def conv_nch(x, w, c):
    lhs = jnp.swapaxes(x, 1, 2)                       # [B, D, T]
    rhs = jnp.swapaxes(w, 1, 2)                       # [K, D, L]
    out = lax.conv_general_dilated(
        lhs, rhs, (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )                                                 # [B, K, TOUT]
    return out + c[None, :, None]


def conv_nhc(x, w, c):
    rhs = jnp.transpose(w, (1, 2, 0))                 # [L, D, K]
    out = lax.conv_general_dilated(
        x, rhs, (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )                                                 # [B, TOUT, K]
    return jnp.swapaxes(out, 1, 2) + c[None, :, None]


def gemm_shift(x, w, c):
    wf = jnp.transpose(w, (2, 1, 0)).reshape(D, L * K)      # [D, L*K]
    y = jax.lax.dot_general(
        x.reshape(B * T, D), wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(B, T, L, K)
    acc = jnp.zeros((B, TOUT, K), jnp.float32)
    for l in range(L):
        acc = acc + y[:, l : l + TOUT, l, :].astype(jnp.float32)
    return jnp.swapaxes(acc, 1, 2) + c[None, :, None]


def gemm_shift_scan(x, w, c, block=512):
    # GEMM + shift-add per time block to bound the [.., L, K] intermediate.
    wf = jnp.transpose(w, (2, 1, 0)).reshape(D, L * K)
    tpad = ((T + block - 1) // block) * block
    xp = jnp.zeros((B, tpad + L - 1, D), x.dtype).at[:, :T].set(x)
    n = tpad // block

    starts = jnp.arange(n) * block

    def step(_, s):
        xt = lax.dynamic_slice_in_dim(xp, s, block + L - 1, axis=1)
        y = jax.lax.dot_general(
            xt.reshape(B * (block + L - 1), D), wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, block + L - 1, L, K)
        acc = jnp.zeros((B, block, K), jnp.float32)
        for l in range(L):
            acc = acc + y[:, l : l + block, l, :]
        return None, acc

    _, blocks = lax.scan(step, None, starts)          # [n, B, block, K]
    out = jnp.moveaxis(blocks, 0, 1).reshape(B, tpad, K)[:, :TOUT]
    return jnp.swapaxes(out, 1, 2) + c[None, :, None]


def conv_int8(x, w, c):
    # int8 inputs, int32 accumulate: v5e int8 MXU peak is ~2x bf16.
    xi = x.astype(jnp.int8)
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(1, 2)) / 127.0
    wi = jnp.round(w.astype(jnp.float32) / scale[:, None, None]).astype(jnp.int8)
    out = lax.conv_general_dilated(
        xi, jnp.transpose(wi, (1, 2, 0)), (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * scale[None, None, :]
    return jnp.swapaxes(out, 1, 2) + c[None, :, None]


def _dft_mats(nfft, dtype):
    t = np.arange(nfft)
    f = np.arange(nfft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(t, f) / nfft
    return (
        jnp.asarray(np.cos(ang), dtype),          # [nfft, bins]
        jnp.asarray(np.sin(ang), dtype),
    )


def _idft_mats(nfft, nout, dtype):
    f = np.arange(nfft // 2 + 1)
    t = np.arange(nout)
    ang = 2.0 * np.pi * np.outer(f, t) / nfft
    wgt = np.full((nfft // 2 + 1, 1), 2.0)
    wgt[0] = 1.0
    if nfft % 2 == 0:
        wgt[-1] = 1.0
    return (
        jnp.asarray(np.cos(ang) * wgt / nfft, dtype),   # [bins, nout]
        jnp.asarray(np.sin(ang) * wgt / nfft, dtype),
    )


def fft_conv(x, w, c, nfft=128, mm_dtype=jnp.bfloat16):
    """Overlap-save cross-correlation via DFT-as-GEMM.

    Per frequency bin: a [M, D] @ [D, K] complex matmul (4 real
    matmuls).  MXU mults per output sample: 4 * bins / hop * D * K
    vs direct conv's L * D * K -> ~12x fewer at L=32, nfft=128.
    """
    hop = nfft - L + 1
    nblk = -(-TOUT // hop)
    tneed = (nblk - 1) * hop + nfft
    xp = jnp.zeros((B, tneed, D), x.dtype).at[:, :T].set(x)
    idx = (jnp.arange(nblk) * hop)[:, None] + jnp.arange(nfft)[None, :]
    blocks = xp[:, idx.reshape(-1), :].reshape(B, nblk, nfft, D)

    cmat, smat = _dft_mats(nfft, mm_dtype)
    bx = blocks.astype(mm_dtype)
    xr = jnp.einsum("bntd,tf->bnfd", bx, cmat, preferred_element_type=jnp.float32)
    xi = -jnp.einsum("bntd,tf->bnfd", bx, smat, preferred_element_type=jnp.float32)

    wp = jnp.zeros((K, nfft, D), w.dtype).at[:, :L].set(w).astype(mm_dtype)
    wr = jnp.einsum("ktd,tf->fdk", wp, cmat, preferred_element_type=jnp.float32)
    wi = -jnp.einsum("ktd,tf->fdk", wp, smat, preferred_element_type=jnp.float32)

    xr = xr.astype(mm_dtype)
    xi = xi.astype(mm_dtype)
    wr = wr.astype(mm_dtype)
    wi = wi.astype(mm_dtype)
    # correlation: Y = Xf * conj(Wf), contract D per bin
    yr = jnp.einsum("bnfd,fdk->bnfk", xr, wr, preferred_element_type=jnp.float32) \
       + jnp.einsum("bnfd,fdk->bnfk", xi, wi, preferred_element_type=jnp.float32)
    yi = jnp.einsum("bnfd,fdk->bnfk", xi, wr, preferred_element_type=jnp.float32) \
       - jnp.einsum("bnfd,fdk->bnfk", xr, wi, preferred_element_type=jnp.float32)

    icmat, ismat = _idft_mats(nfft, hop, mm_dtype)
    scores = jnp.einsum(
        "bnfk,ft->bntk", yr.astype(mm_dtype), icmat,
        preferred_element_type=jnp.float32,
    ) - jnp.einsum(
        "bnfk,ft->bntk", yi.astype(mm_dtype), ismat,
        preferred_element_type=jnp.float32,
    )
    scores = scores.reshape(B, nblk * hop, K)[:, :TOUT]
    return jnp.swapaxes(scores, 1, 2) + c[None, :, None]


def _fft_bank(w, nfft, mm_dtype):
    """One-time per-bank setup: template spectra [bins, D, K] r/i."""
    cmat, smat = _dft_mats(nfft, jnp.float32)
    wp = jnp.zeros((K, nfft, D), jnp.float32).at[:, :L].set(
        w.astype(jnp.float32)
    )
    wr = jnp.einsum("ktd,tf->fdk", wp, cmat)
    wi = -jnp.einsum("ktd,tf->fdk", wp, smat)
    return wr.astype(mm_dtype), wi.astype(mm_dtype)


def fft_conv2_factory(nfft=128, mm_dtype=jnp.bfloat16):
    hop = nfft - L + 1
    halo = L - 1

    def run(x, wr, wi, c):
        nblk = -(-TOUT // hop)
        tneed = nblk * hop + halo
        xp = jnp.zeros((B, tneed, D), x.dtype).at[:, :T].set(x)
        chunks = xp[:, : nblk * hop].reshape(B, nblk, hop, D)
        # halo rows for block i are xp[hop*i+hop : hop*i+nfft] = first
        # `halo` rows of chunk i+1 (last block's halo is the pad tail).
        halos = jnp.concatenate(
            [chunks[:, 1:, :halo], xp[:, nblk * hop :][:, None]], axis=1
        )
        blocks = jnp.concatenate([chunks, halos], axis=2)       # [B, nblk, nfft, D]
        m = B * nblk

        cmat, smat = _dft_mats(nfft, mm_dtype)
        # forward DFT as one GEMM: [bins, nfft] @ [nfft, m*D]
        bt = jnp.transpose(blocks.reshape(m, nfft, D), (1, 0, 2)).reshape(
            nfft, m * D
        ).astype(mm_dtype)
        xr = jax.lax.dot_general(
            cmat.T, bt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [bins, m*D]
        xi = jax.lax.dot_general(
            -smat.T, bt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bins = nfft // 2 + 1
        xcat = jnp.concatenate(
            [xr.reshape(bins, m, D), xi.reshape(bins, m, D)], axis=1
        ).astype(mm_dtype)                                       # [bins, 2m, D]
        pr = jax.lax.dot_general(
            xcat, wr, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                        # [bins, 2m, K]
        pi = jax.lax.dot_general(
            xcat, wi, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        yr = pr[:, :m] + pi[:, m:]                               # Xf * conj(Wf)
        yi = pr[:, m:] - pi[:, :m]
        icmat, ismat = _idft_mats(nfft, hop, mm_dtype)
        ycat = jnp.concatenate([yr, yi], axis=0).astype(mm_dtype)
        imat = jnp.concatenate([icmat, -ismat], axis=0)          # [2*bins, hop]
        scores = jax.lax.dot_general(
            imat.T, ycat.reshape(2 * bins, m * K),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [hop, m*K]
        scores = scores.reshape(hop, B, nblk, K)
        scores = jnp.transpose(scores, (1, 3, 2, 0)).reshape(B, K, nblk * hop)
        return scores[:, :, :TOUT] + c[None, :, None]

    return run


def fft_conv2(x, w, c, nfft=128):
    wr, wi = _fft_bank(w, nfft, jnp.bfloat16)
    run = fft_conv2_factory(nfft)
    return run(x, wr, wi, c)


def fft_conv3(x, w, c, nfft=128):
    w2 = _fft_bank_packed(w, nfft, jnp.bfloat16)
    return fft_conv3_factory(nfft)(x, w2, c)


def check_error():
    x, w, c = make_data()
    ref = jax.jit(lambda *a: conv_nhc(a[0].astype(jnp.float32),
                                      a[1].astype(jnp.float32), a[2]))(x, w, c)
    for name in ["conv_nhc", "fft_conv", "fft_conv2", "fft_conv3", "conv_int8"]:
        out = jax.jit(globals()[name])(x, w, c)
        err = jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref))
        print(f"{name:18s} rel max err {float(err):.2e}", flush=True)


def _fft_bank_packed(w, nfft, mm_dtype):
    """Per-bank setup for the packed path: W2 [bins, 2D, K] with
    Wr stacked on Wi along the contraction axis."""
    cmat, smat = _dft_mats(nfft, jnp.float32)
    wp = jnp.zeros((K, nfft, D), jnp.float32).at[:, :L].set(
        w.astype(jnp.float32)
    )
    wr = jnp.einsum("ktd,tf->fdk", wp, cmat)
    wi = -jnp.einsum("ktd,tf->fdk", wp, smat)
    return jnp.concatenate([wr, wi], axis=1).astype(mm_dtype)   # [bins, 2D, K]


def fft_conv3_factory(nfft=128, mm_dtype=jnp.bfloat16):
    """Packed overlap-save FFT correlation:

    * forward DFT: ONE GEMM [2*bins, nfft] @ [nfft, m*D] -> [Xr; Xi]
    * bin matmuls: ONE batched GEMM [bins, 2m, 2D] @ [bins, 2D, K]
      (rows 0:m give yr via [Xr|Xi]; rows m:2m give yi via [Xi|-Xr])
    * inverse DFT: ONE GEMM [hop, 2*bins] @ [2*bins, m*K]
    """
    hop = nfft - L + 1
    halo = L - 1
    bins = nfft // 2 + 1

    def run(x, w2, c):
        nblk = -(-TOUT // hop)
        tneed = nblk * hop + halo
        xp = jnp.zeros((B, tneed, D), x.dtype).at[:, :T].set(x)
        chunks = xp[:, : nblk * hop].reshape(B, nblk, hop, D)
        halos = jnp.concatenate(
            [chunks[:, 1:, :halo], xp[:, nblk * hop :][:, None]], axis=1
        )
        blocks = jnp.concatenate([chunks, halos], axis=2)       # [B,nblk,nfft,D]
        m = B * nblk
        bt = jnp.transpose(blocks.reshape(m, nfft, D), (1, 0, 2)).reshape(
            nfft, m * D
        ).astype(mm_dtype)

        cmat, smat = _dft_mats(nfft, mm_dtype)
        g = jnp.concatenate([cmat, -smat], axis=1)              # [nfft, 2*bins]
        xf = jax.lax.dot_general(
            g.T, bt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(mm_dtype)                                      # [2*bins, m*D]
        xr = xf[:bins].reshape(bins, m, D)
        xi = xf[bins:].reshape(bins, m, D)
        x2 = jnp.concatenate(
            [
                jnp.concatenate([xr, xi], axis=2),              # -> yr rows
                jnp.concatenate([xi, -xr], axis=2),             # -> yi rows
            ],
            axis=1,
        )                                                       # [bins, 2m, 2D]
        y = jax.lax.dot_general(
            x2, w2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(mm_dtype)                                      # [bins, 2m, K]
        ycat = jnp.concatenate([y[:, :m], y[:, m:]], axis=0)    # [2*bins, m, K]

        icmat, ismat = _idft_mats(nfft, hop, mm_dtype)
        imat = jnp.concatenate([icmat, -ismat], axis=0)         # [2*bins, hop]
        scores = jax.lax.dot_general(
            imat.T, ycat.reshape(2 * bins, m * K),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [hop, m*K]
        scores = scores.reshape(hop, B, nblk, K)
        scores = jnp.transpose(scores, (1, 3, 2, 0)).reshape(B, K, nblk * hop)
        return scores[:, :, :TOUT] + c[None, :, None]

    return run


def fft_conv3_pre(nfft=128):
    x, w, c = make_data()
    w2 = jax.jit(
        functools.partial(_fft_bank_packed, nfft=nfft, mm_dtype=jnp.bfloat16)
    )(w)
    w2.block_until_ready()
    return fft_conv3_factory(nfft), (x, w2, c)


def fft_conv2_pre(nfft=128):
    """(fn, args) with the per-bank spectra precomputed outside timing."""
    x, w, c = make_data()
    wr, wi = jax.jit(functools.partial(_fft_bank, nfft=nfft,
                                       mm_dtype=jnp.bfloat16))(w)
    wr.block_until_ready()
    return fft_conv2_factory(nfft), (x, wr, wi, c)


def timeit(fn, args, iters=4, reps=(2, 6)):
    """Slope timing: the tunneled PJRT adds a ~23 ms round trip to any
    host readback, so run the op R times inside one jit (inputs
    perturbed per step so XLA cannot CSE) for two values of R and take
    the slope -- constant overhead cancels."""

    def make(r):
        @jax.jit
        def run(x0, *rest):
            eps = jnp.arange(1, r + 1, dtype=x0.dtype) * jnp.asarray(
                1e-6, x0.dtype
            )

            def body(acc, e):
                out = fn(x0 + e, *rest)
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), eps)
            return acc

        return run

    t_at = {}
    compile_s = 0.0
    for r in reps:
        f = make(r)
        t0 = time.perf_counter()
        float(f(*args))
        compile_s += time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(*args))
            times.append(time.perf_counter() - t0)
        t_at[r] = float(np.median(times))
    dt = (t_at[reps[1]] - t_at[reps[0]]) / (reps[1] - reps[0])
    return dt, compile_s


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if sys.argv[1:] == ["check"]:
        check_error()
        os._exit(0)
    names = sys.argv[1:] or ["conv_nch", "conv_nhc", "gemm_shift", "gemm_shift_scan"]
    x, w, c = make_data()
    for name in names:
        if name.startswith("pre"):
            head, _, nfft = name.partition(":")
            maker = fft_conv3_pre if head == "pre3" else fft_conv2_pre
            fn, pargs = maker(int(nfft or 128))
            dt, cs = timeit(fn, pargs)
            print(
                f"{name:18s} {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOPS"
                f" effective  (compile {cs:.0f}s)",
                flush=True,
            )
            continue
        fn = globals()[name]
        try:
            dt, cs = timeit(fn, (x, w, c))
            print(
                f"{name:18s} {dt*1e3:8.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOPS"
                f"  (compile {cs:.0f}s)",
                flush=True,
            )
        except Exception as err:  # noqa: BLE001
            print(f"{name:18s} FAILED: {type(err).__name__}: {err}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
