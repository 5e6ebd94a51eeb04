"""FFT-domain sliding-window LLR correlation (overlap-save).

The direct scorer (``detect.scorer``, an XLA conv) runs at MXU
speed-of-light for the *direct* algorithm -- but the direct algorithm
does L multiply-accumulates per (template, output-frame, channel).
Overlap-save frequency-domain correlation does the same work with

    4 * bins / hop        (bins = nfft//2 + 1, hop = nfft - L + 1)

real multiplies per (template, output-frame, channel): ~2.3 at L = 32,
nfft = 256 -- a ~14x reduction in MXU work.  Everything is expressed
as GEMMs (DFT-as-matmul, per-bin complex matmuls), so it all lands on
the MXU; there is no jnp.fft anywhere.  Measured on one v5e-class
chip: 2.8x faster end-to-end than the speed-of-light direct conv at
the benchmark shape (K=1024, L=32, D=2048).

Pipeline (all inside one jit):

1. overlap-save blocking: pad T, split into ``nblk`` blocks of
   ``nfft`` frames overlapping by L - 1 (reshape + halo concat -- no
   gather).
2. forward DFT: ONE GEMM  [2*bins, nfft] @ [nfft, m*D]  -> [Xr; Xi]
   (m = B * nblk blocks).
3. per-bin complex matmul as ONE batched real GEMM
   [bins, 2m, 2D] @ [bins, 2D, K]: rows 0:m are [Xr | Xi] (-> real
   part of Xf * conj(Wf)); rows m:2m are [Xi | -Xr] (-> imag part).
   The template spectra W2 [bins, 2D, K] are a one-time per-bank
   precomputation (``build_fft_bank``), like the LLR filter build
   itself (SURVEY.md section 3.2).
4. inverse DFT (real part, first ``hop`` samples per block): ONE GEMM
   [hop, 2*bins] @ [2*bins, m*K].

Numerics: bf16 GEMMs with f32 accumulation end to end; relative error
vs the f32 direct path is ~3e-3 at the benchmark shape -- the same
class as the bf16 direct path.  Parity/bit-exact modes stay on
``detect.scorer`` (f32 conv / int32).

Reference capability covered: the sliding log-odds correlation of
SURVEY.md section 3.2 (reference's compute_likelihood_linear_filter-
style scoring); this module is a TPU-native acceleration of it, not a
translation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def pick_nfft(length: int, bank_k: int = 0) -> int:
    """hop = 16-aligned ~4*L (large banks: ~8*L), nfft = hop + L - 1.

    Larger nfft lowers per-output MXU work (4*bins/hop) but grows the
    template-spectra array (bins * 2D * K) that the bin-matmul kernel
    must stream from HBM once per call -- the stream, not the MXU, is
    that kernel's binding resource at production shapes.  The DFT here
    is a GEMM, not an FFT, so nfft need not be composite or even.
    Swept on a v5e-class chip at the bench shape (L=32) over nfft in
    {111,127,143,159,191,223,255,287} with the fully-fused kernel
    path: 159 (hop=128, bins=80) is fastest at K=1024, with a flat
    basin through 223; the old pick (255) is ~9% slower.  At config-5
    bank scale the balance tips toward fewer MXU ops per output: the
    K=10,000 re-sweep (bench_bank10k.py, BANK10K_r04.json) puts 223
    (hop=192, ~6*L) 17% ahead of 159, while 287's spectra no longer
    fit HBM beside the workspace at K=10k -- so banks past 4096
    templates take the 6*L hop.  hop % 16 == 0 keeps the forward-DFT
    kernel's window
    slices sublane-aligned so the fused path engages.
    """
    mult = 6 if bank_k >= 4096 else 4
    hop = max(16, ((mult * length + 15) // 16) * 16)
    return hop + length - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FFTBank:
    """Precomputed frequency-domain template bank.

    ``w2``: [bins, 2D, K] template spectra, real stacked on imag along
    the contraction axis.  ``c``: [K] score offsets.  Static metadata
    (template length, nfft, feature layout) rides as aux data so the
    bank is a jit-stable pytree.
    """

    w2: jnp.ndarray
    c: jnp.ndarray
    length: int = dataclasses.field(metadata=dict(static=True))
    nfft: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    # int8 spectra mode (build_fft_bank(mm_dtype=jnp.int8)): w2 holds
    # the per-(bin, template)-scaled int8 quantization and w2_scale
    # [bins, K] f32 the dequant factors; halves the HBM stream and
    # doubles the MXU rate of the bin-matmul at config-5 bank scale.
    w2_scale: jnp.ndarray | None = None

    @property
    def k(self) -> int:
        return self.w2.shape[-1]


def _dft_mats(nfft: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    t = np.arange(nfft)
    f = np.arange(nfft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(t, f) / nfft
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype)


def _idft_mats(nfft: int, nout: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    f = np.arange(nfft // 2 + 1)
    t = np.arange(nout)
    ang = 2.0 * np.pi * np.outer(f, t) / nfft
    wgt = np.full((nfft // 2 + 1, 1), 2.0)
    wgt[0] = 1.0
    if nfft % 2 == 0:
        wgt[-1] = 1.0
    return (
        jnp.asarray(np.cos(ang) * wgt / nfft, dtype),
        jnp.asarray(np.sin(ang) * wgt / nfft, dtype),
    )


@functools.partial(jax.jit, static_argnames=("nfft", "mm_dtype"))
def _bank_spectra(w: jnp.ndarray, nfft: int, mm_dtype) -> jnp.ndarray:
    k, length = w.shape[0], w.shape[1]
    d = int(np.prod(w.shape[2:]))
    cmat, smat = _dft_mats(nfft, jnp.float32)
    wp = jnp.zeros((k, nfft, d), jnp.float32)
    wp = wp.at[:, :length].set(w.reshape(k, length, d).astype(jnp.float32))
    wr = jnp.einsum("ktd,tf->fdk", wp, cmat)
    wi = -jnp.einsum("ktd,tf->fdk", wp, smat)
    return jnp.concatenate([wr, wi], axis=1).astype(mm_dtype)  # [bins, 2D, K]


def build_fft_bank(
    w: jnp.ndarray,
    c: jnp.ndarray,
    nfft: int | None = None,
    mm_dtype=None,
) -> FFTBank:
    """One-time per-bank setup: W [K, L, F, E] (or [K, L, D]) + c [K]
    -> frequency-domain bank.  Analogous to the LLR filter build -- do
    it once, score many utterances.

    ``mm_dtype=None`` resolves per backend: bfloat16 on accelerators
    (the MXU's native throughput dtype; binary features are exact in
    bf16) and float32 on CPU, where bf16 GEMMs are emulated and slow
    and the f32 path keeps scores allclose to the direct conv."""
    if mm_dtype is None:
        mm_dtype = (
            jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
        )
    k, length = w.shape[0], w.shape[1]
    d = int(np.prod(w.shape[2:]))
    if nfft is None:
        nfft = pick_nfft(length, bank_k=k)
    if nfft - length + 1 <= 0:
        raise ValueError(f"nfft {nfft} too small for template length {length}")
    if mm_dtype == jnp.int8:
        # int8 spectra (round-4 verdict, weak item 4): symmetric
        # per-(bin, template) quantization -- every (bin, k) column
        # keeps full relative precision, so small-magnitude bins do
        # not drown in a global scale.  The bin-matmul runs int8 MXU
        # with exact int32 accumulation; scores are allclose (~1e-2
        # rel) to the bf16 path, parity-tested.
        w2f = _bank_spectra(w, nfft, jnp.float32)          # [bins, 2D, K]
        scale = jnp.maximum(
            jnp.max(jnp.abs(w2f), axis=1), 1e-30
        ) / 127.0                                          # [bins, K]
        w2q = jnp.clip(
            jnp.round(w2f / scale[:, None, :]), -127, 127
        ).astype(jnp.int8)
        return FFTBank(
            w2=w2q, c=c.astype(jnp.float32), length=length, nfft=nfft,
            d=d, w2_scale=scale,
        )
    w2 = _bank_spectra(w, nfft, mm_dtype)
    return FFTBank(
        w2=w2, c=c.astype(jnp.float32), length=length, nfft=nfft, d=d
    )


def _round_up(n: int, q: int) -> int:
    return ((n + q - 1) // q) * q


def _binmm_pallas(xr, xi, w2):
    """Fused pack + per-bin GEMM + (part, bin)-major output reorder via
    ``ops.fft_binmm_pallas``, padding (m, D, K) up to its tile grid."""
    from template_speech_recognition_tpu.ops.fft_binmm_pallas import (
        fft_binmm_pallas,
    )

    bins, m, d = xr.shape
    k = w2.shape[-1]
    dc = 512 if d % 512 == 0 else (256 if d % 256 == 0 else 128)
    mp, dp, kp = _round_up(m, 8), _round_up(d, dc), _round_up(k, 128)
    if (mp, dp, kp) != (m, d, k):
        pad_x = [(0, 0), (0, mp - m), (0, dp - d)]
        xr = jnp.pad(xr, pad_x)
        xi = jnp.pad(xi, pad_x)
        w2 = jnp.pad(
            w2.reshape(bins, 2, d, k),
            [(0, 0), (0, 0), (0, dp - d), (0, kp - k)],
        ).reshape(bins, 2 * dp, kp)
    y = fft_binmm_pallas(xr, xi, w2, dc=dc)          # [2, bins, mp, kp]
    return y[:, :, :m, :k]


@functools.partial(
    jax.jit, static_argnames=("use_pallas", "time_major", "trim")
)
def fft_sliding_scores(
    feats: jnp.ndarray,
    bank: FFTBank,
    use_pallas: bool | None = None,
    time_major: bool = False,
    trim: bool = True,
) -> jnp.ndarray:
    """feats [B, T, F, E] (or [B, T, D]; bool/float) -> [B, K, T-L+1]
    (or [B, T-L+1, K] with ``time_major``).

    Same output contract as ``jax.vmap(sliding_scores)``: window
    starts whose support overruns T read zero padding; callers mask
    them via ``detect.masked_scores``.

    ``use_pallas`` selects the fused pallas kernels
    (``ops.fft_dft_pallas``/``fft_binmm_pallas``/``fft_idft_pallas``);
    default on for accelerator backends (interpret-mode pallas is slow
    on CPU).  ``time_major=True`` returns the fused epilogue's NATIVE
    layout with zero transposes anywhere in the path; ``detect.nms``
    and ``detect.masked_scores`` accept it directly.  ``trim=False``
    (time_major only) skips the final [:, :T-L+1] slice -- a pure HBM
    round trip -- and returns all ``nblk*hop`` rows; rows >= T-L+1 are
    window starts past the valid region, exactly what
    ``detect.masked_scores`` already masks.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if not trim and not time_major:
        raise ValueError("trim=False requires time_major=True")
    length, nfft, d = bank.length, bank.nfft, bank.d
    quant = bank.w2_scale is not None
    if quant:
        # int8 spectra: the DFT/iDFT still run in the accelerator's
        # GEMM dtype; only the bin-matmul operands are int8
        mm = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    else:
        mm = bank.w2.dtype
    b, t = feats.shape[0], feats.shape[1]
    x = feats.reshape(b, t, d)
    tout = t - length + 1
    if tout <= 0:
        raise ValueError(f"T {t} shorter than template length {length}")
    hop = nfft - length + 1
    halo = length - 1
    bins = nfft // 2 + 1
    nblk = -(-tout // hop)
    m = b * nblk

    tneed = nblk * hop + halo
    cmat, smat = _dft_mats(nfft, mm)
    g = jnp.concatenate([cmat, -smat], axis=1)  # [nfft, 2*bins]

    dft_dc = next(
        (
            c
            for c in (512, 256, 128)
            if d % c == 0 and t * c * 2 <= 4 * 1024 * 1024
        ),
        None,
    )
    xr = xi = None
    if use_pallas and hop % 16 == 0 and dft_dc is not None:
        # fused tail-pad + block-extract + forward DFT (no pad or
        # transpose pass); output stays in the kernel's native 4-D
        # [bins, B, nblk, D] layout for the bin-matmul kernel.
        from template_speech_recognition_tpu.ops.fft_dft_pallas import (
            fft_block_dft_pallas,
        )

        xr4, xi4 = fft_block_dft_pallas(
            x.astype(mm), g, nfft, hop, nblk, dc=dft_dc
        )
        # The bin-matmul kernel collapses its (B, nblk, dc) block to
        # (m, dc); that collapse is layout-trivial only when B == 1 or
        # nblk is sublane-aligned -- otherwise Mosaic may reject the
        # reshape or insert a relayout, so drop to 3-D.
        if (
            m % 8 == 0
            and (b == 1 or nblk % 8 == 0)
            and bank.w2.shape[-1] % 128 == 0
            and d % 128 == 0
        ):
            xr, xi = xr4, xi4  # stay 4-D: zero reshapes between kernels
        else:
            xr = xr4.reshape(bins, m, d)
            xi = xi4.reshape(bins, m, d)
    else:
        xp = jnp.zeros((b, tneed, d), mm)
        xp = xp.at[:, : min(t, tneed)].set(x[:, :tneed].astype(mm))
        chunks = xp[:, : nblk * hop].reshape(b, nblk, hop, d)
        # halo rows of block i = first L-1 rows of block i+1 (pad tail
        # last)
        halos = jnp.concatenate(
            [chunks[:, 1:, :halo], xp[:, nblk * hop :][:, None]], axis=1
        )
        blocks = jnp.concatenate([chunks, halos], axis=2)  # [B,nblk,nfft,D]
        bt = (
            jnp.transpose(blocks.reshape(m, nfft, d), (1, 0, 2))
            .reshape(nfft, m * d)
        )
        xf = jax.lax.dot_general(
            g.T, bt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(mm)  # [2*bins, m*D]
        xr = xf[:bins].reshape(bins, m, d)
        xi = xf[bins:].reshape(bins, m, d)
    k = bank.w2.shape[-1]
    sc = None
    if quant:
        # dynamic per-bin symmetric int8 quantization of the block
        # spectra; sc folds both scales for the kernel's flush
        ax = tuple(range(1, xr.ndim))
        sx = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(xr.astype(jnp.float32)), axis=ax),
                jnp.max(jnp.abs(xi.astype(jnp.float32)), axis=ax),
            ),
            1e-30,
        ) / 127.0                                       # [bins]
        sxb = sx.reshape((bins,) + (1,) * (xr.ndim - 1))
        xr = jnp.clip(
            jnp.round(xr.astype(jnp.float32) / sxb), -127, 127
        ).astype(jnp.int8)
        xi = jnp.clip(
            jnp.round(xi.astype(jnp.float32) / sxb), -127, 127
        ).astype(jnp.int8)
        sc = sx[:, None] * bank.w2_scale                # [bins, K]
    icmat, ismat = _idft_mats(nfft, hop, mm)
    imat = jnp.concatenate([icmat, -ismat], axis=0)  # [2*bins, hop]

    def _binmm_vmem_ok(dc_, m_, k_):
        # w2 tiles + xr/xi blocks + f32 accumulator & bf16 out block
        return (
            dc_ * k_ * 4 + 8 * m_ * dc_ + 12 * m_ * k_ <= 80 * 1024 * 1024
        )

    ycat = None
    if use_pallas and xr.ndim == 4:
        # fully-aligned fast path: 4-D shapes flow between the three
        # kernels with no reshape/relayout/pad anywhere
        from template_speech_recognition_tpu.ops.fft_binmm_pallas import (
            fft_binmm_pallas,
        )

        bin_dc = next(c for c in (2048, 1024, 512, 256, 128) if d % c == 0)
        while bin_dc > 128 and not _binmm_vmem_ok(bin_dc, m, k):
            bin_dc //= 2  # keep tiles + accumulator inside VMEM
        # int8 at config-5 bank scale: this toolchain's Mosaic crashes
        # compiling the quantized kernel above ~4k templates
        # (tpu_compile_helper exit 1, BANK10K_r05 int8 rows); the XLA
        # int8 path below works and already wins there
        pallas_ok = _binmm_vmem_ok(bin_dc, m, k) and (
            not quant or k <= 4096
        )
        if pallas_ok:
            ycat = fft_binmm_pallas(xr, xi, bank.w2, sc=sc, dc=bin_dc)
        else:
            # the shape-independent [2m, K] accumulator alone overruns
            # VMEM (very long utterances x large K): no dc fits -- fall
            # through to the XLA bin-matmul below
            xr = xr.reshape(bins, m, d)
            xi = xi.reshape(bins, m, d)
    if ycat is None and not quant and use_pallas and _binmm_vmem_ok(
        128, _round_up(m, 8), _round_up(k, 128)
    ):
        ycat = _binmm_pallas(xr, xi, bank.w2)  # [2, bins, m, K]
    if ycat is None:
        if xr.ndim == 4:
            xr = xr.reshape(bins, m, d)
            xi = xi.reshape(bins, m, d)
        x2 = jnp.concatenate(
            [
                jnp.concatenate([xr, xi], axis=2),  # rows 0:m  -> yr
                jnp.concatenate([xi, -xr], axis=2),  # rows m:2m -> yi
            ],
            axis=1,
        )  # [bins, 2m, 2D]
        y = jax.lax.dot_general(
            x2, bank.w2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )
        if quant:
            y = y.astype(jnp.float32) * sc[:, None, :]
        y = y.astype(mm)  # [bins, 2m, K]
        ycat = jnp.stack([y[:, :m], y[:, m:]])  # [2, bins, m, K]

    # The fused iDFT kernel needs its K tile lane-aligned (or the whole
    # [2*bins, m*K] array as one block when m == 1); small banks fall
    # back to the XLA epilogue.
    if use_pallas and hop % 8 == 0 and (k % 128 == 0 or m == 1):
        from template_speech_recognition_tpu.ops.fft_idft_pallas import (
            fft_idft_pallas,
        )

        scores_t = fft_idft_pallas(
            ycat.reshape(2 * bins, m * k), imat, bank.c, nblk
        )  # [B, nblk*hop, K] time-major, iDFT + reassembly + (+c) fused
        if time_major:
            return scores_t if not trim else scores_t[:, :tout]
        return jnp.swapaxes(scores_t[:, :tout], 1, 2)
    # XLA epilogue (CPU path, or explicit nfft override with
    # sublane-unaligned hop)
    scores = jax.lax.dot_general(
        imat.T, ycat.reshape(2 * bins, m * k),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [hop, m*K]
    scores = scores.reshape(hop, b, nblk, k)
    if time_major:
        scores = jnp.transpose(scores, (1, 2, 0, 3)).reshape(
            b, nblk * hop, k
        )
        if not trim:
            return scores + bank.c[None, None, :]
        return scores[:, :tout] + bank.c[None, None, :]
    scores = jnp.transpose(scores, (1, 3, 2, 0)).reshape(b, k, nblk * hop)
    return scores[:, :, :tout] + bank.c[None, :, None]
