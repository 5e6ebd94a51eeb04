"""Pallas TPU kernel: fused overlap-save blocking + forward DFT for
the frequency-domain scorer (``detect.fft_scorer``).

Replaces four XLA passes with one kernel:

  * the zero-pad of the utterance tail out to ``nblk * hop + L - 1``
    frames (a ~200 MB HBM round trip at the bench shape) -- tail
    windows are zero-filled in VMEM instead;
  * overlap-save block extraction (chunk/halo concats);
  * the [m, nfft, D] -> [nfft, m*D] transpose;
  * the forward DFT GEMM  [2*bins, nfft] @ [nfft, m*D].

Per grid step (utterance b, D-chunk c) the whole UNPADDED utterance
column [t, dc] sits in VMEM (auto-pipelined by the BlockSpec), and the
nblk overlapping windows are STATIC slices at multiples of hop --
overlap costs nothing, no transpose or padded copy is ever
materialized, and each window hits the MXU as one
[nfft, 2*bins]^T @ [nfft, dc] GEMM against the combined cos/-sin DFT
matrix.  Windows overrunning ``t`` (only the last one or two) are
completed with a VMEM zeros concat.

Outputs xr, xi are written [bins, B, nblk, D] -- exactly the 4-D
layout the fused bin-matmul kernel (``ops.fft_binmm_pallas``) consumes
directly, so no reshape/relayout exists between the two pallas calls.

Shape contract (callers fall back to the XLA path otherwise):
  hop % 16 == 0            (bf16 sublane alignment of window slices)
  D % dc == 0
  t * dc * 2 <= ~4 MB      (utterance column fits VMEM)
  (nblk - 1) * hop < t <= nblk * hop + L - 1
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, g_ref, xr_ref, xi_ref, *, nblk: int, hop: int, nfft: int,
            bins: int, t: int):
    for i in range(nblk):  # static unroll: slice offsets known to Mosaic
        start = i * hop
        avail = min(nfft, t - start)                           # static
        xe = xp_ref[0, start : start + avail, :]               # [avail, dc]
        if avail < nfft:  # tail window: zero-fill beyond the utterance
            xe = jnp.concatenate(
                [xe, jnp.zeros((nfft - avail, xe.shape[1]), xe.dtype)],
                axis=0,
            )
        xf = jax.lax.dot_general(
            g_ref[:, :],                                        # [nfft, 2*bins]
            xe,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [2*bins, dc]
        xr_ref[:, 0, i, :] = xf[:bins].astype(xr_ref.dtype)
        xi_ref[:, 0, i, :] = xf[bins:].astype(xi_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "hop", "nblk", "dc", "interpret", "vmem_limit"),
)
def fft_block_dft_pallas(
    xp: jnp.ndarray,
    g: jnp.ndarray,
    nfft: int,
    hop: int,
    nblk: int,
    dc: int = 256,
    interpret: bool | None = None,
    vmem_limit: int | None = 100 * 1024 * 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """xp [B, t, D] (audio features; the tail window is zero-filled
    in-kernel, no pre-padding) x g [nfft, 2*bins] (cos | -sin DFT
    matrix) -> xr, xi [bins, B, nblk, D] block spectra."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, d = xp.shape
    bins = g.shape[1] // 2
    if d % dc:
        raise ValueError(f"D {d} not a multiple of dc {dc}")
    if hop % 16:
        raise ValueError(f"hop {hop} not sublane-aligned")
    if t <= (nblk - 1) * hop:
        raise ValueError("last window starts beyond the utterance")
    if t > nblk * hop + nfft - hop:  # tneed = nblk*hop + halo
        raise ValueError(f"t {t} overruns the {nblk}-block decomposition")
    grid = (b, d // dc)

    flops = 2 * b * nblk * nfft * 2 * bins * d
    bytes_accessed = (
        xp.size * xp.dtype.itemsize
        + g.size * g.dtype.itemsize * b
        + 2 * bins * b * nblk * d * 2
    )
    # Output dtype follows the input compute dtype (bf16 on TPU, f32 on
    # the CPU parity path) so interpret-mode results match the XLA twin.
    out_shape = jax.ShapeDtypeStruct((bins, b, nblk, d), xp.dtype)
    return pl.pallas_call(
        functools.partial(
            _kernel, nblk=nblk, hop=hop, nfft=nfft, bins=bins, t=t
        ),
        out_shape=(out_shape, out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, t, dc), lambda i, c: (i, 0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nfft, 2 * bins), lambda i, c: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (bins, 1, nblk, dc),
                lambda i, c: (0, i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bins, 1, nblk, dc),
                lambda i, c: (0, i, 0, c),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        # The default scoped-vmem budget (16 MB on v5e) is smaller than
        # the resident column + double-buffered outputs at dc=512; with
        # the default the compiler silently drops to single buffering
        # and the kernel runs ~2x off its bandwidth bound.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(xp, g)
