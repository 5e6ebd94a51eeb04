"""Pallas TPU kernel: fused overlap-save blocking + forward DFT for
the frequency-domain scorer (``detect.fft_scorer``).

Replaces three XLA passes with one kernel:

  * overlap-save block extraction (chunk/halo concats)
  * the [m, nfft, D] -> [nfft, m*D] transpose (~200 MB round trip)
  * the forward DFT GEMM  [2*bins, nfft] @ [nfft, m*D]

Per grid step (utterance b, D-chunk c) the whole padded utterance
column [tneed, dc] sits in VMEM (auto-pipelined by the BlockSpec), and
the nblk overlapping windows are STATIC slices at multiples of hop --
overlap costs nothing, no transpose is ever materialized, and each
window hits the MXU as one [nfft, 2*bins]^T @ [nfft, dc] GEMM against
the combined cos/-sin DFT matrix.

Outputs xr, xi are written [bins, B, nblk, D] (block = one utterance x
one D-chunk), which reshapes for free to the [bins, m, D] layout the
fused bin-matmul kernel (``ops.fft_binmm_pallas``) consumes.

Shape contract (callers fall back to the XLA path otherwise):
  hop % 16 == 0            (bf16 sublane alignment of window slices)
  D % dc == 0
  tneed * dc * 2 <= ~4 MB  (utterance column fits VMEM)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, g_ref, xr_ref, xi_ref, *, nblk: int, hop: int, nfft: int,
            bins: int):
    for i in range(nblk):  # static unroll: slice offsets known to Mosaic
        xe = xp_ref[0, i * hop : i * hop + nfft, :]            # [nfft, dc]
        xf = jax.lax.dot_general(
            g_ref[:, :],                                        # [nfft, 2*bins]
            xe,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [2*bins, dc]
        xr_ref[:, 0, i, :] = xf[:bins].astype(xr_ref.dtype)
        xi_ref[:, 0, i, :] = xf[bins:].astype(xi_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nfft", "hop", "nblk", "dc", "interpret")
)
def fft_block_dft_pallas(
    xp: jnp.ndarray,
    g: jnp.ndarray,
    nfft: int,
    hop: int,
    nblk: int,
    dc: int = 256,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """xp [B, tneed, D] (zero-padded audio features) x g [nfft, 2*bins]
    (cos | -sin DFT matrix) -> xr, xi [bins, B, nblk, D] block spectra."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, tneed, d = xp.shape
    bins = g.shape[1] // 2
    if d % dc:
        raise ValueError(f"D {d} not a multiple of dc {dc}")
    if hop % 16:
        raise ValueError(f"hop {hop} not sublane-aligned")
    if (nblk - 1) * hop + nfft > tneed:
        raise ValueError("windows overrun the padded utterance")
    grid = (b, d // dc)

    flops = 2 * b * nblk * nfft * 2 * bins * d
    bytes_accessed = (
        xp.size * xp.dtype.itemsize
        + g.size * g.dtype.itemsize * b
        + 2 * bins * b * nblk * d * 2
    )
    out_shape = jax.ShapeDtypeStruct((bins, b, nblk, d), jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(
            _kernel, nblk=nblk, hop=hop, nfft=nfft, bins=bins
        ),
        out_shape=(out_shape, out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tneed, dc), lambda i, c: (i, 0, c), memory_space=pltpu.VMEM
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
        interpret=interpret,
    )(xp, g)
