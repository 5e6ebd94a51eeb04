"""Pallas TPU kernel: fused inverse-DFT epilogue for the
frequency-domain scorer (``detect.fft_scorer``).

Replaces three XLA passes with one kernel:

  * the inverse-DFT GEMM  [hop, 2*bins] @ [2*bins, m*K]
  * the [hop, B, nblk, K] -> [B, K, nblk*hop] transpose (a ~200 MB
    HBM round trip at the bench shape)
  * the per-template score offset add (+c)

Each grid step computes one (block j, K-tile) output tile as
``Y_tile^T @ imat + c`` -- a [bk, 2*bins] @ [2*bins, hop] matmul whose
result is ALREADY in the caller's [B, K, T] layout, written straight
to its (utterance, K-tile, block) slot via the output index map
(j // nblk, kt, j % nblk).  No transpose pass exists at all.

Shape contract: K % bk == 0; 2*bins is the contraction (any size the
MXU takes; the scorer keeps it lane-aligned at 256 via odd nfft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, imat_ref, c_ref, out_ref):
    acc = jax.lax.dot_general(
        y_ref[:, :],                     # [2*bins, bk]
        imat_ref[:, :],                  # [2*bins, hop]
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                    # [bk, hop]
    out_ref[0] = acc + c_ref[0][:, None]


@functools.partial(jax.jit, static_argnames=("nblk", "bk", "interpret"))
def fft_idft_pallas(
    ycat: jnp.ndarray,
    imat: jnp.ndarray,
    c: jnp.ndarray,
    nblk: int,
    bk: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """ycat [2*bins, m*K] x imat [2*bins, hop] + c [K]
    -> scores [B, K, nblk*hop], where m = B*nblk and ycat columns are
    (block-major, template-minor)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    two_bins, mk = ycat.shape
    hop = imat.shape[1]
    k = c.shape[0]
    if mk % k:
        raise ValueError(f"ycat cols {mk} not a multiple of K {k}")
    m = mk // k
    if m % nblk:
        raise ValueError(f"m {m} not a multiple of nblk {nblk}")
    b = m // nblk
    if k % bk:
        bk = 128 if k % 128 == 0 else k
    nk = k // bk
    grid = (m, nk)

    flops = 2 * two_bins * mk * hop
    bytes_accessed = (
        ycat.size * ycat.dtype.itemsize
        + imat.size * imat.dtype.itemsize * m
        + b * k * nblk * hop * 4
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, k, nblk * hop), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (two_bins, bk),
                lambda j, kt, _nk=nk: (0, j * _nk + kt),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (two_bins, hop), lambda j, kt: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk), lambda j, kt: (0, kt), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bk, hop),
            lambda j, kt, _nblk=nblk: (j // _nblk, kt, j % _nblk),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ycat, imat, c.reshape(1, k).astype(jnp.float32))
