"""Pallas TPU kernel: fused inverse-DFT epilogue for the
frequency-domain scorer (``detect.fft_scorer``).

Replaces the inverse-DFT GEMM, the blocks->time reassembly transpose,
and the per-template score-offset add with one kernel.  Each grid step
computes one (block j, K-tile) score tile as

    imat^T @ Y_tile + c        ->  [hop, bk]

and writes it straight into a TIME-MAJOR [B, nblk*hop, K] output via
the index map (j // nblk, j % nblk, kt).  Time-major is the trick: the
tile's sublane axis is hop (any multiple of 8) and its lane axis is
the K tile (multiple of 128), so no lane-alignment constraint falls on
hop and the kernel engages at the default nfft = 255 (hop = 224).  The
caller pays one cheap [B, T, K] -> [B, K, T] transpose at the end --
far cheaper than the GEMM + 4-D transpose + bias passes this replaces.

Shape contract: hop % 8 == 0; K % bk == 0 (bk falls back to K).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(y_ref, imat_ref, c_ref, out_ref):
    acc = jax.lax.dot_general(
        imat_ref[:, :],                  # [2*bins, hop]
        y_ref[:, :],                     # [2*bins, bk]
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                    # [hop, bk]
    out_ref[0] = acc + c_ref[0][None, :]


@functools.partial(
    jax.jit, static_argnames=("nblk", "bk", "interpret", "vmem_limit")
)
def fft_idft_pallas(
    ycat: jnp.ndarray,
    imat: jnp.ndarray,
    c: jnp.ndarray,
    nblk: int,
    bk: int = 1024,
    interpret: bool | None = None,
    vmem_limit: int | None = 100 * 1024 * 1024,
) -> jnp.ndarray:
    """ycat [2*bins, m*K] x imat [2*bins, hop] + c [K]
    -> scores [B, nblk*hop, K] (TIME-major), where m = B*nblk and ycat
    columns are (block-major, template-minor).

    (A 4-D ycat [2, bins, m, K] input was tried and reverted: Mosaic
    requires the last-two block dims 8/128-aligned, which a per-m
    block of that shape cannot satisfy, and the (8,128) tiling of the
    merged [2*bins, m*K] view differs physically from the 4-D
    producer's anyway -- the ~0.14 ms relayout XLA inserts here is
    already at HBM bandwidth.)"""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hop = imat.shape[1]
    k = c.shape[0]
    two_bins, mk = ycat.shape
    if two_bins != imat.shape[0]:
        raise ValueError(f"ycat rows {two_bins} != imat rows {imat.shape[0]}")
    if mk % k:
        raise ValueError(f"ycat cols {mk} not a multiple of K {k}")
    m = mk // k
    if m % nblk:
        raise ValueError(f"m {m} not a multiple of nblk {nblk}")
    if hop % 8:
        raise ValueError(f"hop {hop} not sublane-aligned")
    b = m // nblk
    if k % bk:
        bk = 128 if k % 128 == 0 else k
    nk = k // bk
    grid = (m, nk)
    y_spec = pl.BlockSpec(
        (two_bins, bk),
        lambda j, kt, _nk=nk: (0, j * _nk + kt),
        memory_space=pltpu.VMEM,
    )

    flops = 2 * two_bins * m * k * hop
    bytes_accessed = (
        ycat.size * ycat.dtype.itemsize
        + imat.size * imat.dtype.itemsize * m
        + b * k * nblk * hop * 4
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, nblk * hop, k), jnp.float32),
        grid=grid,
        in_specs=[
            y_spec,
            pl.BlockSpec(
                (two_bins, hop), lambda j, kt: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk), lambda j, kt: (0, kt), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hop, bk),
            lambda j, kt, _nblk=nblk: (j // _nblk, j % _nblk, kt),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(ycat, imat, c.reshape(1, k).astype(jnp.float32))
