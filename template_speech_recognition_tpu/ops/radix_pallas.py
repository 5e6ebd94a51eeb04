"""Pallas TPU kernel: fused counting pass for the radix order
statistic (``frontend.planes.plane_order_statistics``).

Each radix-select level counts, for every (row, candidate) pair, how
many keys satisfy ``(key >> shift) <= cand``.  Expressed in XLA this
is a broadcast compare ``[R, NC, N]`` reduced over N -- the compiler
re-streams the key tensor for groups of candidates, and the measured
level cost is ~10x the single-read roofline (the quantile was 9.3 ms
of the 11.9 ms frontend at the bench shape, bench_frontend_stages.py).

Kernel structure (the part that matters on the VPU):

* the grid walks N tiles; each [R, NT] key tile is compared against
  all NC candidates from registers, so keys stream from HBM exactly
  once per level;
* the hot loop has NO cross-lane reductions and NO strided stores --
  counts accumulate per lane into an [NC*R, 128] VMEM scratch (the
  candidate's [R, 128] accumulator lives in vregs across the chunk
  loop), and the 128-lane collapse happens once, in XLA, on the tiny
  [NC*R, 128] output.  A first cut that reduced across lanes per
  candidate per tile was 2x slower than the XLA broadcast compare;
  this layout is ~4x faster.

Padding cells/rows are filled with 0xFFFFFFFF, the same mask value
``plane_order_statistics`` assigns invalid cells: such keys count
toward a candidate only when the candidate's prefix is all-ones at
the current granularity -- i.e. only toward the widest candidate,
which reaches the required rank with or without them -- so the
selected digit (and hence the selected element) is unaffected,
exactly as in the XLA counting path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _count_kernel(keys_ref, cand_ref, out_ref, *, shift, nc, r):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    hi = keys_ref[...] >> jnp.uint32(shift)        # [R, NT]
    cand = cand_ref[...]                           # [R, NC]
    nchunk = hi.shape[1] // 128
    for j in range(nc):
        cj = cand[:, j][:, None]                   # [R, 1] lane-broadcast
        total = (hi[:, :128] <= cj).astype(jnp.int32)
        for c in range(1, nchunk):
            seg = hi[:, c * 128 : (c + 1) * 128]
            total += (seg <= cj).astype(jnp.int32)
        out_ref[j * r : (j + 1) * r, :] += total


@functools.partial(
    jax.jit, static_argnames=("shift", "block_n", "interpret")
)
def radix_level_counts_pallas(
    keys: jnp.ndarray,       # [R, N] uint32 (monotone order keys)
    cand: jnp.ndarray,       # [R, NC] uint32 candidate prefixes
    shift: int,
    block_n: int = 8192,
    interpret: bool | None = None,
) -> jnp.ndarray:            # [R, NC] int32: #(keys>>shift <= cand)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    r, n = keys.shape
    nc = cand.shape[1]
    r_pad = -(-r // 8) * 8
    n_pad = -(-n // block_n) * block_n
    if r_pad != r or n_pad != n:
        keys = jnp.pad(
            keys, ((0, r_pad - r), (0, n_pad - n)),
            constant_values=jnp.uint32(0xFFFFFFFF),
        )
    if r_pad != r:
        cand = jnp.pad(cand, ((0, r_pad - r), (0, 0)))
    lanes = pl.pallas_call(
        functools.partial(_count_kernel, shift=shift, nc=nc, r=r_pad),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((r_pad, block_n), lambda i: (0, i)),
            pl.BlockSpec((r_pad, nc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nc * r_pad, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc * r_pad, 128), jnp.int32),
        interpret=interpret,
    )(keys, cand)
    # tiny final collapse: [NC, R, 128] -> [R, NC]
    return jnp.sum(lanes.reshape(nc, r_pad, 128), axis=-1).T[:r]
