"""Pallas TPU wavefront kernel for banded DTW (BASELINE.json:5 "DTW /
dynamic-programming alignment kernel in Pallas using wavefront
(anti-diagonal) parallelism"; SURVEY.md section 3.3).

Recurrence (same contract as ``align.dtw.banded_dtw`` / the oracle):

    D[i, j] = cost[i, j] + min(D[i-1, j], D[i, j-1], D[i-1, j-1])
    banded:  |j*(L-1) - i*(M-1)| <= band*(L-1), M = valid cols

Design:

* The cost matrix is **pre-skewed** on the XLA side so anti-diagonal k
  is the contiguous row ``skewed[k, :]`` (skewed[k, i] = cost[i, k-i]).
  The kernel then never gathers: each wavefront step is pure VPU work
  on an [P, L] tile of P pairs, with D[i-1, *] terms produced by a
  one-lane shift (``pltpu.roll`` + first-lane mask).
* Grid over tiles of P (template, segment) pairs; the whole DP state
  (two previous diagonals + per-pair result) lives in registers/VMEM
  for the full wavefront -- zero HBM traffic between steps.
* Variable segment lengths: per-pair ``seg_len`` rides in as a [P]
  vector; band/rectangle masks and the final-cell extraction
  (k == L-1 + seg_len-1, row L-1) are lane-masked ``where``s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # finite stand-in for +inf: inf-inf NaNs are avoided


def skew_cost(cost: jnp.ndarray) -> jnp.ndarray:
    """[..., L, M] -> [..., L+M-1, L] with skewed[..., k, i] = cost[..., i, k-i]
    (out-of-range cells = _INF)."""
    length, m = cost.shape[-2], cost.shape[-1]
    k_diag = length + m - 1
    ks = jnp.arange(k_diag)[:, None]
    is_ = jnp.arange(length)[None, :]
    js = ks - is_                                  # [K_diag, L]
    valid = (js >= 0) & (js < m)
    flat = cost.reshape(cost.shape[:-2] + (length * m,))
    idx = (is_ * m + jnp.clip(js, 0, m - 1)).reshape(-1)
    gathered = jnp.take(flat, idx, axis=-1).reshape(
        cost.shape[:-2] + (k_diag, length)
    )
    return jnp.where(valid, gathered, _INF)


def _kernel(skew_ref, mlen_ref, out_ref, prev_ref, prev2_ref, result_ref,
            *, length: int, band: int, k_diag: int):
    p = skew_ref.shape[0]
    i_lane = jax.lax.broadcasted_iota(jnp.int32, (p, length), 1)
    mlen = mlen_ref[:, :].astype(jnp.int32)                        # [P, 1]
    lm1 = jnp.int32(max(length - 1, 1))
    mm1 = jnp.maximum(mlen - 1, 1)
    final_k = lm1 + mlen - 1                                       # [P, 1]

    # DP state lives in VMEM scratch (loop-carrying splat-initialized
    # vectors trips a Mosaic layout-unification bug).
    prev_ref[:, :] = jnp.full((p, length), _INF)
    prev2_ref[:, :] = jnp.full((p, length), _INF)
    result_ref[:, :] = jnp.full((p, length), _INF)

    def step(k, _):
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        cost_d = skew_ref[:, k, :]                                 # [P, L]
        j = k - i_lane
        in_rect = (j >= 0) & (j < mlen)
        in_band = jnp.abs(j * lm1 - i_lane * mm1) <= jnp.int32(band) * lm1
        # D[i-1, j] / D[i-1, j-1]: shift the diagonal one lane right.
        prev_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev, 1, 1))
        prev2_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev2, 1, 1))
        best = jnp.minimum(jnp.minimum(prev_up, prev), prev2_up)
        best = jnp.where((i_lane == 0) & (j == 0), 0.0, best)
        diag = jnp.where(in_rect & in_band, cost_d + best, _INF)
        diag = jnp.minimum(diag, _INF)             # clamp inf+x overflow
        hit = (k == final_k) & (i_lane == length - 1)
        result_ref[:, :] = jnp.where(hit, diag, result_ref[:, :])
        prev2_ref[:, :] = prev
        prev_ref[:, :] = diag
        return 0

    jax.lax.fori_loop(0, k_diag, step, 0)
    out_ref[:, :] = jnp.max(
        jnp.where(i_lane == length - 1, result_ref[:, :], -_INF), axis=1
    )[:, None]


@functools.partial(
    jax.jit, static_argnames=("band", "block_pairs", "interpret")
)
def banded_dtw_pallas(
    cost: jnp.ndarray,      # [N, L, M] float32 (N = batch of pairs)
    seg_lens: jnp.ndarray,  # [N] int32 valid columns per pair
    band: int,
    block_pairs: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:           # [N] float32: D[L-1, seg_len-1]
    """Batched banded-DTW terminal costs, wavefront-parallel in Pallas.

    Out-of-band / unreachable pairs return _INF (~3e38), matching the
    jnp path's +inf up to the finite clamp.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, length, m = cost.shape
    if n % block_pairs:
        raise ValueError(f"n={n} not divisible by block_pairs={block_pairs}")
    k_diag = length + m - 1
    skewed = skew_cost(cost.astype(jnp.float32))
    # Column-vector layouts: (bp, 1) blocks are sublane-tiled, which the
    # compiled Mosaic lowering accepts (lane-sliced (1, bp) blocks are
    # rejected: dynamic lane offsets must be 128-multiples).
    mlen = seg_lens.astype(jnp.int32).reshape(n, 1)
    grid = (n // block_pairs,)
    out = pl.pallas_call(
        functools.partial(_kernel, length=length, band=band, k_diag=k_diag),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_pairs, k_diag, length),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_pairs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_pairs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_pairs, length), jnp.float32),
            pltpu.VMEM((block_pairs, length), jnp.float32),
            pltpu.VMEM((block_pairs, length), jnp.float32),
        ],
        interpret=interpret,
    )(skewed, mlen)
    return out.reshape(n)
