"""Pallas TPU wavefront kernel for banded DTW (BASELINE.json:5 "DTW /
dynamic-programming alignment kernel in Pallas using wavefront
(anti-diagonal) parallelism"; SURVEY.md section 3.3).

Recurrence (same contract as ``align.dtw.banded_dtw`` / the oracle):

    D[i, j] = cost[i, j] + min(D[i-1, j], D[i, j-1], D[i-1, j-1])
    banded:  |j*(L-1) - i*(M-1)| <= band*(L-1), M = valid cols

Band-bounded design (round-2; the round-1 kernel materialized the full
skewed [L+M-1, L] cost per pair in VMEM -- O(L*M) regardless of band):

* **Band-compressed diagonals.** For anti-diagonal k the in-band rows
  form one contiguous interval [ilo(k), ihi(k)] of width <= W =
  min(2*band+1, L), so the host side packs the cost as
  ``skband[n, k, l] = cost[ilo(k)+l, k-ilo(k)-l]`` -- the HBM stream
  and the lane extent scale with the BAND, not the segment length.
* **Chunked wavefront grid.** The grid is (pair blocks, diagonal
  chunks); each step streams one [bp, ck, W] cost chunk into VMEM
  while the DP state (two previous band diagonals + the band cursor)
  persists in scratch across chunks.  VMEM is therefore independent of
  M; arbitrarily long segments stream.
* **Division-free band cursor.** ilo(k) advances by 0 or 1 per
  diagonal; the kernel tracks it incrementally per pair (one multiply
  + two compares), avoiding integer division, which Mosaic does not
  vectorize.  Lane l of diagonal k-1 holds row ilo(k-1)+l, so the
  D[i-1, *] / D[i, j-1] terms are one-lane ``pltpu.roll``s selected by
  the per-pair advance d1 in {0, 1} (and d2 in {0, 1, 2} two diagonals
  back), with wrapped lanes masked to +inf.
* Variable segment lengths ride in as a [P, 1] vector; the final cell
  (L-1, seg_len-1) always lands on lane 0 of diagonal L-1+seg_len-1
  (its band interval is the single row L-1).
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
    (out-of-range cells = _INF).  Kept as the un-banded reference
    layout (tests); the kernel itself consumes ``band_skew_cost``."""
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


def band_ilo(k, mlen, length: int, band: int):
    """First in-band row of anti-diagonal ``k`` (closed form; the
    kernel computes the same value incrementally).  ``k`` [K] int32,
    ``mlen`` [N] int32 -> [N, K] int32."""
    lm1 = jnp.int32(max(length - 1, 1))
    mm1 = jnp.maximum(mlen - 1, 1).astype(jnp.int32)[:, None]    # [N, 1]
    k = k.astype(jnp.int32)[None, :]                             # [1, K]
    denom = lm1 + mm1
    c = ((k - band) * lm1 + denom - 1) // denom                  # ceil
    c = jnp.maximum(c, 0)
    return jnp.maximum(c, k - (mlen.astype(jnp.int32)[:, None] - 1))


def band_skew_cost(
    cost: jnp.ndarray,        # [N, L, M_pad]
    seg_lens: jnp.ndarray,    # [N] int32
    band: int,
    k_pad: int,
) -> jnp.ndarray:             # [N, k_pad, W]
    """Band-compressed skew: out[n, k, l] = cost[n, i, k-i] at
    i = ilo(k)+l, +inf outside the band/rectangle."""
    n, length, m_pad = cost.shape
    w = min(2 * band + 1, length)
    lm1 = jnp.int32(max(length - 1, 1))
    mlen = seg_lens.astype(jnp.int32)
    mm1 = jnp.maximum(mlen - 1, 1)[:, None, None]
    ks = jnp.arange(k_pad, dtype=jnp.int32)
    ilo = band_ilo(ks, mlen, length, band)[:, :, None]           # [N, K, 1]
    ls = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    i = ilo + ls                                                 # [N, K, W]
    j = ks[None, :, None] - i
    valid = (
        (i < length)
        & (j >= 0)
        & (j < mlen[:, None, None])
        & (jnp.abs(j * lm1 - i * mm1) <= jnp.int32(band) * lm1)
    )
    idx = i * m_pad + jnp.clip(j, 0, m_pad - 1)
    idx = jnp.clip(idx, 0, length * m_pad - 1)
    gathered = jnp.take_along_axis(
        cost.reshape(n, length * m_pad), idx.reshape(n, -1), axis=1
    ).reshape(n, k_pad, w)
    return jnp.where(valid, gathered, _INF)


def _kernel(skband_ref, mlen_ref, out_ref, prev_ref, prev2_ref,
            ilo1_ref, ilo2_ref, *, length: int, band: int, w: int, ck: int):
    bp = skband_ref.shape[0]
    chunk = pl.program_id(1)
    l_lane = jax.lax.broadcasted_iota(jnp.int32, (bp, w), 1)
    mlen = mlen_ref[:, :].astype(jnp.int32)                        # [bp, 1]
    lm1 = jnp.int32(max(length - 1, 1))
    mm1 = jnp.maximum(mlen - 1, 1)
    final_k = jnp.int32(length - 1) + mlen - 1                     # [bp, 1]

    @pl.when(chunk == 0)
    def _init():
        prev_ref[:, :] = jnp.full((bp, w), _INF)
        prev2_ref[:, :] = jnp.full((bp, w), _INF)
        out_ref[:, :] = jnp.full((bp, 1), _INF)
        ilo1_ref[:, :] = jnp.zeros((bp, 1), jnp.int32)  # ilo(k-1)
        ilo2_ref[:, :] = jnp.zeros((bp, 1), jnp.int32)  # ilo(k-2)

    def step(kk, _):
        k = chunk * ck + kk
        ilo_p = ilo1_ref[:, :]                                     # ilo(k-1)
        ilo_pp = ilo2_ref[:, :]                                    # ilo(k-2)
        # ilo(k) = ilo(k-1) + (1 if row ilo(k-1) fell below the band /
        # rectangle at diagonal k); advances by at most 1 per diagonal.
        j_at = k - ilo_p
        inc = (j_at > mlen - 1) | (j_at * lm1 - ilo_p * mm1 > jnp.int32(band) * lm1)
        ilo_k = ilo_p + inc.astype(jnp.int32)                      # [bp, 1]
        d1 = ilo_k - ilo_p                                         # {0, 1}
        d2 = ilo_k - ilo_pp                                        # {0, 1, 2}
        i = ilo_k + l_lane                                         # [bp, w]
        j = k - i
        valid = (
            (i < length) & (j >= 0) & (j < mlen)
            & (jnp.abs(j * lm1 - i * mm1) <= jnp.int32(band) * lm1)
        )
        cost_d = skband_ref[:, kk, :]                              # [bp, w]
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        # D[i-1, j]  = prev diag, lane l + d1 - 1
        pu = jnp.where(d1 == 1, prev, pltpu.roll(prev, 1, 1))
        pu = jnp.where(l_lane + d1 - 1 >= 0, pu, _INF)
        # D[i, j-1]  = prev diag, lane l + d1
        ps = jnp.where(d1 == 0, prev, pltpu.roll(prev, (w - 1) % w, 1))
        ps = jnp.where(l_lane + d1 <= w - 1, ps, _INF)
        # D[i-1, j-1] = prev2 diag, lane l + d2 - 1
        p2 = jnp.where(
            d2 == 1,
            prev2,
            jnp.where(
                d2 == 0,
                pltpu.roll(prev2, 1, 1),
                pltpu.roll(prev2, (w - 1) % w, 1),
            ),
        )
        rd2 = l_lane + d2 - 1
        p2 = jnp.where((rd2 >= 0) & (rd2 <= w - 1), p2, _INF)
        best = jnp.minimum(jnp.minimum(pu, ps), p2)
        best = jnp.where((i == 0) & (j == 0), 0.0, best)
        diag = jnp.where(valid, cost_d + best, _INF)
        diag = jnp.minimum(diag, _INF)             # clamp inf+x overflow
        # Final cell (L-1, mlen-1) is always lane 0 of its diagonal
        # (ilo there == L-1: the band interval is the single last row).
        out_ref[:, :] = jnp.where(
            k == final_k, diag[:, :1], out_ref[:, :]
        )
        prev2_ref[:, :] = prev
        prev_ref[:, :] = diag
        ilo2_ref[:, :] = ilo_p
        ilo1_ref[:, :] = ilo_k
        return 0

    jax.lax.fori_loop(0, ck, step, 0)


def _round_up(n: int, q: int) -> int:
    return ((n + q - 1) // q) * q


@functools.partial(
    jax.jit,
    static_argnames=("band", "block_pairs", "chunk_diags", "interpret"),
)
def banded_dtw_pallas(
    cost: jnp.ndarray,      # [N, L, M] float32 (N = batch of pairs)
    seg_lens: jnp.ndarray,  # [N] int32 valid columns per pair
    band: int,
    block_pairs: int = 8,
    chunk_diags: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:           # [N] float32: D[L-1, seg_len-1]
    """Batched banded-DTW terminal costs, wavefront-parallel in Pallas.

    Out-of-band / unreachable pairs return _INF (~3e38), matching the
    jnp path's +inf up to the finite clamp.  VMEM per step is
    O(block_pairs * chunk_diags * min(2*band+1, L)) -- independent of
    the segment length M, which only sets the number of streamed
    diagonal chunks (SURVEY.md section 5 long-context row: "banded
    wavefront execution bounds memory to the band").
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, length, m = cost.shape
    if n % block_pairs:
        raise ValueError(f"n={n} not divisible by block_pairs={block_pairs}")
    w = min(2 * band + 1, length)
    k_diag = length + m - 1
    ck = min(chunk_diags, _round_up(k_diag, 8))
    k_pad = _round_up(k_diag, ck)
    skband = band_skew_cost(
        cost.astype(jnp.float32), seg_lens, band, k_pad
    )
    mlen = seg_lens.astype(jnp.int32).reshape(n, 1)
    grid = (n // block_pairs, k_pad // ck)
    out = pl.pallas_call(
        functools.partial(_kernel, length=length, band=band, w=w, ck=ck),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_pairs, ck, w),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_pairs, 1), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_pairs, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_pairs, w), jnp.float32),
            pltpu.VMEM((block_pairs, w), jnp.float32),
            pltpu.VMEM((block_pairs, 1), jnp.int32),
            pltpu.VMEM((block_pairs, 1), jnp.int32),
        ],
        interpret=interpret,
    )(skband, mlen)
    return out.reshape(n)
