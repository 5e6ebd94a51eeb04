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


def skew_cost_fast(cost: jnp.ndarray, k_pad: int) -> jnp.ndarray:
    """Gather-free batched skew: [N, L, M] -> [N, k_pad, L] with
    out[n, k, i] = cost[n, i, k-i] (out-of-range cells are zeros; the
    kernel masks them).  Pure pad + reshape + transpose -- the naive
    per-pair ``take_along_axis`` gather measured ~9x the whole DP
    kernel's device time."""
    n, length, m = cost.shape
    k_diag = length + m - 1
    b = jnp.pad(cost, ((0, 0), (0, 0), (0, length)))     # [N, L, M+L]
    flat = b.reshape(n, length * (m + length))[:, : length * (m + length - 1)]
    # flat[n, i*(M+L-1) + k] == cost[n, i, k-i] (pad zeros off-range)
    sk = flat.reshape(n, length, m + length - 1)[:, :, :k_diag]
    sk = jnp.swapaxes(sk, 1, 2)                          # [N, K_diag, L]
    if k_pad > k_diag:
        sk = jnp.pad(sk, ((0, 0), (0, k_pad - k_diag), (0, 0)))
    return sk


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


def _kernel_full(skew_ref, mlen_ref, out_ref, prev_ref, prev2_ref,
                 *, length: int, band: int, ck: int, single_chunk: bool):
    """Full-lane chunked wavefront: lanes over the L template rows
    (static layout -> gather-free skew input), band applied as a mask.
    On TPU this BEATS band-compressed lanes whenever
    round_up(2*band+1, 128) == round_up(L, 128): lane granularity is
    128, so sub-128 band widths save no VPU work, and the static
    layout avoids the per-pair dynamic band gather entirely."""
    bp = skew_ref.shape[0]
    # The single-chunk case (diagonals fit one streamed block -- the
    # common shape) uses a 1-D grid and unconditional init: the 2-D
    # revisited-output form compiles orders of magnitude slower in
    # Mosaic, so it is reserved for genuinely long segments.
    chunk = jnp.int32(0) if single_chunk else pl.program_id(1)
    i_lane = jax.lax.broadcasted_iota(jnp.int32, (bp, length), 1)
    mlen = mlen_ref[:, :].astype(jnp.int32)                        # [bp, 1]
    lm1 = jnp.int32(max(length - 1, 1))
    mm1 = jnp.maximum(mlen - 1, 1)
    final_k = jnp.int32(length - 1) + mlen - 1                     # [bp, 1]

    @pl.when(chunk == 0)
    def _init():
        prev_ref[:, :] = jnp.full((bp, length), _INF)
        prev2_ref[:, :] = jnp.full((bp, length), _INF)
        out_ref[:, :] = jnp.full((bp, 1), _INF)

    def step(kk, _):
        k = chunk * ck + kk
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        cost_d = skew_ref[:, kk, :]                                # [bp, L]
        j = k - i_lane
        in_rect = (j >= 0) & (j < mlen)
        in_band = jnp.abs(j * lm1 - i_lane * mm1) <= jnp.int32(band) * lm1
        prev_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev, 1, 1))
        prev2_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev2, 1, 1))
        best = jnp.minimum(jnp.minimum(prev_up, prev), prev2_up)
        best = jnp.where((i_lane == 0) & (j == 0), 0.0, best)
        diag = jnp.where(in_rect & in_band, cost_d + best, _INF)
        diag = jnp.minimum(diag, _INF)             # clamp inf+x overflow
        term = jnp.max(
            jnp.where(i_lane == length - 1, diag, -_INF), axis=1,
            keepdims=True,
        )
        out_ref[:, :] = jnp.where(k == final_k, term, out_ref[:, :])
        prev2_ref[:, :] = prev
        prev_ref[:, :] = diag
        return 0

    jax.lax.fori_loop(0, ck, step, 0)


def pack_skew_cost(cost: jnp.ndarray, k_pad: int, lp: int) -> jnp.ndarray:
    """Lane-packed gather-free skew: [N, L, M] -> [N//pack, k_pad, 128]
    with pack = 128 // lp pairs per 128-lane register, each occupying
    an lp-lane sub-block (out[r, k, q*lp + i] = cost[r*pack + q, i, k-i]).

    Same single XLA transpose as ``skew_cost_fast`` -- the packing is a
    different permutation of the identical data movement, so it costs
    no extra HBM traffic.  Rationale: at L = 32 the unpacked full
    layout leaves 3/4 of every VPU lane register (and 3/4 of every
    VMEM tile) empty; packing 128//lp pairs per register recovers that
    factor on the latency-bound wavefront (round-4 verdict, weak item
    2: dtw roofline_frac 0.043)."""
    n, length, m = cost.shape
    pack = 128 // lp
    k_diag = length + m - 1
    b = jnp.pad(cost, ((0, 0), (0, 0), (0, length)))     # [N, L, M+L]
    flat = b.reshape(n, length * (m + length))[:, : length * (m + length - 1)]
    # flat[n, i*(M+L-1) + k] == cost[n, i, k-i] (pad zeros off-range;
    # the kernel masks j out of range)
    sk = flat.reshape(n // pack, pack, length, m + length - 1)
    sk = sk[:, :, :, :k_diag]
    if k_pad > k_diag:
        sk = jnp.pad(sk, ((0, 0), (0, 0), (0, 0), (0, k_pad - k_diag)))
    if lp > length:
        sk = jnp.pad(sk, ((0, 0), (0, 0), (0, lp - length), (0, 0)))
    sk = jnp.transpose(sk, (0, 3, 1, 2))                 # [N/p, K, pack, lp]
    return sk.reshape(n // pack, k_pad, pack * lp)


def _kernel_packed(skew_ref, mlen_ref, out_ref, prev_ref, prev2_ref,
                   *, length: int, lp: int, band: int, ck: int,
                   single_chunk: bool):
    """Lane-packed full-layout wavefront: 128 // lp pairs share each
    [rows, 128] register row; sub-block q's lanes q*lp .. q*lp+lp-1
    hold template rows 0..lp-1 of its pair.  ``pltpu.roll`` wraps
    across sub-block boundaries, but every wrapped lane lands on
    i_lane == 0, which is masked to +inf exactly as the unpacked
    kernel masks its row-0 boundary -- so packing changes no value.
    The terminal cell is read out per lane (no in-kernel reduction):
    lane q*lp + L-1 of diagonal final_k(pair) holds D[L-1, M-1]; the
    host extracts it with one strided slice."""
    rows = skew_ref.shape[0]
    chunk = jnp.int32(0) if single_chunk else pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    i_lane = lane & jnp.int32(lp - 1)                     # lp is a power of 2
    mlen = mlen_ref[:, :].astype(jnp.int32)               # [rows, 128] per-lane
    lm1 = jnp.int32(max(length - 1, 1))
    mm1 = jnp.maximum(mlen - 1, 1)
    final_k = jnp.int32(length - 1) + mlen - 1

    @pl.when(chunk == 0)
    def _init():
        prev_ref[:, :] = jnp.full((rows, 128), _INF)
        prev2_ref[:, :] = jnp.full((rows, 128), _INF)
        out_ref[:, :] = jnp.full((rows, 128), _INF)

    def step(kk, _):
        k = chunk * ck + kk
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        cost_d = skew_ref[:, kk, :]                       # [rows, 128]
        j = k - i_lane
        valid = (j >= 0) & (j < mlen)
        if lp > length:
            valid &= i_lane < length
        valid &= jnp.abs(j * lm1 - i_lane * mm1) <= jnp.int32(band) * lm1
        prev_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev, 1, 1))
        prev2_up = jnp.where(i_lane == 0, _INF, pltpu.roll(prev2, 1, 1))
        best = jnp.minimum(jnp.minimum(prev_up, prev), prev2_up)
        best = jnp.where((i_lane == 0) & (j == 0), 0.0, best)
        diag = jnp.where(valid, cost_d + best, _INF)
        diag = jnp.minimum(diag, _INF)             # clamp inf+x overflow
        out_ref[:, :] = jnp.where(k == final_k, diag, out_ref[:, :])
        prev2_ref[:, :] = prev
        prev_ref[:, :] = diag
        return 0

    jax.lax.fori_loop(0, ck, step, 0)


def _kernel_band(skband_ref, mlen_ref, out_ref, prev_ref, prev2_ref,
                 ilo1_ref, ilo2_ref, *, length: int, band: int, w: int,
                 ck: int, single_chunk: bool):
    bp = skband_ref.shape[0]
    chunk = jnp.int32(0) if single_chunk else pl.program_id(1)
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
    static_argnames=(
        "band", "block_pairs", "chunk_diags", "interpret", "layout"
    ),
)
def banded_dtw_pallas(
    cost: jnp.ndarray,      # [N, L, M] float32 (N = batch of pairs)
    seg_lens: jnp.ndarray,  # [N] int32 valid columns per pair
    band: int,
    block_pairs: int | None = None,
    chunk_diags: int = 256,
    interpret: bool | None = None,
    layout: str | None = None,
) -> jnp.ndarray:           # [N] float32: D[L-1, seg_len-1]
    """Batched banded-DTW terminal costs, wavefront-parallel in Pallas.

    Out-of-band / unreachable pairs return _INF (~3e38), matching the
    jnp path's +inf up to the finite clamp.  The grid is (pair blocks,
    diagonal chunks) with the DP state carried in scratch, so VMEM per
    step is O(block_pairs * chunk_diags * lanes) -- independent of the
    segment length M, which only sets the number of streamed chunks
    (SURVEY.md section 5 long-context row).

    ``layout`` picks the diagonal packing:

    * ``"packed"`` -- the default whenever L <= 64: 128 // lp pairs
      (lp = next power of two >= L) share each 128-lane register, so
      a 2048-pair batch at L = 32 runs 4x more DP cells per VPU op
      and streams 4x denser VMEM tiles than ``"full"``, on the same
      single-transpose skew (``pack_skew_cost``).  Terminal cells read
      out per lane -- no in-kernel reduction.  Pairs pad internally to
      the block size (callers need no alignment).
    * ``"full"`` -- lanes over the L template rows; the skew is a
      gather-free pad+reshape+transpose and the band applies as a mask.
      The default whenever L fits the 128-lane register width that
      min(2*band+1, L) would also occupy: sub-128 band widths save no
      VPU work, and the band-compressed gather measured ~9x the DP
      kernel itself.
    * ``"band"`` -- lanes over the in-band interval (width
      min(2*band+1, L)): HBM stream and VPU rows scale with the band.
      Wins only when it saves whole 128-lane registers, i.e. large L
      with a narrow band; selected automatically then.

    ``block_pairs=None`` picks the largest power-of-two pair block
    (<= 512) whose streamed chunk fits a ~8 MB double-buffered VMEM
    budget: each wavefront step is one [bp, lanes] VPU op, so wide
    pair blocks amortize per-step latency.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, length, m = cost.shape
    w = min(2 * band + 1, length)
    lp = 8
    while lp < length:
        lp *= 2
    pack = 128 // lp if lp <= 64 else 1
    if layout is None:
        if pack > 1:
            layout = "packed"
        elif _round_up(w, 128) < _round_up(length, 128):
            layout = "band"
        else:
            layout = "full"
    if layout == "packed":
        return _banded_dtw_packed(
            cost, seg_lens, band, lp, block_pairs, chunk_diags, interpret
        )
    lanes = w if layout == "band" else length
    k_diag = length + m - 1
    ck = min(chunk_diags, _round_up(k_diag, 8))
    k_pad = _round_up(k_diag, ck)
    if block_pairs is None:
        lane_pad = _round_up(lanes, 128)
        # each wavefront step is one [bp, lanes] VPU op chain whose
        # per-step overhead dominates at narrow blocks; wider pair
        # blocks amortize it (measured +30% at bp=256 vs bp=64 at the
        # bench shape -- the sequential-diagonal chain itself, not
        # block width, is the remaining bound).  48 MB of streamed
        # double-buffered chunk; the chip has 128 MB VMEM and the
        # pallas call raises the default 16 MB scoped cap.
        budget = 48 * 1024 * 1024
        block_pairs = 8
        for bp in (2048, 1024, 512, 256, 128, 64, 32, 16):
            if n % bp == 0 and bp * ck * lane_pad * 4 * 2 <= budget:
                block_pairs = bp
                break
    if n % block_pairs:
        raise ValueError(f"n={n} not divisible by block_pairs={block_pairs}")
    mlen = seg_lens.astype(jnp.int32).reshape(n, 1)
    single = k_pad == ck
    if layout == "band":
        data = band_skew_cost(cost.astype(jnp.float32), seg_lens, band, k_pad)
        kernel = functools.partial(
            _kernel_band, length=length, band=band, w=w, ck=ck,
            single_chunk=single,
        )
        scratch = [
            pltpu.VMEM((block_pairs, w), jnp.float32),
            pltpu.VMEM((block_pairs, w), jnp.float32),
            pltpu.VMEM((block_pairs, 1), jnp.int32),
            pltpu.VMEM((block_pairs, 1), jnp.int32),
        ]
    else:
        data = skew_cost_fast(cost.astype(jnp.float32), k_pad)
        kernel = functools.partial(
            _kernel_full, length=length, band=band, ck=ck,
            single_chunk=single,
        )
        scratch = [
            pltpu.VMEM((block_pairs, length), jnp.float32),
            pltpu.VMEM((block_pairs, length), jnp.float32),
        ]
    if single:
        grid = (n // block_pairs,)
        in_specs = [
            pl.BlockSpec((block_pairs, ck, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_pairs, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec(
            (block_pairs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (n // block_pairs, k_pad // ck)
        in_specs = [
            pl.BlockSpec((block_pairs, ck, lanes), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_pairs, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec(
            (block_pairs, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(data, mlen)
    return out.reshape(n)


def _pair_llr_kernel(rowstart_ref, ids_ref, feats_ref, w_ref, out_ref,
                     seg_buf, w_buf, sems, *, bp: int, m: int):
    """Per-pair LLR cost tiles with DMA-fused gathers.

    Each pair p needs cost[i, j] = w[id_p, i] . feats[row_p + j] --
    round 5 measured the XLA route (gather segments, gather filter
    rows, batched GEMM) at ~2.0 ms per bench batch, ~5x the bytes'
    DMA time, because both gathers materialize 100+ MB intermediates.
    Here each pair's [m, D] feature window and [L, D] filter rows DMA
    straight from HBM into VMEM (double-buffered across pairs) and the
    [L, m] tile comes off one MXU dot -- nothing intermediate touches
    HBM except the small [N, L, m] cost output."""
    i = pl.program_id(0)

    m8 = m // 8

    def dma_pair(j, slot):
        # rowstart_ref holds 8-row TILE indices (Mosaic must prove the
        # HBM slice offset is tile-aligned; runtime values cannot be
        # proven, so feats arrive pre-viewed as [R/8, 8, D])
        pair = i * bp + j
        row8 = rowstart_ref[pair]
        kid = ids_ref[pair]
        seg = pltpu.make_async_copy(
            feats_ref.at[pl.ds(row8, m8)], seg_buf.at[slot],
            sems.at[slot, 0],
        )
        wv = pltpu.make_async_copy(
            w_ref.at[kid], w_buf.at[slot], sems.at[slot, 1],
        )
        seg.start()
        wv.start()
        return seg, wv

    dma_pair(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < bp)
        def _():
            dma_pair(j + 1, nxt)

        # re-constructing the copy descriptors waits on the same
        # semaphores the started copies signal
        pair = i * bp + j
        row8 = rowstart_ref[pair]
        kid = ids_ref[pair]
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(row8, m8)], seg_buf.at[slot],
            sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            w_ref.at[kid], w_buf.at[slot], sems.at[slot, 1],
        ).wait()
        d = w_buf.shape[-1]
        seg = seg_buf[slot].reshape(m, d)          # trivial collapse
        out_ref[j] = jax.lax.dot_general(
            w_buf[slot], seg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [L, m]
        return 0

    jax.lax.fori_loop(0, bp, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("m", "block_pairs",
                                             "interpret"))
def pair_llr_pallas(
    feats_flat: jnp.ndarray,   # [R, D] bf16, R % 8 == 0,
                               # R >= max(rowstart8)*8 + m
    w: jnp.ndarray,            # [K, L, D] bf16
    rowstart8: jnp.ndarray,    # [N] int32 flat row starts / 8 (aligned)
    ids: jnp.ndarray,          # [N] int32 template ids
    m: int,                    # window rows, % 8 == 0
    block_pairs: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:              # [N, L, m] f32
    """LLR cost tiles for verify-the-winner DTW (see _pair_llr_kernel).
    N pads internally to the block size (extra pairs replay pair 0 and
    are sliced off).  Row starts arrive in 8-row tile units (callers
    copy from the aligned floor and shift columns afterwards)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = rowstart8.shape[0]
    k, length, d = w.shape
    r = feats_flat.shape[0]
    if m % 8 or r % 8:
        raise ValueError(f"m={m} and R={r} must be multiples of 8")
    bp = block_pairs
    n_pad = _round_up(n, bp)
    rowstart8 = rowstart8.astype(jnp.int32)
    ids = jnp.clip(ids.astype(jnp.int32), 0, k - 1)
    if n_pad != n:
        rowstart8 = jnp.concatenate(
            [rowstart8, jnp.zeros(n_pad - n, jnp.int32)]
        )
        ids = jnp.concatenate([ids, jnp.zeros(n_pad - n, jnp.int32)])
    feats8 = feats_flat.reshape(r // 8, 8, d)
    out = pl.pallas_call(
        functools.partial(_pair_llr_kernel, bp=bp, m=m),
        grid=(n_pad // bp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((bp, length, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, length, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, m // 8, 8, d), feats_flat.dtype),
            pltpu.VMEM((2, length, d), w.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rowstart8, ids, feats8, w)
    return out[:n]


def _banded_dtw_packed(
    cost: jnp.ndarray,       # [N, L, M] float32
    seg_lens: jnp.ndarray,   # [N] int32
    band: int,
    lp: int,
    block_pairs: int | None,
    chunk_diags: int,
    interpret: bool,
) -> jnp.ndarray:            # [N]
    """Lane-packed full-layout dispatch (see ``banded_dtw_pallas``
    layout="packed").  Pads the pair axis internally to the block
    size, so any N is accepted."""
    n, length, m = cost.shape
    pack = 128 // lp
    k_diag = length + m - 1
    ck = min(chunk_diags, _round_up(k_diag, 8))
    k_pad = _round_up(k_diag, ck)
    budget = 48 * 1024 * 1024
    rows_cap = max(budget // (ck * 128 * 4 * 2), 8)
    if block_pairs is not None:
        if block_pairs % pack:
            raise ValueError(
                f"block_pairs={block_pairs} not a multiple of pack={pack}"
            )
        rows = max(block_pairs // pack, 8)
    else:
        # prefer 128 rows: multiple grid blocks pipeline their DMAs
        # behind the wavefront compute -- measured 3.5x faster than
        # one maximal block at the roofline shape (2048 pairs, L=32)
        rows = 8
        for r in (128, 64, 32, 16, 8):
            if r <= rows_cap:
                rows = r
                break
    bp = rows * pack
    seg_lens = seg_lens.astype(jnp.int32)
    n_pad = _round_up(n, bp)
    if n_pad != n:
        cost = jnp.concatenate(
            [cost,
             jnp.broadcast_to(cost[:1], (n_pad - n,) + cost.shape[1:])]
        )
        seg_lens = jnp.concatenate(
            [seg_lens, jnp.ones(n_pad - n, jnp.int32)]
        )
    rt = n_pad // pack                        # packed register rows
    data = pack_skew_cost(cost.astype(jnp.float32), k_pad, lp)
    mlen_lane = jnp.repeat(seg_lens.reshape(rt, pack), lp, axis=1)
    single = k_pad == ck
    kernel = functools.partial(
        _kernel_packed, length=length, lp=lp, band=band, ck=ck,
        single_chunk=single,
    )
    if single:
        grid = (rt // rows,)
        in_specs = [
            pl.BlockSpec((rows, ck, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        grid = (rt // rows, k_pad // ck)
        in_specs = [
            pl.BlockSpec((rows, ck, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rt, 128), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(data, mlen_lane)
    # lane q*lp + (L-1) of packed row r holds pair (r*pack + q)'s
    # terminal cell
    return out.reshape(rt, pack, lp)[:, :, length - 1].reshape(n_pad)[:n]
