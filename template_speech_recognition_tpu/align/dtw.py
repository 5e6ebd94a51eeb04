"""Banded DTW with wavefront (anti-diagonal) parallelism.

Config 4 (BASELINE.json:10): DTW-aligned template matching with
warping-band constraints.  The DP

    D[i, j] = cost[i, j] + min(D[i-1, j], D[i, j-1], D[i-1, j-1])

is evaluated along anti-diagonals k = i + j: every cell of a diagonal
depends only on the two previous diagonals, so each ``lax.scan`` step
updates a whole length-L vector on the VPU (SURVEY.md section 3.3
"wavefront-parallelizable"; the Pallas kernel in
``ops.dtw_pallas`` runs the same recurrence batched).  The band test
is pure integer arithmetic, shared bit-for-bit with
``oracle.dtw.band_mask``:

    |j*(L-1) - i*(M-1)| <= band * (L-1),  with M the *valid* segment
    length (padding-aware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INF = np.float32(np.inf)  # np scalar: no backend init at import
_PRECISION = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("band",))
def banded_dtw(cost: jnp.ndarray, seg_len: jnp.ndarray, band: int) -> jnp.ndarray:
    """Accumulate the banded DP over cost [L, M_pad]; returns
    D[L-1, seg_len-1] (float32).  Cells outside the band or beyond
    seg_len are +inf."""
    num_rows, m_pad = cost.shape
    seg_len = seg_len.astype(jnp.int32)
    i = jnp.arange(num_rows, dtype=jnp.int32)                      # [L]
    lm1 = jnp.int32(max(num_rows - 1, 1))
    mm1 = jnp.maximum(seg_len - 1, 1)
    flat = cost.reshape(-1)

    def step(carry, k):
        prev, prev2 = carry                                        # diag k-1, k-2
        j = k - i                                                  # [L]
        in_rect = (j >= 0) & (j < seg_len)
        in_band = jnp.abs(j * lm1 - i * mm1) <= jnp.int32(band) * lm1
        valid = in_rect & in_band
        cost_d = jnp.take(flat, jnp.clip(i * m_pad + j, 0, num_rows * m_pad - 1))
        prev_up = jnp.concatenate([jnp.full((1,), _INF), prev[:-1]])    # D[i-1, j]
        prev2_up = jnp.concatenate([jnp.full((1,), _INF), prev2[:-1]])  # D[i-1, j-1]
        best = jnp.minimum(jnp.minimum(prev_up, prev), prev2_up)
        best = jnp.where((i == 0) & (j == 0), jnp.float32(0.0), best)
        diag = jnp.where(valid, cost_d + best, _INF)
        return (diag, prev), diag

    init = (jnp.full((num_rows,), _INF), jnp.full((num_rows,), _INF))
    ks = jnp.arange(num_rows + m_pad - 1, dtype=jnp.int32)
    (_, _), diags = lax.scan(step, init, ks)
    # D[L-1, seg_len-1] lives on diagonal k = L-1 + seg_len-1, row L-1.
    return diags[num_rows - 1 + seg_len - 1, num_rows - 1]


def frame_llr_matrix(
    segment: jnp.ndarray,
    w: jnp.ndarray,
    c_rows: jnp.ndarray,
    precision: lax.Precision = _PRECISION,
) -> jnp.ndarray:
    """segment [M, F, E], W [L, F, E], c_rows [L] -> LLR [L, M] (GEMM)."""
    seg = segment.reshape(segment.shape[0], -1).astype(jnp.float32)
    wf = w.reshape(w.shape[0], -1)
    return jnp.matmul(wf, seg.T, precision=precision) + c_rows[:, None]


@functools.partial(jax.jit, static_argnames=("band",))
def dtw_keyword_score(
    segment: jnp.ndarray,
    seg_len: jnp.ndarray,
    w: jnp.ndarray,
    c_rows: jnp.ndarray,
    band: int,
) -> jnp.ndarray:
    """DTW match score of one (padded) segment; higher = better.

    score = -D[L-1, M-1] / (L + M), cost = -frame LLR
    (oracle: ``oracle.dtw.dtw_keyword_score``).
    """
    llr = frame_llr_matrix(segment, w, c_rows)
    total = banded_dtw(-llr, seg_len, band)
    num_rows = w.shape[0]
    return -total / (num_rows + seg_len).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("band", "use_pallas"))
def dtw_keyword_scores_batch(
    segments: jnp.ndarray,
    seg_lens: jnp.ndarray,
    w: jnp.ndarray,
    c_rows: jnp.ndarray,
    band: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """[B, M_pad, F, E] x [K, L, F, E] -> scores [B, K].

    ``use_pallas`` routes the banded DP through the wavefront kernel
    (``ops.dtw_pallas``) on a [chunk*K, L, M] cost tensor; otherwise a
    double-vmapped ``lax.scan``.  Same results (tested).

    The (segment x template) cost tensor is the memory hazard at
    production scale -- B = batch x peaks and K = the full bank make
    B*K*L*M cells (a 30 s batch at K=1024 with the default peak budget
    would ask for ~9 GB; config-5 banks 10x that), so segments stream
    through ``lax.map`` in chunks that cap the live cost tensor while
    every chunk still fills the wavefront kernel's lanes.  Bitwise
    identical to the unchunked computation (pure batching).
    """
    b, k = segments.shape[0], w.shape[0]
    num_rows, m_pad = w.shape[1], segments.shape[1]
    # ~256 MB of f32 cost cells per chunk
    max_cells = 64 * 1024 * 1024
    chunk = max(1, min(b, max_cells // max(k * num_rows * m_pad, 1)))
    if chunk < b:
        n_chunks = -(-b // chunk)
        b_pad = n_chunks * chunk
        if b_pad != b:
            segments = jnp.concatenate(
                [segments,
                 jnp.zeros((b_pad - b,) + segments.shape[1:],
                           segments.dtype)]
            )
            seg_lens = jnp.concatenate(
                [seg_lens, jnp.ones((b_pad - b,), seg_lens.dtype)]
            )
        segs_c = segments.reshape((n_chunks, chunk) + segments.shape[1:])
        lens_c = seg_lens.reshape(n_chunks, chunk)
        out = jax.lax.map(
            lambda t: _dtw_scores_chunk(
                t[0], t[1], w, c_rows, band, use_pallas
            ),
            (segs_c, lens_c),
        )
        return out.reshape(b_pad, k)[:b]
    return _dtw_scores_chunk(
        segments, seg_lens, w, c_rows, band, use_pallas
    )


@functools.partial(jax.jit, static_argnames=("band", "use_pallas"))
def dtw_pairwise_scores(
    segments: jnp.ndarray,     # [N, M_pad, F, E] (or [N, M_pad, D])
    seg_lens: jnp.ndarray,     # [N] int32
    w_pairs: jnp.ndarray,      # [N, L, F, E] per-pair template rows
    c_pairs: jnp.ndarray,      # [N, L]
    band: int,
    use_pallas: bool = False,
) -> jnp.ndarray:              # [N]
    """DTW score of segment i against ITS OWN template i (the
    ``dtw_top_r == 1`` verify-the-winner rescore): one batched GEMM
    for the per-pair LLR cost, then the same banded DP as the
    exhaustive path.  O(peaks) instead of O(peaks * bank) -- the
    exhaustive rescore's cost GEMM alone is ~9 TFLOP per bench batch
    at K=1024 (ROOFLINE_r04 dtw_e2e_share row), while this stays
    constant in the bank size."""
    n = segments.shape[0]
    num_rows = w_pairs.shape[1]
    seg = segments.reshape(n, segments.shape[1], -1)
    wf = w_pairs.reshape(n, num_rows, -1)
    # bf16 operands (the production TPU path passes bf16 gathers --
    # binary segments are exact in bf16, filters are bf16-class like
    # the main fft scorer) run the GEMM at MXU rate with f32
    # accumulation; f32 operands keep the exact HIGHEST path (CPU /
    # parity tests).
    if seg.dtype == jnp.bfloat16 or wf.dtype == jnp.bfloat16:
        seg = seg.astype(jnp.bfloat16)
        wf = wf.astype(jnp.bfloat16)
        prec = lax.Precision.DEFAULT
    else:
        seg = seg.astype(jnp.float32)
        wf = wf.astype(jnp.float32)
        prec = _PRECISION
    llr = (
        jnp.einsum("nld,nmd->nlm", wf, seg, precision=prec,
                   preferred_element_type=jnp.float32)
        + c_pairs[:, :, None]
    )                                              # [N, L, M]
    lens = seg_lens.astype(jnp.int32)
    if use_pallas:
        from template_speech_recognition_tpu.ops.dtw_pallas import (
            banded_dtw_pallas,
        )

        # pad pairs to a 256 multiple: banded_dtw_pallas picks the
        # widest pair block DIVIDING n, and odd peak counts (e.g.
        # 8*123) would otherwise force 8-pair blocks -- measured ~25x
        # slower than 256-pair blocks on the latency-bound wavefront
        n_pad = ((n + 255) // 256) * 256
        cost = -llr
        if n_pad != n:
            cost = jnp.concatenate(
                [cost,
                 jnp.broadcast_to(cost[:1], (n_pad - n,) + cost.shape[1:])]
            )
            lens_p = jnp.concatenate([lens, jnp.ones(n_pad - n, jnp.int32)])
        else:
            lens_p = lens
        total = banded_dtw_pallas(cost, lens_p, band)[:n]
        scores = -total / (num_rows + lens).astype(jnp.float32)
        return jnp.where(total > 1e37, -jnp.inf, scores)
    total = jax.vmap(
        lambda ll, ln: banded_dtw(-ll, ln, band)
    )(llr, lens)
    return -total / (num_rows + lens).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("m_seg", "band", "use_pallas")
)
def dtw_pairwise_scores_from_map(
    binary_flat: jnp.ndarray,   # [B, T, D] feature map (any float dtype)
    times: jnp.ndarray,         # [B, P] int32 window starts (pre-clipped)
    ids: jnp.ndarray,           # [B, P] int32 winner template ids
    w_rows: jnp.ndarray,        # [K, L, D] per-row filters
    c_rows: jnp.ndarray,        # [K, L]
    valid_frames: jnp.ndarray,  # [B] int32
    m_seg: int,
    band: int,
    use_pallas: bool = True,
    seg_lens: jnp.ndarray | None = None,   # [B, P] override (sharded)
) -> jnp.ndarray:               # [B, P]
    """Verify-the-winner rescore STRAIGHT from the feature map: the
    per-pair [m_seg, D] windows and [L, D] filter rows DMA from HBM
    inside ``ops.dtw_pallas.pair_llr_pallas`` -- no gathered segment
    or filter intermediates exist (round 5; the XLA gathers measured
    ~2 ms/batch at the bench shape, ~5x their bytes' DMA time).
    Identical scores to ``dtw_pairwise_scores`` over gathered
    segments (tested)."""
    from template_speech_recognition_tpu.ops.dtw_pallas import (
        banded_dtw_pallas,
        pair_llr_pallas,
    )

    b, tdim = binary_flat.shape[0], binary_flat.shape[1]
    d = int(np.prod(binary_flat.shape[2:]))
    num_rows = w_rows.shape[1]
    # Mosaic requires the HBM DMA's row slice to be 8-ALIGNED in both
    # offset and length: copy m_pad + 8 rows from the aligned start
    # row0 = rowstart & ~7 and slice each pair's true columns
    # (off = rowstart - row0 in [0, 8)) off the small LLR tile
    # afterwards; cells beyond seg_len are masked by the DP band /
    # rectangle exactly like any other padding
    m_pad = -(-m_seg // 8) * 8
    m_dma = m_pad + 8
    t_idx = jnp.clip(times, 0, tdim - 1)
    rowstart = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * tdim + t_idx
    ).reshape(-1)
    row0 = rowstart & jnp.int32(~7)
    off = rowstart - row0
    flat = binary_flat.reshape(b * tdim, d).astype(jnp.bfloat16)
    # windows near the padded tail read past the array: pad to an
    # 8-row multiple covering row0 + m_dma (those cells are outside
    # seg_len and masked by the DP)
    r_pad = -(-(b * tdim + m_dma) // 8) * 8
    flat = jnp.concatenate(
        [flat, jnp.zeros((r_pad - b * tdim, d), flat.dtype)]
    )
    w16 = w_rows.reshape(w_rows.shape[0], num_rows, d).astype(
        jnp.bfloat16
    )
    safe = jnp.clip(ids.reshape(-1), 0, w_rows.shape[0] - 1)
    llr_ext = pair_llr_pallas(
        flat, w16, row0 >> 3, safe, m_dma,
        interpret=not use_pallas or None,
    )                                              # [B*P, L, m_dma]
    llr = jax.vmap(
        lambda a, o: lax.dynamic_slice(
            a, (jnp.int32(0), o), (num_rows, m_pad)
        )
    )(llr_ext, off)                                # [B*P, L, m_pad]
    llr = llr + jnp.take(
        c_rows.astype(jnp.float32), safe, axis=0
    )[:, :, None]
    if seg_lens is None:
        lens = jnp.clip(
            valid_frames.astype(jnp.int32)[:, None] - t_idx, 1, m_seg
        ).reshape(-1)
    else:
        lens = seg_lens.astype(jnp.int32).reshape(-1)
    total = banded_dtw_pallas(
        -llr, lens, band, interpret=not use_pallas or None
    )
    scores = -total / (num_rows + lens).astype(jnp.float32)
    return jnp.where(total > 1e37, -jnp.inf, scores).reshape(times.shape)


def _dtw_scores_chunk(segments, seg_lens, w, c_rows, band, use_pallas):
    if not use_pallas:

        def one(seg, ln):
            def per_template(wk, ck):
                return dtw_keyword_score.__wrapped__(seg, ln, wk, ck, band)

            return jax.vmap(per_template)(w, c_rows)

        return jax.vmap(one)(segments, seg_lens)

    from template_speech_recognition_tpu.ops.dtw_pallas import banded_dtw_pallas

    b, k = segments.shape[0], w.shape[0]
    num_rows = w.shape[1]
    llr = jax.vmap(
        lambda seg: jax.vmap(
            lambda wk, ck: frame_llr_matrix(seg, wk, ck)
        )(w, c_rows)
    )(segments)                                              # [B, K, L, M]
    cost = (-llr).reshape(b * k, num_rows, llr.shape[-1])
    lens = jnp.repeat(seg_lens.astype(jnp.int32), k)
    n_pad = ((b * k + 7) // 8) * 8
    cost = jnp.concatenate(
        [cost, jnp.broadcast_to(cost[:1], (n_pad - b * k,) + cost.shape[1:])]
    ) if n_pad != b * k else cost
    lens = jnp.concatenate(
        [lens, jnp.ones(n_pad - b * k, jnp.int32)]
    ) if n_pad != b * k else lens
    total = banded_dtw_pallas(cost, lens, band)[: b * k].reshape(b, k)
    denom = (num_rows + seg_lens).astype(jnp.float32)[:, None]
    scores = -total / denom
    # Out-of-band pairs: the pallas kernel returns ~3e38 -> -inf score.
    return jnp.where(total > 1e37, -jnp.inf, scores)
