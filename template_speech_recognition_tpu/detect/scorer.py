"""Batched sliding-window LLR correlation -- THE hot kernel.

SURVEY.md section 3.2: scores[k, t] = sum_{tau,f,e} W[k,tau,f,e] *
X[t+tau,f,e] + c[k], a valid cross-correlation over time with full
(F, E) support.  On TPU this is a 1-D convolution with D = F*E input
channels and K output channels -- ``lax.conv_general_dilated`` lowers
it straight onto the MXU (XLA convs are cross-correlations; no kernel
flip).  A Pallas kernel (``ops.correlation_pallas``) covers the
shapes where it beats the XLA conv; both share this module's
interface.

Paths:
* float32 (HIGHEST precision) -- allclose parity vs
  ``oracle.score.sliding_score`` (BASELINE.json:5).
* bfloat16 inputs / float32 accumulation -- throughput path (binary
  features are exact in bf16; W rounds to 8 mantissa bits).
* int32 fixed point -- modular arithmetic, bit-parity vs
  ``oracle.score.sliding_score_int``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NCH", "OIH", "NCH")


@functools.partial(jax.jit, static_argnames=("precision", "compute_dtype"))
def sliding_scores(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """feats [T', F, E] (bool/float) or pre-flattened [T', D], W
    [K, L, F, E] or [K, L, D], c [K] -> [K, T'-L+1].  Feats and w must
    share their trailing-dims flattening order (``ops.layout``).

    Scores at window starts overlapping padded rows are garbage by
    construction (padded rows are zero); use ``masked_scores`` to
    -inf them out.
    """
    t = feats.shape[0]
    k, length = w.shape[0], w.shape[1]
    d = int(np.prod(w.shape[2:]))
    lhs = feats.reshape(t, d).T[None].astype(compute_dtype)        # [1, D, T']
    rhs = jnp.swapaxes(w.reshape(k, length, d), 1, 2).astype(compute_dtype)  # [K, D, L]
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out[0] + c.astype(jnp.float32)[:, None]


@functools.partial(jax.jit, static_argnames=("precision", "compute_dtype"))
def sliding_scores_batch(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Batched twin of ``sliding_scores``: feats [B, T', F, E] (or
    pre-flattened [B, T', D]) -> [B, K, T'-L+1] via one batched conv
    (the conv's N axis), so a whole utterance bucket scores in one MXU
    launch.  Per-utterance results equal ``sliding_scores`` (same
    conv, batched over N).  Feats and w must share their trailing-dims
    flattening order (``ops.layout``)."""
    b, t = feats.shape[0], feats.shape[1]
    k, length = w.shape[0], w.shape[1]
    d = int(np.prod(w.shape[2:]))
    lhs = jnp.swapaxes(feats.reshape(b, t, d), 1, 2).astype(compute_dtype)
    rhs = jnp.swapaxes(w.reshape(k, length, d), 1, 2).astype(compute_dtype)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out + c.astype(jnp.float32)[None, :, None]


@jax.jit
def sliding_scores_int(
    feats: jnp.ndarray,
    w_int: jnp.ndarray,
    c_int: jnp.ndarray,
) -> jnp.ndarray:
    """Bit-parity int32 path: feats [T',F,E] (or flat [T',D]), W_int
    [K,L,F,E] (or flat [K,L,D]) int32, consistently flattened
    (``ops.layout``).

    int32 addition is modular, hence order-independent: the result is
    bit-identical to ``oracle.score.sliding_score_int`` regardless of
    reduction order.  Computed as an unfold + integer matmul (T'-L+1
    windows of L*D int32 each).
    """
    k, length = w_int.shape[0], w_int.shape[1]
    t = feats.shape[0]
    d = int(np.prod(w_int.shape[2:]))
    x = feats.reshape(t, d).astype(jnp.int32)
    n_win = t - length + 1
    idx = jnp.arange(n_win)[:, None] + jnp.arange(length)[None, :]   # [T'', L]
    win = jnp.take(x, idx.reshape(-1), axis=0).reshape(n_win, length * d)
    wk = w_int.reshape(k, length * d)
    acc = jax.lax.dot_general(
        win,
        wk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                                # [T'', K]
    return acc.T + c_int[:, None]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("block_t", "precision", "compute_dtype")
)
def sliding_scores_blockwise(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    block_t: int = 512,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Streaming twin of ``sliding_scores`` for arbitrarily long audio
    (SURVEY.md section 5 "long-context": blockwise scoring with carried
    overlap -- the workload's analog of blockwise attention).

    A ``lax.scan`` walks T in ``block_t``-frame chunks; each step
    scores its chunk extended by the next chunk's first L-1 frames, so
    peak live memory is O(block_t * (D + K)) instead of O(T * (D + K)).
    Output [K, T'-L+1] equals ``sliding_scores`` (same per-window conv).
    """
    t = feats.shape[0]
    k, length = w.shape[0], w.shape[1]
    if length - 1 > block_t:
        raise ValueError(
            f"template length {length} needs halo {length - 1} > "
            f"block_t {block_t}; raise block_t"
        )
    d = w.shape[2] * w.shape[3]
    x = feats.reshape(t, d).astype(compute_dtype)
    rhs = jnp.swapaxes(w.reshape(k, length, d), 1, 2).astype(compute_dtype)
    t_pad = _round_up(t, block_t)
    x = jnp.zeros((t_pad, d), compute_dtype).at[:t].set(x)
    n = t_pad // block_t
    chunks = x.reshape(n, block_t, d)
    halos = jnp.concatenate(
        [chunks[1:, : length - 1], jnp.zeros((1, length - 1, d), compute_dtype)]
    )

    def step(_, xs):
        ch, ha = xs
        ext = jnp.concatenate([ch, ha], axis=0)          # [block+L-1, D]
        out = lax.conv_general_dilated(
            ext.T[None],
            rhs,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=_DN,
            precision=precision,
            preferred_element_type=jnp.float32,
        )[0]                                             # [K, block]
        return None, out

    _, blocks = lax.scan(step, None, (chunks, halos))    # [n, K, block]
    scores = jnp.moveaxis(blocks, 0, 1).reshape(k, t_pad)
    return scores[:, : t - length + 1] + c.astype(jnp.float32)[:, None]


def sliding_scores_backend(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    backend: str = "conv",
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Backend-selectable scorer: feats [T',F,E], W [K,L,F,E], c [K]
    -> [K, T'-L+1].

    ``backend="fft"`` (production fast path): frequency-domain
    overlap-save correlation (``detect.fft_scorer``) -- ~14x less MXU
    work than the direct conv at L = 32; builds the bank spectra per
    call (prefer ``fft_scorer.build_fft_bank`` + ``fft_sliding_scores``
    when scoring many utterances against one bank).
    ``backend="conv"``: XLA ``conv_general_dilated`` (direct).
    ``backend="pallas"``: the hand-written MXU kernel in
    ``ops.correlation_pallas`` -- pads (T, K, D) up to its block grid,
    calls it, and slices the valid region.  All return identical
    layouts, so callers can switch via config/env without other code
    changes.
    """
    if backend == "fft":
        from template_speech_recognition_tpu.detect.fft_scorer import (
            build_fft_bank,
            fft_sliding_scores,
        )

        bank = build_fft_bank(w, c, mm_dtype=compute_dtype)
        return fft_sliding_scores(feats[None], bank)[0]
    if backend == "conv":
        return sliding_scores(
            feats, w, c,
            precision=lax.Precision.DEFAULT
            if compute_dtype == jnp.bfloat16
            else lax.Precision.HIGHEST,
            compute_dtype=compute_dtype,
        )
    if backend != "pallas":
        raise ValueError(f"unknown scoring backend {backend!r}")
    from template_speech_recognition_tpu.ops.correlation_pallas import (
        correlation_scores_pallas,
    )

    t = feats.shape[0]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
    block_t = max(128, _round_up(length - 1, 128))
    block_d = 512 if jnp.dtype(compute_dtype).itemsize <= 2 else 256
    t_pad = _round_up(t, block_t)
    k_pad = _round_up(k, 128)
    d_pad = _round_up(d, block_d)
    f2 = jnp.zeros((t_pad, d_pad), compute_dtype)
    f2 = f2.at[:t, :d].set(feats.reshape(t, d).astype(compute_dtype))
    w2 = jnp.zeros((k_pad, length, d_pad), compute_dtype)
    w2 = w2.at[:k, :, :d].set(w.reshape(k, length, d).astype(compute_dtype))
    c2 = jnp.zeros((k_pad,), jnp.float32).at[:k].set(c.astype(jnp.float32))
    out = correlation_scores_pallas(
        f2, w2, c2, block_k=128, block_t=block_t, block_d=block_d
    )
    return out[:k, : t - length + 1]


def masked_scores(
    scores: jnp.ndarray,
    valid_frames: jnp.ndarray,
    template_length: int,
    fill=-jnp.inf,
    time_major: bool = False,
) -> jnp.ndarray:
    """-inf (or ``fill``) scores whose window overruns the valid region.

    Valid window starts: t <= valid_frames - template_length.
    scores [..., T''] (or [T'', K] with ``time_major``, the native
    layout of the FFT scorer's fused epilogue); valid_frames scalar.
    """
    t_axis = 0 if time_major else -1
    n_win = scores.shape[t_axis]
    t_idx = jnp.arange(n_win, dtype=jnp.int32)
    ok = t_idx <= (valid_frames.astype(jnp.int32) - template_length)
    if time_major:
        ok = ok.reshape((n_win,) + (1,) * (scores.ndim - 1))
    return jnp.where(ok, scores, jnp.asarray(fill, scores.dtype))
