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
    """feats [T', F, E] (bool/float), W [K, L, F, E], c [K] -> [K, T'-L+1].

    Scores at window starts overlapping padded rows are garbage by
    construction (padded rows are zero); use ``masked_scores`` to
    -inf them out.
    """
    t = feats.shape[0]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
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


@jax.jit
def sliding_scores_int(
    feats: jnp.ndarray,
    w_int: jnp.ndarray,
    c_int: jnp.ndarray,
) -> jnp.ndarray:
    """Bit-parity int32 path: feats [T',F,E], W_int [K,L,F,E] int32.

    int32 addition is modular, hence order-independent: the result is
    bit-identical to ``oracle.score.sliding_score_int`` regardless of
    reduction order.  Computed as an unfold + integer matmul (T'-L+1
    windows of L*D int32 each).
    """
    k, length = w_int.shape[0], w_int.shape[1]
    t = feats.shape[0]
    d = w_int.shape[2] * w_int.shape[3]
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


def masked_scores(
    scores: jnp.ndarray,
    valid_frames: jnp.ndarray,
    template_length: int,
    fill=-jnp.inf,
) -> jnp.ndarray:
    """-inf (or ``fill``) scores whose window overruns the valid region.

    Valid window starts: t <= valid_frames - template_length.
    scores [..., T'']; valid_frames scalar.
    """
    n_win = scores.shape[-1]
    t_idx = jnp.arange(n_win, dtype=jnp.int32)
    ok = t_idx <= (valid_frames.astype(jnp.int32) - template_length)
    return jnp.where(ok, scores, jnp.asarray(fill, scores.dtype))
