"""LLR linear filter construction and sliding-window scoring.

The mathematical core of the whole system (SURVEY.md section 1 row L3,
section 3.2, [HIGH]): a Bernoulli template P and background q convert
to a linear filter

    W = log(P / (1-P)) - log(q / (1-q)),
    c = sum log((1-P) / (1-q)),

so that for a binary window X,  W . X + c  equals the log-likelihood
ratio log Pr(X | P) / Pr(X | q).  Detection slides W over the
utterance's feature map (valid correlation over time, full F x E
support).

Two scoring paths:

* float32 -- the production path; parity target is ``allclose``
  (BASELINE.json:5 "correlation scores").
* quantized int32 -- W rounded to fixed point.  int32 addition is
  modular, hence associative/commutative regardless of order, so CPU
  and TPU produce *bit-identical* scores; detection decisions on this
  path are the bit-parity contract (BASELINE.json:5).
"""

from __future__ import annotations

import numpy as np

DEFAULT_QUANT_SCALE = 256  # 2**8 fixed-point scale for the int path


def llr_filter(template: np.ndarray, background: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(P [..., L, F, E], q [F, E]) -> (W [..., L, F, E], c [...]) float32.

    Supports a leading bank axis on ``template``.
    """
    p = np.asarray(template, dtype=np.float32)
    q = np.asarray(background, dtype=np.float32)
    w = (np.log(p) - np.log1p(-p)) - (np.log(q) - np.log1p(-q))
    c = (np.log1p(-p) - np.log1p(-q)).sum(axis=(-3, -2, -1))
    return w.astype(np.float32), np.asarray(c, dtype=np.float32)


def quantize_filter(
    w: np.ndarray, c: np.ndarray, scale: int = DEFAULT_QUANT_SCALE
) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-point quantization: W_int = round(W * scale) (int32)."""
    w_int = np.round(np.asarray(w, dtype=np.float32) * scale).astype(np.int32)
    c_int = np.round(np.asarray(c, dtype=np.float32) * scale).astype(np.int32)
    return w_int, c_int


def _windows(feats: np.ndarray, length: int) -> np.ndarray:
    """[T, F, E] -> [T-L+1, L, F, E] sliding windows (view)."""
    t = feats.shape[0]
    if t < length:
        raise ValueError(f"utterance shorter than template: {t} < {length}")
    return np.lib.stride_tricks.sliding_window_view(feats, length, axis=0).transpose(0, 3, 1, 2)


def sliding_score(feats: np.ndarray, w: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Valid sliding correlation, float32.

    feats: [T, F, E] binary; w: [K, L, F, E] (or [L, F, E]); c: [K] (or
    scalar).  Returns scores [K, T-L+1] (or [T-L+1]).
    """
    single = w.ndim == 3
    if single:
        w = w[None]
        c = np.asarray(c, dtype=np.float32)[None]
    length = w.shape[1]
    win = _windows(np.asarray(feats, dtype=np.float32), length)   # [T', L, F, E]
    scores = np.tensordot(w, win, axes=([1, 2, 3], [1, 2, 3])).astype(np.float32)
    scores = scores + np.asarray(c, dtype=np.float32)[:, None]
    return scores[0] if single else scores


def sliding_score_int(feats: np.ndarray, w_int: np.ndarray, c_int: np.ndarray) -> np.ndarray:
    """Bit-exact int32 sliding correlation (modular arithmetic).

    feats: [T, F, E] binary; w_int: [K, L, F, E] int32; c_int: [K]
    int32.  Returns int32 scores [K, T-L+1].  int32 addition is modular
    and therefore order-independent: any implementation computing the
    same multiset of terms produces bit-identical scores.
    """
    single = w_int.ndim == 3
    if single:
        w_int = w_int[None]
        c_int = np.asarray(c_int, dtype=np.int32)[None]
    length = w_int.shape[1]
    win = _windows(np.asarray(feats).astype(np.int32), length)
    k = w_int.shape[0]
    tprime = win.shape[0]
    wk = w_int.reshape(k, -1)
    xf = win.reshape(tprime, -1)
    # Accumulate in int64 then wrap to int32: identical to any-order
    # int32 accumulation mod 2**32.
    acc = xf.astype(np.int64) @ wk.astype(np.int64).T          # [T', K]
    out = acc.T + c_int[:, None].astype(np.int64)
    # Wrap to int32 (reinterpret the low 32 bits) = modular semantics.
    scores = np.ascontiguousarray(
        (out & np.int64(0xFFFFFFFF)).astype(np.uint32)
    ).view(np.int32).reshape(k, tprime)
    return scores[0] if single else scores


def score_utterance(
    feats: np.ndarray,
    template: np.ndarray,
    background: np.ndarray,
) -> np.ndarray:
    """Convenience: build the LLR filter and score in one call."""
    w, c = llr_filter(template, background)
    return sliding_score(feats, w, c)
