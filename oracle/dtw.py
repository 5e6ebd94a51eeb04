"""Banded DTW alignment for variable-length keyword spotting.

BASELINE.json:10 (config 4) requires DTW-aligned template matching
with warping-band constraints.  SURVEY.md section 3.3: the cost matrix
is the negative per-frame Bernoulli LLR of each segment frame under
each template row; the DP recurrence is

    D[i, j] = cost[i, j] + min(D[i-1, j], D[i, j-1], D[i-1, j-1])

restricted to a Sakoe-Chiba-style band around the diagonal.  The band
test uses *integer* arithmetic --

    |j * (L-1) - i * (M-1)| <= band * max(L-1, 1)

-- so every implementation admits exactly the same cell set.  The
final score is the path-normalized negative cost, higher = better.
"""

from __future__ import annotations

import numpy as np

INF = np.float32(np.inf)


def band_mask(num_rows: int, num_cols: int, band: int) -> np.ndarray:
    """[L, M] bool mask of cells inside the scaled diagonal band."""
    i = np.arange(num_rows, dtype=np.int64)[:, None]
    j = np.arange(num_cols, dtype=np.int64)[None, :]
    lm1 = max(num_rows - 1, 1)
    mm1 = max(num_cols - 1, 1)
    return np.abs(j * lm1 - i * mm1) <= band * lm1


def banded_dtw(cost: np.ndarray, band: int) -> float:
    """Accumulate the banded DP over a [L, M] cost matrix.

    Returns D[L-1, M-1] (float32).  Cells outside the band are +inf.
    """
    cost = np.asarray(cost, dtype=np.float32)
    num_rows, num_cols = cost.shape
    mask = band_mask(num_rows, num_cols, band)
    d = np.full((num_rows, num_cols), INF, dtype=np.float32)
    for i in range(num_rows):
        for j in range(num_cols):
            if not mask[i, j]:
                continue
            if i == 0 and j == 0:
                best = np.float32(0.0)
            else:
                cands = []
                if i > 0:
                    cands.append(d[i - 1, j])
                if j > 0:
                    cands.append(d[i, j - 1])
                if i > 0 and j > 0:
                    cands.append(d[i - 1, j - 1])
                best = np.float32(min(cands)) if cands else INF
            d[i, j] = cost[i, j] + best
    return float(d[num_rows - 1, num_cols - 1])


def frame_llr_matrix(
    segment: np.ndarray, w: np.ndarray, c_rows: np.ndarray
) -> np.ndarray:
    """Per-(template row, segment frame) LLR: [L, M] float32.

    segment: [M, F, E] binary; w: [L, F, E]; c_rows: [L] per-row offset
    sum_{f,e} log((1 - P[i]) / (1 - q)).
    """
    seg = np.asarray(segment, dtype=np.float32).reshape(segment.shape[0], -1)
    wf = np.asarray(w, dtype=np.float32).reshape(w.shape[0], -1)
    return (wf @ seg.T + np.asarray(c_rows, dtype=np.float32)[:, None]).astype(np.float32)


def dtw_keyword_score(
    segment: np.ndarray,
    w: np.ndarray,
    c_rows: np.ndarray,
    band: int,
) -> float:
    """DTW-aligned match score of a variable-length segment.

    cost[i, j] = -LLR(template row i, segment frame j); score is
    -D[L-1, M-1] / (L + M), higher = better match.
    """
    llr = frame_llr_matrix(segment, w, c_rows)
    total = banded_dtw(-llr, band)
    num_rows, num_cols = llr.shape
    return float(-total / np.float32(num_rows + num_cols))


def llr_filter_rows(template: np.ndarray, background: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row LLR filter: (W [L, F, E], c_rows [L]) float32."""
    p = np.asarray(template, dtype=np.float32)
    q = np.asarray(background, dtype=np.float32)
    w = (np.log(p) - np.log1p(-p)) - (np.log(q) - np.log1p(-q))
    c_rows = (np.log1p(-p) - np.log1p(-q)).sum(axis=(-2, -1))
    return w.astype(np.float32), c_rows.astype(np.float32)
