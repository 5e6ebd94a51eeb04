"""Peak picking (NMS), detection-label matching, ROC / EER.

SURVEY.md section 1 row L3 / section 2a "Peak picking / NMS + ROC"
([HIGH]): threshold sweep over the score curve, non-max suppression
within a window, true positives = peaks within a tolerance of a
labeled start, ROC as TPR vs false positives per second, EER.

Everything here is deterministic with explicit tie-breaking
(score desc, then time asc) so cross-host merges are
order-independent (SURVEY.md section 5, "race detection" row).
"""

from __future__ import annotations

import numpy as np


def nms_mask(scores: np.ndarray, radius: int) -> np.ndarray:
    """Windowed local-max non-max suppression mask.

    keep[t]  <=>  s[t] >  max(s[t-radius .. t-1])   (strictly beats earlier)
             and  s[t] >= max(s[t+1 .. t+radius])   (ties go to the earliest)

    This formulation is deterministic, order-independent, and
    expressible as two one-sided sliding-window maxima -- i.e. exactly
    computable both here and as a fused ``lax.reduce_window`` pass on
    TPU, which is why it is the framework's NMS definition (greedy
    sequential NMS does not vectorize).  On the integer scoring path
    the mask is bit-identical across implementations.
    """
    scores = np.asarray(scores)
    n = len(scores)
    neg = np.float64(-np.inf)
    left = np.full(n, neg)
    right = np.full(n, neg)
    for t in range(n):
        lo = max(0, t - radius)
        if lo < t:
            left[t] = scores[lo:t].max()
        hi = min(n, t + radius + 1)
        if t + 1 < hi:
            right[t] = scores[t + 1 : hi].max()
    return (scores > left) & (scores >= right)


def nms_peaks(
    scores: np.ndarray,
    radius: int,
    min_score: float | int | None = None,
    max_peaks: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Non-max suppression over a 1-D score curve (see ``nms_mask``).

    Returns (times int64, scores) ordered by score desc then time asc,
    optionally thresholded at ``min_score`` and capped at
    ``max_peaks``.
    """
    scores = np.asarray(scores)
    keep = nms_mask(scores, radius)
    if min_score is not None:
        keep &= scores >= min_score
    times = np.nonzero(keep)[0]
    s = scores[times]
    order = np.lexsort((times, -s))
    times, s = times[order], s[order]
    if max_peaks is not None:
        times, s = times[:max_peaks], s[:max_peaks]
    return times.astype(np.int64), s


def bank_nms(
    scores: np.ndarray,
    radius: int,
    min_score: float | int | None = None,
    max_peaks: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NMS over a [K, T'] bank score matrix.

    Reduces over templates first (max over K; ties -> lowest template
    id), then time-NMS.  Returns (times, scores, template_ids).
    """
    scores = np.asarray(scores)
    best = scores.max(axis=0)
    best_k = scores.argmax(axis=0)
    times, s = nms_peaks(best, radius, min_score=min_score, max_peaks=max_peaks)
    return times, s, best_k[times].astype(np.int64)


def match_detections(
    det_times: np.ndarray,
    det_scores: np.ndarray,
    label_times: np.ndarray,
    tolerance: int,
) -> np.ndarray:
    """Greedy detection-label matching.

    Detections are visited in (score desc, time asc) order; each label
    may match at most one detection, within +-``tolerance`` frames.
    Returns a bool array ``is_tp`` aligned with det_times.
    """
    det_times = np.asarray(det_times)
    det_scores = np.asarray(det_scores)
    label_times = np.asarray(label_times)
    order = np.lexsort((det_times, -det_scores))
    used = np.zeros(len(label_times), dtype=bool)
    is_tp = np.zeros(len(det_times), dtype=bool)
    for idx in order:
        if len(label_times) == 0:
            break
        d = np.abs(label_times - det_times[idx])
        d = np.where(used, np.iinfo(np.int64).max, d)
        j = int(np.argmin(d))
        if d[j] <= tolerance:
            used[j] = True
            is_tp[idx] = True
    return is_tp


def roc_curve(
    det_scores: np.ndarray,
    det_is_tp: np.ndarray,
    num_labels: int,
    audio_seconds: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threshold sweep -> (thresholds, tpr, fp_per_second).

    Thresholds are the distinct detection scores (descending); at each
    threshold, detections with score >= threshold count.
    """
    det_scores = np.asarray(det_scores, dtype=np.float64)
    det_is_tp = np.asarray(det_is_tp, dtype=bool)
    order = np.argsort(-det_scores, kind="stable")
    s = det_scores[order]
    tp = np.cumsum(det_is_tp[order])
    fp = np.cumsum(~det_is_tp[order])
    # Keep the last entry of each run of equal scores.
    last = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        last[:-1] = s[:-1] != s[1:]
    thresholds = s[last]
    tpr = tp[last] / max(num_labels, 1)
    fp_per_sec = fp[last] / max(audio_seconds, 1e-9)
    return thresholds, tpr, fp_per_sec


def eer(tpr: np.ndarray, fp_rate: np.ndarray) -> float:
    """Equal error rate: where miss rate (1-TPR) crosses the FA rate.

    ``fp_rate`` must be normalized to [0, 1] (e.g. FP count divided by
    its maximum, or FP/sec divided by its maximum over the sweep);
    linear interpolation between sweep points.
    """
    tpr = np.asarray(tpr, dtype=np.float64)
    fa = np.asarray(fp_rate, dtype=np.float64)
    if fa.max() > 0:
        fa = fa / fa.max()
    miss = 1.0 - tpr
    diff = miss - fa
    idx = int(np.argmin(np.abs(diff)))
    # Interpolate around the sign change if one exists.
    sign_change = np.nonzero(np.diff(np.sign(diff)))[0]
    if len(sign_change):
        i = int(sign_change[0])
        d0, d1 = diff[i], diff[i + 1]
        t = 0.0 if d1 == d0 else d0 / (d0 - d1)
        return float(miss[i] + t * (miss[i + 1] - miss[i]))
    return float((miss[idx] + fa[idx]) / 2.0)
