"""Multi-class segment classification (SURVEY.md section 3.5, [MED]).

Score an unknown segment against each class's template(s) and pick the
argmax: either max-over-shift sliding LLR (registered segments) or the
DTW-aligned score for variable-length segments.
"""

from __future__ import annotations

import numpy as np

from oracle.dtw import dtw_keyword_score, llr_filter_rows
from oracle.score import llr_filter, sliding_score
from oracle.template import register_exemplars


def classify_segment(
    segment: np.ndarray,
    class_templates: dict[str, np.ndarray],
    background: np.ndarray,
    use_dtw: bool = False,
    band: int = 6,
) -> tuple[str, dict[str, float]]:
    """Classify one binary segment [M, F, E].

    class_templates maps class name -> template [L, F, E] or a stack
    of mixture-component templates [C, L, F, E].  Returns
    (argmax class, per-class best score).  Ties break by class-name
    sort order (deterministic).
    """
    scores: dict[str, float] = {}
    for name in sorted(class_templates):
        tpl = class_templates[name]
        tpls = tpl[None] if tpl.ndim == 3 else tpl
        best = -np.inf
        for p in tpls:
            if use_dtw:
                w, c_rows = llr_filter_rows(p, background)
                s = dtw_keyword_score(segment, w, c_rows, band)
            else:
                length = p.shape[0]
                if segment.shape[0] < length:
                    reg = register_exemplars([segment], length)[0]
                    w, c = llr_filter(p, background)
                    s = float(np.asarray(w, dtype=np.float32).reshape(-1)
                              @ reg.reshape(-1).astype(np.float32) + c)
                else:
                    w, c = llr_filter(p, background)
                    s = float(sliding_score(segment, w, c).max())
            best = max(best, s)
        scores[name] = best
    winner = max(sorted(scores), key=lambda k: scores[k])
    return winner, scores
