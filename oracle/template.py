"""Exemplar registration and Bernoulli template / background estimation.

SURVEY.md section 1 row L2 ([HIGH]-confidence reconstruction;
reference mount empty, SURVEY.md section 0): variable-length binary
exemplars are registered to a common template length, the stacked maps
are averaged into a Bernoulli probability template clipped away from
{0, 1}, and the background model is the per-(freq, channel) feature
occurrence frequency over background spans.
"""

from __future__ import annotations

import numpy as np


def register_exemplars(
    exemplars: list[np.ndarray],
    template_length: int | None = None,
) -> np.ndarray:
    """Register variable-length exemplars to a common length.

    Each exemplar is a binary map [L_i, F, E].  The common length
    defaults to the median exemplar length (SURVEY.md section 2a
    "Exemplar registration").  Registration is uniform resampling of
    the time axis by nearest-neighbor index mapping:

        src_row(i) = floor(i * L_i / L_target)

    which is exact (no interpolation arithmetic) and therefore
    bit-reproducible across implementations.  Returns [N, L, F, E] bool.
    """
    if not exemplars:
        raise ValueError("no exemplars")
    lengths = np.array([e.shape[0] for e in exemplars])
    if template_length is None:
        template_length = int(np.median(lengths))
    out = np.zeros((len(exemplars), template_length) + exemplars[0].shape[1:], dtype=bool)
    for n, ex in enumerate(exemplars):
        # Integer arithmetic: src_row(i) = floor(i * L_i / L_target).
        src = (np.arange(template_length, dtype=np.int64) * ex.shape[0]) // template_length
        src = np.minimum(src, ex.shape[0] - 1)
        out[n] = ex[src]
    return out


def estimate_template(stack: np.ndarray, eps: float = 0.01) -> np.ndarray:
    """Mean of stacked registered binary maps, clipped to [eps, 1-eps].

    stack: [N, L, F, E] bool -> template [L, F, E] float32.
    """
    mean = stack.astype(np.float32).mean(axis=0)
    return np.clip(mean, np.float32(eps), np.float32(1.0 - eps)).astype(np.float32)


def estimate_background(
    background_maps: list[np.ndarray] | np.ndarray,
    eps: float = 0.01,
) -> np.ndarray:
    """Per-(freq, channel) occurrence frequency over background spans.

    Accepts a list of [T_i, F, E] binary maps (or one array);
    returns q [F, E] float32 clipped to [eps, 1-eps].
    """
    if isinstance(background_maps, np.ndarray):
        background_maps = [background_maps]
    total = np.zeros(background_maps[0].shape[1:], dtype=np.float64)
    count = 0
    for m in background_maps:
        total += m.astype(np.float64).sum(axis=0)
        count += m.shape[0]
    q = (total / max(count, 1)).astype(np.float32)
    return np.clip(q, np.float32(eps), np.float32(1.0 - eps)).astype(np.float32)
