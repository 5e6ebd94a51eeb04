"""Shared fixtures: tiny deterministic corpora / templates for tests."""

from __future__ import annotations

import functools

import numpy as np

import oracle as O
from oracle.frontend import FrontendParams


@functools.lru_cache(maxsize=4)
def small_setup(seed: int = 0):
    """Corpus + trained 'aa' template/background, oracle-side.

    Returns dict with corpus, params, template, background, llr (w, c),
    exemplar feature maps and their stack.
    """
    corpus = O.make_synthetic_corpus(num_utterances=4, phones_per_utterance=5, seed=seed)
    p = FrontendParams()
    min_len = p.frame_length + 3 * p.hop_length
    feats = [O.frontend(c, p) for c in corpus.exemplar_clips("aa") if len(c) >= min_len]
    stack = O.register_exemplars(feats)
    tpl = O.estimate_template(stack)
    bg = [O.frontend(c, p) for c in corpus.background_clips("aa") if len(c) >= min_len]
    q = O.estimate_background(bg)
    w, c = O.llr_filter(tpl, q)
    return dict(
        corpus=corpus, params=p, feats=feats, stack=stack,
        template=tpl, background=q, w=w, c=c,
    )


def pad_to(x: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return np.pad(x, pad)
