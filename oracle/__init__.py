"""CPU NumPy oracle for the TPU-native template-based speech recognizer.

This package is the *ground truth* ("the NumPy reference" of
/root/repo/BASELINE.json:5).  The upstream reference repo
(markstoehr/Template-Speech-Recognition) was not present at
/root/reference (empty mount, see SURVEY.md section 0), so this oracle
implements the textbook algorithms of that research program --
spectrogram edge features, Bernoulli templates and mixtures, log-odds
sliding-window detection, banded DTW, ROC/EER evaluation -- once,
simply and readably, on CPU.  The TPU framework in
``template_speech_recognition_tpu/`` must match this oracle:

* feature maps & correlation scores: ``allclose`` (BASELINE.json:5)
* detection decisions on the quantized integer scoring path:
  bit-parity (BASELINE.json:5)

Design notes
------------
All float computation is float32 (matching the TPU default) unless a
function documents otherwise.  Randomness is never implicit: every
stochastic routine takes a seed or a ``numpy.random.Generator``.
"""

from oracle.frontend import (
    FrontendParams,
    preemphasize,
    frame_signal,
    stft_log_magnitude,
    mel_filterbank,
    log_mel,
    edge_responses,
    quantile_threshold,
    binary_edge_map,
    spread_binary,
    frontend,
)
from oracle.template import (
    register_exemplars,
    estimate_template,
    estimate_background,
)
from oracle.mixture import (
    bernoulli_mixture_em,
    bernoulli_mixture_em_restarts,
    init_responsibilities,
)
from oracle.score import (
    llr_filter,
    quantize_filter,
    sliding_score,
    sliding_score_int,
)
from oracle.detect import nms_peaks, match_detections, roc_curve, eer
from oracle.dtw import banded_dtw, dtw_keyword_score
from oracle.fixtures import SyntheticCorpus, make_synthetic_corpus

__all__ = [
    "FrontendParams",
    "preemphasize",
    "frame_signal",
    "stft_log_magnitude",
    "mel_filterbank",
    "log_mel",
    "edge_responses",
    "quantile_threshold",
    "binary_edge_map",
    "spread_binary",
    "frontend",
    "register_exemplars",
    "estimate_template",
    "estimate_background",
    "bernoulli_mixture_em",
    "bernoulli_mixture_em_restarts",
    "init_responsibilities",
    "llr_filter",
    "quantize_filter",
    "sliding_score",
    "sliding_score_int",
    "nms_peaks",
    "match_detections",
    "roc_curve",
    "eer",
    "banded_dtw",
    "dtw_keyword_score",
    "SyntheticCorpus",
    "make_synthetic_corpus",
]
