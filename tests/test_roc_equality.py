"""End-to-end oracle-vs-TPU ROC equality on the int32 bit-parity path
(round-2 verdict, next-item 4; BASELINE.json:5).

The int32 scoring path is order-independent modular arithmetic, so the
whole chain waveform -> frontend -> int32 sliding scores -> NMS ->
top-K -> greedy matching -> ROC must produce *identical* arrays from
the independent NumPy oracle and the TPU pipeline: same detection
(score, time, template) triples per utterance, and bitwise-equal
thresholds / TPR / FP-per-second vectors.  Any divergence anywhere in
the stack (a flipped binary cell, a different NMS tie-break, a
different threshold dedup rule) breaks exact equality here.
"""

from __future__ import annotations

import numpy as np
import pytest

import oracle as O
from oracle.detect import bank_nms
from oracle.frontend import FrontendParams
from template_speech_recognition_tpu.config import DetectConfig, PipelineConfig
from template_speech_recognition_tpu.pipeline import (
    SyntheticAdapter,
    bucket_length,
    detect_corpus,
    evaluate_detections,
    train_bank,
)


@pytest.fixture(scope="module")
def corpus():
    return SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=6, phones_per_utterance=6, seed=11)
    )


def _oracle_detect_corpus(corpus, bank, cfg, target_phone):
    """Full oracle pipeline mirroring ``detect_corpus`` semantics on the
    exact_scores path: oracle frontend, oracle int32 bank scoring,
    oracle NMS/top-K, with the same per-bucket detection budget."""
    p = FrontendParams()
    fcfg = cfg.frontend
    w_int, c_int = bank.llr_quantized(cfg.detect.quant_scale)
    w_int = np.asarray(w_int)
    c_int = np.asarray(c_int)
    scale = np.float32(cfg.detect.quant_scale)
    per_utt, labels = [], []
    total_samples = 0
    for _utt_id, wav, phones in corpus.iter_utterances():
        total_samples += len(wav)
        fm = O.frontend(wav, p)
        si = O.sliding_score_int(fm, w_int, c_int)          # [K, T']
        top_k = cfg.detect.effective_top_k(
            bucket_length(len(wav)), fcfg.sample_rate
        )
        times, s_int, tids = bank_nms(
            si, cfg.detect.nms_radius, max_peaks=top_k
        )
        # Presentation scale matches the TPU path: int32 -> float32,
        # then float32 division by the quantization scale.
        s = s_int.astype(np.float32) / scale
        per_utt.append((s, times, tids))
        labels.append(
            np.asarray(
                [s0 // fcfg.hop_length for (ph, s0, _e) in phones
                 if ph == target_phone],
                dtype=np.int64,
            )
        )
    from template_speech_recognition_tpu.detect import evaluate as ev
    from template_speech_recognition_tpu.pipeline import CorpusDetections

    dets = ev.DetectionSet.from_per_utterance(per_utt)
    return CorpusDetections(
        dets, labels, total_samples / corpus.sample_rate,
        list(range(len(per_utt))), {},
    )


def test_int32_roc_equality_end_to_end(corpus):
    cfg = PipelineConfig(detect=DetectConfig(exact_scores=True))
    bank = train_bank(corpus, ["aa"], cfg)

    tpu = detect_corpus(corpus, bank, cfg, target_phone="aa")
    orc = _oracle_detect_corpus(corpus, bank, cfg, target_phone="aa")

    # Identical detection sets: (utterance, time, template, score).
    np.testing.assert_array_equal(
        tpu.detections.utterance_ids, orc.detections.utterance_ids
    )
    np.testing.assert_array_equal(tpu.detections.times, orc.detections.times)
    np.testing.assert_array_equal(
        tpu.detections.template_ids, orc.detections.template_ids
    )
    np.testing.assert_array_equal(
        np.asarray(tpu.detections.scores, np.float32),
        np.asarray(orc.detections.scores, np.float32),
    )

    # Same detections -> identical ROC arrays, via two independently
    # written match/ROC implementations (detect.evaluate here,
    # oracle.detect below).
    m_tpu = evaluate_detections(tpu, cfg.detect.match_tolerance)
    is_tp_parts = [
        O.match_detections(
            orc.detections.times[orc.detections.utterance_ids == u],
            orc.detections.scores[orc.detections.utterance_ids == u],
            orc.labels_per_utterance[u],
            cfg.detect.match_tolerance,
        )
        for u in range(len(orc.labels_per_utterance))
    ]
    is_tp = np.concatenate(is_tp_parts) if is_tp_parts else np.zeros(0, bool)
    num_labels = int(sum(len(l) for l in orc.labels_per_utterance))
    thr_o, tpr_o, fps_o = O.roc_curve(
        orc.detections.scores, is_tp, num_labels, orc.audio_seconds
    )
    np.testing.assert_array_equal(m_tpu["thresholds"], thr_o)
    np.testing.assert_array_equal(m_tpu["tpr"], tpr_o)
    np.testing.assert_array_equal(m_tpu["fp_per_sec"], fps_o)
    assert m_tpu["num_labels"] == num_labels
    # The fixture is easy; the exact path must nail it too.
    assert m_tpu["best_tpr"] >= 0.9, m_tpu
    assert m_tpu["eer"] <= 0.15, m_tpu
