"""End-to-end integration: train -> detect -> evaluate on the synthetic
corpus (SURVEY.md section 4 item 5; configs 1-3)."""

import numpy as np
import pytest

import oracle as O
from template_speech_recognition_tpu.config import (
    DetectConfig,
    PipelineConfig,
    TemplateConfig,
)
from template_speech_recognition_tpu.pipeline import (
    SyntheticAdapter,
    detect_corpus,
    evaluate_detections,
    train_bank,
)


@pytest.fixture(scope="module")
def corpus():
    return SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=6, phones_per_utterance=6, seed=11)
    )


def test_single_template_end_to_end(corpus):
    cfg = PipelineConfig()
    bank = train_bank(corpus, ["aa"], cfg)
    assert bank.num_templates == 1
    result = detect_corpus(corpus, bank, cfg, target_phone="aa")
    metrics = evaluate_detections(result, cfg.detect.match_tolerance)
    assert metrics["num_labels"] > 0
    assert metrics["num_detections"] > 0
    # The synthetic corpus is easy by construction: the detector must
    # essentially nail it (round-2 verdict, next-item 4 -- the old
    # gates would have passed a near-random detector).  Measured on
    # this fixture: eer == 0.0, best_tpr == 1.0.
    assert metrics["best_tpr"] >= 0.9, metrics
    assert metrics["eer"] <= 0.15, metrics


def test_mixture_bank_end_to_end(corpus):
    cfg = PipelineConfig(template=TemplateConfig(num_components=2, em_max_iters=15))
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    assert bank.num_templates == 4
    assert bank.labels == ["aa", "aa", "iy", "iy"]
    result = detect_corpus(corpus, bank, cfg, target_phone="aa")
    # Restrict the ROC to the target class's templates: with a
    # multi-class bank, 'iy' wins at 'iy' locations by design and must
    # not count as 'aa' false positives.
    mask = np.asarray([lbl == "aa" for lbl in bank.labels])
    metrics = evaluate_detections(
        result, cfg.detect.match_tolerance, template_mask=mask
    )
    assert metrics["num_detections"] > 0
    assert metrics["best_tpr"] >= 0.9, metrics
    assert metrics["eer"] <= 0.15, metrics


def test_detections_deterministic(corpus):
    cfg = PipelineConfig(detect=DetectConfig(top_k=16))
    bank = train_bank(corpus, ["iy"], cfg)
    r1 = detect_corpus(corpus, bank, cfg, target_phone="iy")
    r2 = detect_corpus(corpus, bank, cfg, target_phone="iy")
    np.testing.assert_array_equal(r1.detections.scores, r2.detections.scores)
    np.testing.assert_array_equal(r1.detections.times, r2.detections.times)


def test_fft_backend_end_to_end(corpus):
    """config 1 with the frequency-domain scorer: same detections (to
    bf16-class score tolerance) and equivalent accuracy as conv."""
    cfg = PipelineConfig(detect=DetectConfig(score_backend="fft"))
    bank = train_bank(corpus, ["aa"], cfg)
    result = detect_corpus(corpus, bank, cfg, target_phone="aa")
    metrics = evaluate_detections(result, cfg.detect.match_tolerance)
    assert metrics["num_detections"] > 0
    assert metrics["best_tpr"] >= 0.9, metrics
    assert metrics["eer"] <= 0.15, metrics

    ref = detect_corpus(
        corpus, bank, PipelineConfig(), target_phone="aa"
    )
    # Same top-1 detection per utterance (scores differ at bf16 level,
    # ranks of well-separated peaks must not).
    for utt in set(ref.detections.utterance_ids.tolist()):
        sel_f = result.detections.utterance_ids == utt
        sel_r = ref.detections.utterance_ids == utt
        top_f = result.detections.times[sel_f][
            np.argmax(result.detections.scores[sel_f])
        ]
        top_r = ref.detections.times[sel_r][
            np.argmax(ref.detections.scores[sel_r])
        ]
        assert abs(int(top_f) - int(top_r)) <= 1
