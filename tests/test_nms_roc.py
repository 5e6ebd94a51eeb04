"""NMS / top-K / ROC / EER parity and properties."""

import numpy as np
import jax.numpy as jnp

import oracle as O
from oracle.detect import bank_nms, nms_mask as nms_mask_o
from template_speech_recognition_tpu.detect import (
    eer,
    match_detections,
    nms_mask,
    roc_curve,
    top_detections,
)
from template_speech_recognition_tpu.detect.evaluate import DetectionSet, match_detection_set


def test_nms_mask_parity_float():
    rng = np.random.default_rng(0)
    s = rng.normal(size=200).astype(np.float32)
    for r in (1, 5, 17):
        np.testing.assert_array_equal(
            nms_mask_o(s, r), np.asarray(nms_mask(jnp.asarray(s), r))
        )


def test_nms_mask_parity_int_with_ties():
    rng = np.random.default_rng(1)
    s = rng.integers(-5, 5, size=300).astype(np.int32)  # many ties
    for r in (1, 4, 9):
        np.testing.assert_array_equal(
            nms_mask_o(s, r), np.asarray(nms_mask(jnp.asarray(s), r))
        )


def test_nms_idempotent():
    """Property (SURVEY.md 4 item 3): suppressing an already-suppressed
    curve (peaks kept at own value, others at -inf) is a fixed point."""
    rng = np.random.default_rng(2)
    s = rng.normal(size=150).astype(np.float32)
    r = 6
    keep = np.asarray(nms_mask(jnp.asarray(s), r))
    sup = np.where(keep, s, -np.inf).astype(np.float32)
    keep2 = np.asarray(nms_mask(jnp.asarray(sup), r))
    np.testing.assert_array_equal(keep2 & keep, keep)


def test_top_detections_match_oracle_bank_nms():
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(4, 120)).astype(np.float32)
    radius, top_k = 7, 10
    s, t, k = (np.asarray(a) for a in top_detections(jnp.asarray(scores), radius, top_k))
    to, so, ko = bank_nms(scores, radius)
    n = min(top_k, len(to))
    np.testing.assert_allclose(s[:n], so[:n], rtol=1e-6)
    np.testing.assert_array_equal(t[:n], to[:n])
    np.testing.assert_array_equal(k[:n], ko[:n])
    assert np.all(np.isneginf(s[n:]))


def test_match_and_roc_parity():
    rng = np.random.default_rng(4)
    det_t = rng.integers(0, 500, 40)
    det_s = rng.normal(size=40)
    labels = rng.integers(0, 500, 10)
    tol = 8
    tp_o = O.match_detections(det_t, det_s, labels, tol)
    tp_f = match_detections(det_t, det_s, labels, tol)
    np.testing.assert_array_equal(tp_o, tp_f)
    r_o = O.roc_curve(det_s, tp_o, 10, 60.0)
    r_f = roc_curve(det_s, tp_f, 10, 60.0)
    for a, b in zip(r_o, r_f):
        np.testing.assert_allclose(a, b)
    assert O.eer(r_o[1], r_o[2]) == eer(r_f[1], r_f[2])


def test_detection_set_collection():
    per_utt = [
        (np.array([3.0, -np.inf]), np.array([5, 0]), np.array([1, 0])),
        (np.array([2.0, 1.0]), np.array([9, 40]), np.array([0, 2])),
    ]
    ds = DetectionSet.from_per_utterance(per_utt)
    assert len(ds.scores) == 3
    np.testing.assert_array_equal(ds.utterance_ids, [0, 1, 1])
    is_tp, n = match_detection_set(ds, [np.array([6]), np.array([38])], tolerance=3)
    assert n == 2
    np.testing.assert_array_equal(is_tp, [True, False, True])
