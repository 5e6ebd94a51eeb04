"""Parity tests: TPU classification and parts coding vs the oracle."""

import numpy as np
import jax.numpy as jnp

import oracle as O
from oracle.classify import classify_segment
from oracle.parts import code_parts as o_code_parts, learn_parts as o_learn_parts

from template_speech_recognition_tpu.detect.classify import (
    classify_segments,
    pad_segments,
)
from template_speech_recognition_tpu.models.bank import TemplateBank
from template_speech_recognition_tpu.models.parts import (
    code_parts,
    code_parts_batch,
    learn_parts,
    part_logliks,
)

from helpers import small_setup


def _two_class_setup(seed=0):
    s = small_setup(seed)
    corpus, p = s["corpus"], s["params"]
    min_len = p.frame_length + 3 * p.hop_length
    per_phone = {}
    for phone in ("aa", "iy"):
        per_phone[phone] = [
            O.frontend(c, p)
            for c in corpus.exemplar_clips(phone)
            if len(c) >= min_len
        ]
    # Common registered length: banks stack templates on one [K, L, F, E]
    # tensor, so classes share L (the oracle supports this too).
    target = int(np.median([f.shape[0] for fs in per_phone.values() for f in fs]))
    classes = {
        ph: O.estimate_template(O.register_exemplars(fs, target))
        for ph, fs in per_phone.items()
    }
    return s, classes


def test_classify_matches_oracle_sliding_and_short():
    s, classes = _two_class_setup()
    bank = TemplateBank.from_classes(classes, s["background"])
    segments = s["feats"][:3]
    # Include a segment shorter than the template (registered branch).
    short = segments[0][: max(2, bank.template_length // 2)]
    segs = segments + [short]
    batch, lens = pad_segments([x.astype(np.float32) for x in segs])
    preds, per_class = classify_segments(batch, lens, bank)
    names = sorted(classes)
    for i, seg in enumerate(segs):
        o_pred, o_scores = classify_segment(seg, classes, s["background"])
        assert preds[i] == o_pred
        for ci, name in enumerate(names):
            np.testing.assert_allclose(
                per_class[i, ci], o_scores[name], rtol=1e-4, atol=1e-3
            )


def test_classify_dtw_matches_oracle():
    s, classes = _two_class_setup()
    bank = TemplateBank.from_classes(classes, s["background"])
    segs = [f.astype(np.float32) for f in s["feats"][:2]]
    batch, lens = pad_segments(segs)
    preds, per_class = classify_segments(batch, lens, bank, use_dtw=True, band=4)
    names = sorted(classes)
    for i, seg in enumerate(segs):
        o_pred, o_scores = classify_segment(
            seg, classes, s["background"], use_dtw=True, band=4
        )
        assert preds[i] == o_pred
        for ci, name in enumerate(names):
            np.testing.assert_allclose(
                per_class[i, ci], o_scores[name], rtol=1e-4, atol=1e-3
            )


def test_part_logliks_and_coding_match_oracle():
    s = small_setup(0)
    fmaps = [f for f in s["feats"] if f.shape[0] >= 8]
    parts = o_learn_parts(fmaps, num_parts=4, patch_time=3, patch_freq=3,
                          num_patches=64, seed=5, num_iters=5)
    fm = fmaps[0]
    got = np.asarray(code_parts(jnp.asarray(fm), jnp.asarray(parts)))
    want = o_code_parts(fm, parts)
    assert got.shape == want.shape
    # Binary indicator maps must agree exactly (ties broken by argmax
    # first-max in both implementations; float paths are HIGHEST prec).
    mismatch = np.mean(got != want)
    assert mismatch < 1e-3, f"indicator mismatch rate {mismatch}"


def test_learn_parts_tpu_matches_oracle_dictionary():
    s = small_setup(0)
    fmaps = [f for f in s["feats"] if f.shape[0] >= 8]
    got = np.asarray(
        learn_parts(fmaps, num_parts=3, patch_time=3, patch_freq=3,
                    num_patches=48, seed=2, num_iters=6)
    )
    want = o_learn_parts(fmaps, num_parts=3, patch_time=3, patch_freq=3,
                         num_patches=48, seed=2, num_iters=6)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_code_parts_strided_and_batched():
    s = small_setup(0)
    fmaps = [f for f in s["feats"] if f.shape[0] >= 10]
    parts = o_learn_parts(fmaps, num_parts=4, patch_time=3, patch_freq=3,
                          num_patches=64, seed=7, num_iters=4)
    fm = fmaps[0][:10]
    got = np.asarray(
        code_parts(jnp.asarray(fm), jnp.asarray(parts), stride_time=2, stride_freq=2)
    )
    want = o_code_parts(fm, parts, stride_time=2, stride_freq=2)
    assert got.shape == want.shape
    assert np.mean(got != want) < 1e-3
    batch = jnp.asarray(np.stack([fm, fm]))
    got_b = np.asarray(code_parts_batch(batch, jnp.asarray(parts),
                                        stride_time=2, stride_freq=2))
    assert (got_b[0] == got).all() and (got_b[1] == got).all()


def test_threshold_gates_low_loglik_locations():
    s = small_setup(0)
    fmaps = [f for f in s["feats"] if f.shape[0] >= 8]
    parts = o_learn_parts(fmaps, num_parts=4, patch_time=3, patch_freq=3,
                          num_patches=64, seed=5, num_iters=5)
    fm = jnp.asarray(fmaps[0])
    ll = np.asarray(part_logliks(fm, jnp.asarray(parts)))
    thr = float(np.median(ll.max(axis=-1)))
    coded = np.asarray(code_parts(fm, jnp.asarray(parts), loglik_threshold=thr))
    active = coded.any(axis=-1)
    np.testing.assert_array_equal(active, ll.max(axis=-1) >= thr)
