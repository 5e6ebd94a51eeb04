"""Scoring parity: float allclose, int32 bit-parity (BASELINE.json:5)."""

import numpy as np
import jax.numpy as jnp

import oracle as O
from template_speech_recognition_tpu.detect import (
    masked_scores,
    sliding_scores,
    sliding_scores_int,
)
from tests.helpers import small_setup


def test_float_scores_allclose():
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[0].waveform, st["params"])
    sc_o = O.sliding_score(fm, st["w"], st["c"])
    sc_t = np.asarray(
        sliding_scores(jnp.asarray(fm), jnp.asarray(st["w"])[None], jnp.asarray([st["c"]]))
    )[0]
    assert sc_t.shape == sc_o.shape
    np.testing.assert_allclose(sc_t, sc_o, rtol=2e-5, atol=2e-2)


def test_int_scores_bit_parity():
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[0].waveform, st["params"])
    wi, ci = O.quantize_filter(st["w"], st["c"])
    si_o = O.sliding_score_int(fm, wi, ci)
    si_t = np.asarray(
        sliding_scores_int(jnp.asarray(fm), jnp.asarray(wi)[None], jnp.asarray(ci).reshape(1))
    )[0]
    np.testing.assert_array_equal(si_o, si_t)


def test_int_scores_bit_parity_random_bank():
    rng = np.random.default_rng(7)
    fm = rng.random((60, 24, 8)) < 0.15
    w = rng.normal(size=(5, 9, 24, 8)).astype(np.float32) * 3
    c = rng.normal(size=(5,)).astype(np.float32)
    wi, ci = O.quantize_filter(w, c)
    si_o = O.sliding_score_int(fm, wi, ci)
    si_t = np.asarray(sliding_scores_int(jnp.asarray(fm), jnp.asarray(wi), jnp.asarray(ci)))
    np.testing.assert_array_equal(si_o, si_t)


def test_bank_scores_match_per_template():
    """[K] bank scoring == K single-template scorings."""
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[1].waveform, st["params"])
    rng = np.random.default_rng(1)
    w = np.stack([st["w"], st["w"] * 0.5, rng.normal(size=st["w"].shape).astype(np.float32)])
    c = np.asarray([st["c"], st["c"] * 0.5, 0.0], np.float32)
    bank = np.asarray(sliding_scores(jnp.asarray(fm), jnp.asarray(w), jnp.asarray(c)))
    for k in range(3):
        single = O.sliding_score(fm, w[k], c[k])
        np.testing.assert_allclose(bank[k], single, rtol=2e-5, atol=2e-2)


def test_masked_scores():
    scores = jnp.ones((2, 10))
    out = np.asarray(masked_scores(scores, jnp.int32(7), 3))
    # valid starts: t <= 7 - 3 = 4
    assert np.isfinite(out[:, :5]).all()
    assert np.isinf(out[:, 5:]).all() and (out[:, 5:] < 0).all()


def test_score_invariance_under_padding():
    """Property: scores over the valid region don't depend on how much
    zero padding follows the features."""
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[2].waveform, st["params"])
    w, c = jnp.asarray(st["w"])[None], jnp.asarray([st["c"]])
    base = np.asarray(sliding_scores(jnp.asarray(fm), w, c))
    padded = np.zeros((fm.shape[0] + 50,) + fm.shape[1:], bool)
    padded[: fm.shape[0]] = fm
    ext = np.asarray(sliding_scores(jnp.asarray(padded), w, c))
    n_valid = base.shape[1]
    np.testing.assert_allclose(ext[:, :n_valid], base, rtol=1e-6, atol=1e-4)
