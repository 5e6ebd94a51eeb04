"""Registration / template / background / mixture-EM parity + properties."""

import numpy as np
import jax.numpy as jnp

import oracle as O
from oracle.mixture import init_responsibilities
from template_speech_recognition_tpu.models import (
    TemplateBank,
    bernoulli_mixture_em,
    estimate_background,
    estimate_template,
    register_exemplars,
)
from tests.helpers import small_setup


def _padded_stack(feats):
    lengths = np.array([f.shape[0] for f in feats])
    l_max = lengths.max()
    padded = np.zeros((len(feats), l_max) + feats[0].shape[1:], bool)
    for i, f in enumerate(feats):
        padded[i, : f.shape[0]] = f
    return padded, lengths


def test_registration_bit_parity():
    st = small_setup()
    padded, lengths = _padded_stack(st["feats"])
    target = int(np.median(lengths))
    reg_t = np.asarray(
        register_exemplars(jnp.asarray(padded), jnp.asarray(lengths), target)
    )
    reg_o = O.register_exemplars(st["feats"], target)
    np.testing.assert_array_equal(reg_t, reg_o)


def test_template_estimate_allclose():
    st = small_setup()
    tpl_t = np.asarray(estimate_template(jnp.asarray(st["stack"])))
    np.testing.assert_allclose(tpl_t, st["template"], atol=1e-6)


def test_background_allclose():
    st = small_setup()
    p = st["params"]
    min_len = p.frame_length + 3 * p.hop_length
    bg = [O.frontend(c, p) for c in st["corpus"].background_clips("aa") if len(c) >= min_len]
    q_o = O.estimate_background(bg)
    padded, lengths = _padded_stack(bg)
    q_t = np.asarray(
        estimate_background(jnp.asarray(padded), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(q_t, q_o, atol=1e-5)


def _em_data(seed=0, n=40, d=64):
    rng = np.random.default_rng(seed)
    protos = rng.random((3, d)) < 0.3
    comp = rng.integers(0, 3, n)
    flip = rng.random((n, d)) < 0.1
    return (protos[comp] ^ flip).astype(np.float32)


def test_em_parity_vs_oracle():
    x = _em_data()
    resp = init_responsibilities(x.shape[0], 3, seed=5)
    means_o, weights_o, hist_o, iters_o = O.bernoulli_mixture_em(x, resp, num_iters=25)
    state = bernoulli_mixture_em(jnp.asarray(x), jnp.asarray(resp), num_iters=25)
    assert int(state.iteration) == iters_o
    np.testing.assert_allclose(np.asarray(state.means), means_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.weights), weights_o, rtol=1e-4, atol=1e-6)
    hist_t = np.asarray(state.history)[: iters_o]
    np.testing.assert_allclose(hist_t, hist_o, rtol=1e-4, atol=1e-3)


def test_em_monotone_loglik():
    """EM property: mean loglik never decreases (SURVEY.md 4 item 3)."""
    x = _em_data(seed=3)
    resp = init_responsibilities(x.shape[0], 4, seed=9)
    state = bernoulli_mixture_em(jnp.asarray(x), jnp.asarray(resp), num_iters=30, tol=0.0)
    hist = np.asarray(state.history)
    hist = hist[np.isfinite(hist)]
    assert np.all(np.diff(hist) >= -1e-3)


def test_em_mask_matches_subset():
    """Masked rows behave exactly like absent rows."""
    x = _em_data(seed=4, n=32)
    resp = init_responsibilities(24, 2, seed=1)
    full_resp = np.zeros((32, 2), np.float32)
    full_resp[:24] = resp
    mask = np.zeros(32, np.float32)
    mask[:24] = 1.0
    s_masked = bernoulli_mixture_em(
        jnp.asarray(x), jnp.asarray(full_resp), num_iters=10, mask=jnp.asarray(mask)
    )
    s_subset = bernoulli_mixture_em(jnp.asarray(x[:24]), jnp.asarray(resp), num_iters=10)
    np.testing.assert_allclose(
        np.asarray(s_masked.means), np.asarray(s_subset.means), rtol=1e-5, atol=1e-6
    )


def test_bank_roundtrip(tmp_path):
    st = small_setup()
    bank = TemplateBank.from_classes(
        {"aa": st["template"], "bb": np.stack([st["template"]] * 2)},
        st["background"],
    )
    assert bank.num_templates == 3
    assert bank.labels == ["aa", "bb", "bb"]
    path = str(tmp_path / "bank.npz")
    bank.save(path)
    loaded = TemplateBank.load(path)
    np.testing.assert_array_equal(np.asarray(loaded.templates), np.asarray(bank.templates))
    assert loaded.labels == bank.labels
    # LLR construction matches the oracle
    w, c = bank.llr()
    w_o, c_o = O.llr_filter(np.asarray(bank.templates), st["background"])
    np.testing.assert_allclose(np.asarray(w), w_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_o, rtol=1e-4, atol=1e-2)
