"""Multi-restart Bernoulli-mixture EM: oracle/TPU selection parity and
best-of-restarts improvement (SURVEY.md section 2a mixture row)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle as O
from oracle.mixture import init_responsibilities
from template_speech_recognition_tpu.models import (
    bernoulli_mixture_em,
    bernoulli_mixture_em_restarts,
)


def _data(n=60, d=24, seed=0):
    rng = np.random.default_rng(seed)
    # two latent prototypes -> a genuinely multimodal fit surface
    protos = rng.random((2, d)) < 0.5
    who = rng.integers(0, 2, n)
    flip = rng.random((n, d)) < 0.1
    return (protos[who] ^ flip).astype(np.float32)


def test_restarts_match_oracle_selection():
    x = _data()
    r, k = 4, 3
    means_o, _w, hist_o, _it, best_o = O.bernoulli_mixture_em_restarts(
        x, k, r, seed=7, num_iters=25
    )
    resps = jnp.stack([
        jnp.asarray(init_responsibilities(x.shape[0], k, 7 + i))
        for i in range(r)
    ])
    state, best_t = bernoulli_mixture_em_restarts(
        jnp.asarray(x), resps, num_iters=25
    )
    assert int(best_t) == best_o
    np.testing.assert_allclose(np.asarray(state.means), means_o,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(state.log_likelihood), float(hist_o[-1]), rtol=1e-5
    )


def test_restarts_never_worse_than_single():
    x = jnp.asarray(_data(seed=3))
    k = 3
    single = bernoulli_mixture_em(
        x, jnp.asarray(init_responsibilities(x.shape[0], k, 0)), num_iters=25
    )
    resps = jnp.stack([
        jnp.asarray(init_responsibilities(x.shape[0], k, i))
        for i in range(5)
    ])
    multi, _ = bernoulli_mixture_em_restarts(x, resps, num_iters=25)
    assert float(multi.log_likelihood) >= float(single.log_likelihood) - 1e-6


def test_train_bank_with_restarts():
    from template_speech_recognition_tpu.config import (
        PipelineConfig,
        TemplateConfig,
    )
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        train_bank,
    )

    corpus = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=5, phones_per_utterance=5,
                                seed=2)
    )
    cfg = PipelineConfig(template=TemplateConfig(
        num_components=2, em_max_iters=10, em_restarts=3
    ))
    bank = train_bank(corpus, ["aa"], cfg)
    assert bank.num_templates == 2
    assert np.isfinite(np.asarray(bank.templates)).all()
