"""Parity tests for the Pallas sliding-correlation kernel.

Runs in interpret mode on CPU (conftest forces JAX_PLATFORMS=cpu); the
compiled path is exercised on real TPU by bench/dev runs.  Oracle:
``ops.correlation_pallas.correlation_scores_reference`` (XLA conv),
itself allclose-tested against ``oracle.score.sliding_score`` in
test_score_parity.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.ops.correlation_pallas import (
    correlation_scores_pallas,
    correlation_scores_reference,
)


def _rand(t, d, k, length, seed=0):
    rng = np.random.default_rng(seed)
    feats = (rng.random((t, d)) < 0.2).astype(np.float32)
    w = rng.standard_normal((k, length, d)).astype(np.float32)
    c = rng.standard_normal((k,)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(w), jnp.asarray(c)


@pytest.mark.parametrize("t,d,k,length", [(256, 128, 128, 16), (256, 256, 128, 9)])
def test_pallas_matches_conv_reference(t, d, k, length):
    feats, w, c = _rand(t, d, k, length)
    out = correlation_scores_pallas(
        feats, w, c, block_k=128, block_t=128, block_d=128, interpret=True
    )
    ref = correlation_scores_reference(feats, w, c)
    valid = t - length + 1
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_tail_region_only_invalid_windows_differ():
    # Windows with start < T - L + 1 are exact even in the last t-tile.
    t, d, k, length = 256, 128, 128, 32
    feats, w, c = _rand(t, d, k, length, seed=3)
    out = correlation_scores_pallas(
        feats, w, c, block_k=128, block_t=128, block_d=128, interpret=True
    )
    ref = correlation_scores_reference(feats, w, c)
    valid = t - length + 1
    np.testing.assert_allclose(
        np.asarray(out)[:, valid - 8 : valid],
        np.asarray(ref)[:, valid - 8 : valid],
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_rejects_bad_shapes():
    feats, w, c = _rand(200, 128, 128, 16)
    with pytest.raises(ValueError):
        correlation_scores_pallas(
            feats, w, c, block_k=128, block_t=128, block_d=128, interpret=True
        )
