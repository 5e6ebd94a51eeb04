"""Blockwise (streaming) scoring == full scoring."""

import numpy as np
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.detect.scorer import (
    sliding_scores,
    sliding_scores_blockwise,
)


def _case(t=700, k=6, length=9, f=16, e=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray((rng.random((t, f, e)) < 0.15).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, length, f, e)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    return feats, w, c


@pytest.mark.parametrize("block_t", [64, 128, 512, 1024])
def test_blockwise_matches_full(block_t):
    feats, w, c = _case()
    full = np.asarray(sliding_scores(feats, w, c))
    blk = np.asarray(sliding_scores_blockwise(feats, w, c, block_t=block_t))
    assert blk.shape == full.shape
    np.testing.assert_allclose(blk, full, rtol=1e-5, atol=1e-4)


def test_blockwise_chunk_boundary_windows():
    # Windows straddling a chunk boundary are the failure mode: an
    # off-by-one halo would shift these scores by whole features, not
    # by float noise.  (XLA may re-order the conv reduction between the
    # chunked and full layouts, so exact-bit equality is not required.)
    feats, w, c = _case(t=300, length=17, seed=3)
    full = np.asarray(sliding_scores(feats, w, c))
    blk = np.asarray(sliding_scores_blockwise(feats, w, c, block_t=64))
    boundary = slice(64 - 17, 64 + 2)
    np.testing.assert_allclose(
        blk[:, boundary], full[:, boundary], rtol=1e-4, atol=1e-4
    )


def test_blockwise_halo_exactly_one_block():
    # L-1 == block_t: the halo is an entire following chunk -- edge case.
    feats, w, c = _case(t=256, length=65, seed=4)
    full = np.asarray(sliding_scores(feats, w, c))
    blk = np.asarray(sliding_scores_blockwise(feats, w, c, block_t=64))
    np.testing.assert_allclose(blk, full, rtol=1e-5, atol=1e-4)


def test_blockwise_rejects_template_longer_than_halo():
    feats, w, c = _case(t=256, length=66, seed=5)
    with pytest.raises(ValueError):
        sliding_scores_blockwise(feats, w, c, block_t=64)
