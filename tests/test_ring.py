"""Ring schedule + all_to_all reshard vs the replicated reference
(8 fake CPU devices; SURVEY.md section 2c ring/Ulysses rows)."""

import numpy as np
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.config import MeshConfig
from template_speech_recognition_tpu.parallel import (
    build_mesh,
    padded_scores_reference,
)
from template_speech_recognition_tpu.parallel.ring import (
    channel_parallel_scores,
    ring_bank_scores,
)


def _case(b=2, t=128, k=8, length=9, f=16, e=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = (rng.random((b, t, f, e)) < 0.15).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(w), jnp.asarray(c)


@pytest.mark.parametrize(
    "mesh_shape", [(1, 8, 1), (1, 4, 2), (1, 2, 4), (2, 2, 2), (1, 1, 8)]
)
def test_ring_matches_reference(mesh_shape):
    d, bk, tm = mesh_shape
    feats, w, c = _case(b=max(d, 2))
    mesh = build_mesh(MeshConfig(d, bk, tm))
    ref = np.asarray(padded_scores_reference(feats, w, c))
    got = np.asarray(ring_bank_scores(feats, w, c, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_ring_rejects_small_chunks():
    feats, w, c = _case(t=64, length=17)  # chunk = 64/8 = 8 < L-1 = 16
    mesh = build_mesh(MeshConfig(1, 8, 1))
    with pytest.raises(ValueError):
        ring_bank_scores(feats, w, c, mesh)


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (1, 4, 2), (2, 2, 2)])
def test_channel_parallel_matches_reference(mesh_shape):
    d, bk, tm = mesh_shape
    feats, w, c = _case(b=max(d, 2))
    mesh = build_mesh(MeshConfig(d, bk, tm))
    ref = np.asarray(padded_scores_reference(feats, w, c))
    got = np.asarray(channel_parallel_scores(feats, w, c, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_ring_memory_layout_is_chunked():
    # The ring path's input spec shards T over (time, bank): with
    # T=128 on an 8-way bank axis each device holds 16 frames + halo,
    # vs 128 frames in the replicated layout -- the point of the ring.
    feats, w, c = _case(t=128, length=9)
    mesh = build_mesh(MeshConfig(1, 8, 1))
    got = np.asarray(ring_bank_scores(feats, w, c, mesh))
    assert got.shape == (2, 8, 128)
