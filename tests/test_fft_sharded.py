"""Sharded FFT scoring on 8 fake CPU devices: sharded == unsharded.

When each time shard's local length is a multiple of the overlap-save
hop, the local block decomposition coincides with the unsharded one,
so each window's dot products see identical operands -- sharded
matches unsharded to the last ulp (GEMM tiling may still split the
reduction differently, so exact bit equality is not guaranteed even
in f32); for unaligned lengths block boundaries differ too.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.config import MeshConfig
from template_speech_recognition_tpu.detect.fft_scorer import (
    build_fft_bank,
    fft_sliding_scores,
)
from template_speech_recognition_tpu.parallel import (
    build_mesh,
    sharded_fft_bank_scores,
)


def _case(b, t, k, length=9, f=16, e=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = (rng.random((b, t, f, e)) < 0.15).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    return feats, w, c


def _padded_ref(feats, bank):
    """Unsharded twin with the same [B, K, T] zero-padded-tail layout."""
    b, t = feats.shape[0], feats.shape[1]
    length = bank.length
    ext = np.zeros(
        (b, t + length - 1) + feats.shape[2:], feats.dtype
    )
    ext[:, :t] = feats
    return np.asarray(fft_sliding_scores(jnp.asarray(ext), bank))


@pytest.mark.parametrize(
    "mesh_shape", [(1, 1, 8), (1, 8, 1), (2, 2, 2), (8, 1, 1), (2, 1, 4)]
)
def test_fft_sharded_matches_unsharded(mesh_shape):
    d_ax, b_ax, t_ax = mesh_shape
    mesh = build_mesh(MeshConfig(d_ax, b_ax, t_ax))
    # local T_l = 56 = nfft(64) - L(9) + 1 -> hop-aligned shards:
    # block decompositions coincide.
    length, nfft = 9, 64
    hop = nfft - length + 1
    feats, w, c = _case(b=d_ax * 2, t=t_ax * hop, k=b_ax * 4, length=length)
    bank = build_fft_bank(
        jnp.asarray(w), jnp.asarray(c), nfft=nfft, mm_dtype=jnp.float32
    )
    got = np.asarray(
        sharded_fft_bank_scores(jnp.asarray(feats), bank, mesh)
    )
    ref = _padded_ref(feats, bank)
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-6)


def test_fft_sharded_unaligned_time_allclose():
    mesh = build_mesh(MeshConfig(1, 2, 4))
    length, nfft = 9, 64
    feats, w, c = _case(b=2, t=4 * 40, k=8, length=length, seed=3)
    bank = build_fft_bank(
        jnp.asarray(w), jnp.asarray(c), nfft=nfft, mm_dtype=jnp.float32
    )
    got = np.asarray(
        sharded_fft_bank_scores(jnp.asarray(feats), bank, mesh)
    )
    ref = _padded_ref(feats, bank)
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)
