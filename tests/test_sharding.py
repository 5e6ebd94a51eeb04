"""Distributed logic on 8 fake CPU devices (SURVEY.md section 4 item 4).

Mesh axes (data, bank, time); asserts sharded == replicated exactly
for scoring (halo exchange) and EM (psum sufficient statistics), and
shard-count invariance for the top-K merge.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle.mixture import init_responsibilities
import oracle as O
from template_speech_recognition_tpu.config import MeshConfig
from template_speech_recognition_tpu.models import bernoulli_mixture_em
from template_speech_recognition_tpu.parallel import (
    build_mesh,
    merge_topk,
    padded_scores_reference,
    sharded_bank_scores,
    sharded_bernoulli_mixture_em,
)
from template_speech_recognition_tpu.parallel.topk_merge import merge_topk_collective


def _score_case(b=2, t=64, k=4, length=9, f=16, e=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = (rng.random((b, t, f, e)) < 0.15).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    return feats, w, c


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake CPU devices"


@pytest.mark.parametrize(
    "mesh_shape", [(1, 1, 8), (1, 8, 1), (2, 2, 2), (8, 1, 1), (2, 1, 4)]
)
def test_sharded_scores_exact(mesh_shape):
    d, bk, tm = mesh_shape
    feats, w, c = _score_case(b=max(d, 2), t=64, k=8)
    mesh = build_mesh(MeshConfig(d, bk, tm))
    ref = np.asarray(padded_scores_reference(jnp.asarray(feats), jnp.asarray(w), jnp.asarray(c)))
    got = np.asarray(
        sharded_bank_scores(jnp.asarray(feats), jnp.asarray(w), jnp.asarray(c), mesh)
    )
    if bk == 1 and d == 1:
        # Halo correctness is bit-exact: the per-window reduction is
        # computed by the identical conv on every time shard
        # (SURVEY.md section 4 item 4c).
        np.testing.assert_array_equal(got, ref)
    else:
        # Bank/data sharding change the conv's output-channel / batch
        # extent, and XLA may pick a different (equally valid)
        # reduction order -> tight allclose instead of bitwise.
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_sharded_scores_match_oracle():
    feats, w, c = _score_case(b=2, t=48, k=4, length=7)
    mesh = build_mesh(MeshConfig(2, 2, 2))
    got = np.asarray(
        sharded_bank_scores(jnp.asarray(feats), jnp.asarray(w), jnp.asarray(c), mesh)
    )
    for b in range(feats.shape[0]):
        ref = O.sliding_score(feats[b].astype(bool), w, c)
        n_valid = ref.shape[1]
        np.testing.assert_allclose(got[b, :, :n_valid], ref, rtol=2e-5, atol=1e-3)


def _em_case(n=48, d=32, k=4, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.random((k, d)) < 0.4
    x = (protos[rng.integers(0, k, n)] ^ (rng.random((n, d)) < 0.1)).astype(np.float32)
    resp = init_responsibilities(n, k, seed + 1)
    return x, resp


@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (1, 4, 1), (4, 2, 1)])
def test_sharded_em_matches_replicated(mesh_shape):
    d, bk, tm = mesh_shape
    x, resp = _em_case()
    mesh = build_mesh(MeshConfig(d, bk, tm))
    ref = bernoulli_mixture_em(jnp.asarray(x), jnp.asarray(resp), num_iters=12)
    got = sharded_bernoulli_mixture_em(
        jnp.asarray(x), jnp.asarray(resp), mesh, num_iters=12
    )
    assert int(got.iteration) == int(ref.iteration)
    np.testing.assert_allclose(np.asarray(got.means), np.asarray(ref.means), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.weights), np.asarray(ref.weights), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(got.log_likelihood), float(ref.log_likelihood), rtol=1e-5
    )


def test_merge_topk_shard_invariance():
    """Global top-K is identical no matter how candidates are split."""
    rng = np.random.default_rng(5)
    s = rng.normal(size=64).astype(np.float32)
    s[rng.random(64) < 0.3] = -np.inf
    t = rng.integers(0, 1000, 64).astype(np.int32)
    k = rng.integers(0, 16, 64).astype(np.int32)
    ref = merge_topk(jnp.asarray(s), jnp.asarray(t), jnp.asarray(k), 10)
    for shards in (2, 4, 8):
        sp = jnp.asarray(s.reshape(shards, -1))
        tp = jnp.asarray(t.reshape(shards, -1))
        kp = jnp.asarray(k.reshape(shards, -1))
        got = merge_topk(sp, tp, kp, 10)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_topk_tie_break():
    s = jnp.asarray([1.0, 2.0, 2.0, 1.0])
    t = jnp.asarray([5, 9, 3, 5], jnp.int32)
    k = jnp.asarray([1, 0, 2, 0], jnp.int32)
    out_s, out_t, out_k = merge_topk(s, t, k, 4)
    np.testing.assert_array_equal(np.asarray(out_s), [2.0, 2.0, 1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(out_t), [3, 9, 5, 5])  # time asc among score ties
    np.testing.assert_array_equal(np.asarray(out_k), [2, 0, 0, 1])  # id asc among (s, t) ties


def test_merge_topk_collective_in_shard_map():
    """End-to-end: per-shard local top-K then collective merge inside
    shard_map equals a host-side global top-K."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(6)
    n_shards, per = 8, 16
    s = rng.normal(size=(n_shards, per)).astype(np.float32)
    t = np.tile(np.arange(per, dtype=np.int32), (n_shards, 1))
    k = rng.integers(0, 4, size=(n_shards, per)).astype(np.int32)
    mesh = build_mesh(MeshConfig(1, 1, 8))

    def body(s_l, t_l, k_l):
        off = jax.lax.axis_index("time") * per
        return merge_topk_collective(
            s_l[0], t_l[0], k_l[0], ("time",), 12, time_offset=off
        )

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("time", None), P("time", None), P("time", None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    got = fn(jnp.asarray(s), jnp.asarray(t), jnp.asarray(k))
    t_global = (t + np.arange(n_shards, dtype=np.int32)[:, None] * per)
    ref = merge_topk(
        jnp.asarray(s.reshape(-1)), jnp.asarray(t_global.reshape(-1)),
        jnp.asarray(k.reshape(-1)), 12,
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
