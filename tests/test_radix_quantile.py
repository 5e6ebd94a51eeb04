"""Radix-select order statistic == full-sort order statistic, bitwise.

The production quantile path (``ops.edges.quantile_threshold`` with
``method="radix"``) must select the exact same float32 element as the
sort-based spec path for any input, including negative values, exact
ties, +/-0.0, and masked (invalid-row) cells.  Also: the gather-free
framing and OR-of-shifts spreading must match their previous (gather /
reduce_window) semantics exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from template_speech_recognition_tpu.ops import edges, framing


def _random_responses(rng, t, f, c):
    r = rng.standard_normal((t, f, c)).astype(np.float32)
    # inject ties, zeros of both signs, and repeated blocks
    r[t // 3] = r[0]
    r[:, f // 2, :] = 0.0
    r[1, :, :] = -0.0
    return r


@pytest.mark.parametrize("q", [0.98, 0.5, 0.1, 0.999, 0.0])
def test_radix_matches_sort_unmasked(q):
    rng = np.random.default_rng(0)
    r = jnp.asarray(_random_responses(rng, 37, 13, 8))
    tau_sort = edges.quantile_threshold(r, q, method="sort")
    tau_radix = edges.quantile_threshold(r, q, method="radix")
    assert np.array_equal(
        np.asarray(tau_sort).view(np.uint32) & 0x7FFFFFFF,
        np.asarray(tau_radix).view(np.uint32) & 0x7FFFFFFF,
    ) or np.array_equal(np.asarray(tau_sort), np.asarray(tau_radix))
    # values must compare equal even if -0.0 vs +0.0 differ bitwise
    np.testing.assert_array_equal(np.asarray(tau_sort), np.asarray(tau_radix))


@pytest.mark.parametrize("valid", [1, 7, 36, 37])
def test_radix_matches_sort_masked(valid):
    rng = np.random.default_rng(1)
    r = jnp.asarray(_random_responses(rng, 37, 13, 8))
    vf = jnp.int32(valid)
    tau_sort = edges.quantile_threshold(r, 0.98, vf, method="sort")
    tau_radix = edges.quantile_threshold(r, 0.98, vf, method="radix")
    np.testing.assert_array_equal(np.asarray(tau_sort), np.asarray(tau_radix))


def test_radix_matches_oracle_partition():
    from oracle.frontend import quantile_threshold as oracle_tau

    rng = np.random.default_rng(2)
    r = _random_responses(rng, 64, 17, 8)
    tau_o = oracle_tau(r, 0.98)
    tau_r = np.asarray(edges.quantile_threshold(jnp.asarray(r), 0.98))
    np.testing.assert_array_equal(tau_o, tau_r)


def test_order_key_bijection_monotone():
    vals = np.asarray(
        [-np.inf, -1e30, -1.5, -1e-38, -0.0, 0.0, 1e-38, 2.5, 1e30, np.inf],
        np.float32,
    )
    keys = np.asarray(edges.order_keys(jnp.asarray(vals)))
    assert np.all(np.diff(keys.astype(np.uint64)) >= 1)
    back = np.asarray(edges.key_to_float(jnp.asarray(keys)))
    np.testing.assert_array_equal(back, vals)


def test_radix_under_jit_and_vmap():
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((4, 40, 12, 8)).astype(np.float32))
    vf = jnp.asarray([40, 17, 3, 40], jnp.int32)

    @jax.jit
    def both(rr, vv):
        s = jax.vmap(
            lambda a, v: edges.quantile_threshold(a, 0.98, v, method="sort")
        )(rr, vv)
        x = jax.vmap(
            lambda a, v: edges.quantile_threshold(a, 0.98, v, method="radix")
        )(rr, vv)
        return s, x

    s, x = both(r, vf)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(x))


@pytest.mark.parametrize("rt,rf", [(0, 0), (1, 1), (2, 1), (1, 3)])
def test_spread_matches_reduce_window(rt, rf):
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.random((30, 14, 8)) < 0.1)
    got = edges.spread_binary(b, rt, rf)
    want = lax.reduce_window(
        b.astype(jnp.int8),
        jnp.int8(0),
        lax.max,
        window_dimensions=(2 * rt + 1, 2 * rf + 1, 1),
        window_strides=(1, 1, 1),
        padding=((rt, rt), (rf, rf), (0, 0)),
    ).astype(jnp.bool_)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "s,fl,hop",
    [(4000, 400, 160), (4321, 400, 160), (1000, 320, 160), (800, 100, 250),
     (500, 160, 160), (499, 37, 13)],
)
def test_frame_signal_matches_gather(s, fl, hop):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(s).astype(np.float32))
    got = framing.frame_signal(x, fl, hop)
    t = 1 + (s - fl) // hop
    idx = np.arange(fl)[None, :] + hop * np.arange(t)[:, None]
    want = np.asarray(x)[idx]
    assert got.shape == (t, fl)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_frame_signal_batched():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, 2000)).astype(np.float32))
    got = framing.frame_signal(x, 400, 160)
    one = jax.vmap(lambda a: framing.frame_signal(a, 400, 160))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(one))
