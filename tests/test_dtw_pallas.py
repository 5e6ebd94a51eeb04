"""Parity tests for the Pallas wavefront DTW kernel (interpret mode on
CPU; compiled path exercised on TPU by dev/bench runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.align.dtw import banded_dtw
from template_speech_recognition_tpu.ops.dtw_pallas import (
    banded_dtw_pallas,
    skew_cost,
)


def _case(n=16, length=32, m=64, seed=0, lo=20):
    rng = np.random.default_rng(seed)
    cost = (rng.standard_normal((n, length, m)) + 2.0).astype(np.float32)
    lens = rng.integers(lo, m + 1, size=n).astype(np.int32)
    return jnp.asarray(cost), jnp.asarray(lens)


def test_skew_layout():
    cost = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    sk = np.asarray(skew_cost(cost))
    assert sk.shape == (6, 3)
    # skewed[k, i] == cost[i, k - i] where defined
    for k in range(6):
        for i in range(3):
            j = k - i
            if 0 <= j < 4:
                assert sk[k, i] == float(cost[i, j])
            else:
                assert sk[k, i] > 1e38


@pytest.mark.parametrize("band", [3, 6, 100])
def test_matches_scan_dtw(band):
    cost, lens = _case()
    got = np.asarray(banded_dtw_pallas(cost, lens, band, interpret=True))
    want = np.asarray(
        jax.vmap(lambda c, ln: banded_dtw.__wrapped__(c, ln, band))(cost, lens)
    )
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5, atol=1e-5)
    # Out-of-band terminals are "infinite" on both sides.
    assert np.all(got[~finite] > 1e38)


def test_narrow_band():
    # band=1: near-proportional paths only; pallas must agree with the
    # scan on both the finite terminals and the infeasible (inf) ones.
    cost, lens = _case(n=8, length=16, m=32, lo=4)
    got = np.asarray(banded_dtw_pallas(cost, lens, 1, interpret=True))
    want = np.asarray(
        jax.vmap(lambda c, ln: banded_dtw.__wrapped__(c, ln, 1))(cost, lens)
    )
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5, atol=1e-5)
    assert np.all(got[~finite] > 1e38)


def test_single_column_segments():
    cost, _ = _case(n=8, length=16, m=32)
    lens = jnp.full((8,), 1, jnp.int32)
    got = np.asarray(banded_dtw_pallas(cost, lens, 100, interpret=True))
    want = np.asarray(
        jax.vmap(lambda c, ln: banded_dtw.__wrapped__(c, ln, 100))(cost, lens)
    )
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5, atol=1e-5)


def test_rejects_indivisible_batch():
    cost, lens = _case(n=12)
    with pytest.raises(ValueError):
        banded_dtw_pallas(cost, lens, 6, block_pairs=8, interpret=True)
