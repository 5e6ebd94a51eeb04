"""Banded DTW parity vs the oracle DP (SURVEY.md section 4 item 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle as O
from oracle.dtw import banded_dtw as bdtw_o, band_mask, dtw_keyword_score as kw_o, llr_filter_rows
from template_speech_recognition_tpu.align import (
    banded_dtw,
    dtw_keyword_score,
    dtw_keyword_scores_batch,
)
from tests.helpers import small_setup


@pytest.mark.parametrize("shape,band", [((8, 8), 2), ((12, 7), 3), ((5, 20), 30), ((16, 16), 1)])
def test_banded_dtw_matches_oracle(shape, band):
    rng = np.random.default_rng(0)
    cost = rng.normal(size=shape).astype(np.float32)
    ref = bdtw_o(cost, band)
    got = float(banded_dtw(jnp.asarray(cost), jnp.int32(shape[1]), band))
    if np.isinf(ref):
        assert np.isinf(got)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)


def test_banded_dtw_padded_segment():
    """Padding columns beyond seg_len must not change the result."""
    rng = np.random.default_rng(1)
    cost = rng.normal(size=(10, 12)).astype(np.float32)
    ref = bdtw_o(cost, 4)
    padded = np.concatenate([cost, rng.normal(size=(10, 6)).astype(np.float32)], axis=1)
    got = float(banded_dtw(jnp.asarray(padded), jnp.int32(12), 4))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)


def test_band_mask_semantics():
    """The jnp DP admits exactly the oracle's band cells: cells outside
    the band contribute +inf paths."""
    L, M, band = 9, 9, 1
    mask = band_mask(L, M, band)
    # A cost matrix that is 0 in-band and hugely negative off-band:
    # if the DP visited any off-band cell the score would explode.
    cost = np.where(mask, 0.0, -1e9).astype(np.float32)
    got = float(banded_dtw(jnp.asarray(cost), jnp.int32(M), band))
    assert got == 0.0


def test_keyword_score_parity():
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[0].waveform, st["params"])
    wr, cr = llr_filter_rows(st["template"], st["background"])
    L = wr.shape[0]
    seg = fm[5 : 5 + L + 6]
    ref = kw_o(seg, wr, cr, band=6)
    pad = np.zeros((seg.shape[0] + 9,) + seg.shape[1:], bool)
    pad[: seg.shape[0]] = seg
    got = float(
        dtw_keyword_score(
            jnp.asarray(pad), jnp.int32(seg.shape[0]), jnp.asarray(wr), jnp.asarray(cr), 6
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)


def test_keyword_batch():
    st = small_setup()
    fm = O.frontend(st["corpus"].utterances[1].waveform, st["params"])
    wr, cr = llr_filter_rows(st["template"], st["background"])
    L = wr.shape[0]
    m_pad = L + 12
    segs, lens = [], []
    for start, extra in ((0, 0), (10, 5), (20, 9)):
        seg = fm[start : start + L + extra]
        buf = np.zeros((m_pad,) + fm.shape[1:], bool)
        buf[: seg.shape[0]] = seg
        segs.append(buf)
        lens.append(seg.shape[0])
    w2 = np.stack([wr, wr * 0.5]).astype(np.float32)
    c2 = np.stack([cr, cr * 0.5]).astype(np.float32)
    got = np.asarray(
        dtw_keyword_scores_batch(
            jnp.asarray(np.stack(segs)), jnp.asarray(lens), jnp.asarray(w2), jnp.asarray(c2), 6
        )
    )
    assert got.shape == (3, 2)
    for b, (start, extra) in enumerate(((0, 0), (10, 5), (20, 9))):
        seg = fm[start : start + L + extra]
        for k in range(2):
            ref = kw_o(seg, w2[k], c2[k], band=6)
            np.testing.assert_allclose(got[b, k], ref, rtol=1e-5, atol=1e-3)
