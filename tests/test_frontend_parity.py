"""Frontend parity vs the NumPy oracle (SURVEY.md section 4 item 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle as O
from oracle.frontend import FrontendParams
from template_speech_recognition_tpu.config import FrontendConfig
from template_speech_recognition_tpu.frontend import frontend, frontend_batch
from template_speech_recognition_tpu.frontend.features import spectrogram
from template_speech_recognition_tpu.ops import edges as eops
from tests.helpers import small_setup


def _wave(seed=0, n=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (
        np.sin(2 * np.pi * 700 * t) + 0.5 * np.sin(2 * np.pi * 2300 * t)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)


def test_spectrogram_allclose():
    wav = _wave()
    po, pc = FrontendParams(), FrontendConfig()
    spec_o = O.stft_log_magnitude(wav, po)
    spec_t = np.asarray(spectrogram(jnp.asarray(wav), pc))
    assert spec_t.shape == spec_o.shape
    np.testing.assert_allclose(spec_t, spec_o, atol=2e-3, rtol=1e-4)


def test_log_mel_allclose():
    wav = _wave(1)
    po = FrontendParams(use_mel=True)
    pc = FrontendConfig(use_mel=True)
    spec_o = O.log_mel(wav, po)
    spec_t = np.asarray(spectrogram(jnp.asarray(wav), pc))
    np.testing.assert_allclose(spec_t, spec_o, atol=2e-3, rtol=1e-4)


def test_edge_ops_exact_given_same_spec():
    """Edges + threshold + binarize + spread are bit-exact when both
    sides start from the identical spectrogram."""
    wav = _wave(2)
    po, pc = FrontendParams(), FrontendConfig()
    spec = O.stft_log_magnitude(wav, po)
    resp_o = O.edge_responses(spec)
    resp_t = np.asarray(eops.edge_responses(jnp.asarray(spec)))
    np.testing.assert_array_equal(resp_o, resp_t)
    tau_o = O.quantile_threshold(resp_o, po.edge_quantile)
    tau_t = np.asarray(eops.quantile_threshold(jnp.asarray(resp_o), pc.edge_quantile))
    np.testing.assert_array_equal(tau_o, tau_t)
    b_o = O.binary_edge_map(resp_o, po.edge_quantile)
    b_t = np.asarray(eops.binarize(jnp.asarray(resp_o), pc.edge_quantile))
    np.testing.assert_array_equal(b_o, b_t)
    s_o = O.spread_binary(b_o, po.spread_time, po.spread_freq)
    s_t = np.asarray(eops.spread_binary(jnp.asarray(b_o), pc.spread_time, pc.spread_freq))
    np.testing.assert_array_equal(s_o, s_t)


@pytest.mark.parametrize("pad", [0, 4096])
def test_full_frontend_agreement(pad):
    """Full pipeline (padded input) vs oracle: >= 99.9% cell agreement;
    valid-frame count exact."""
    wav = _wave(3)
    po, pc = FrontendParams(), FrontendConfig()
    fm_o = O.frontend(wav, po)
    buf = np.zeros(len(wav) + pad, np.float32)
    buf[: len(wav)] = wav
    fm_t = frontend(jnp.asarray(buf), jnp.int32(len(wav)), pc)
    assert int(fm_t.valid_frames) == fm_o.shape[0]
    valid = np.asarray(fm_t.binary)[: fm_o.shape[0]]
    assert (valid == fm_o).mean() >= 0.999
    # padded rows must be all-False
    assert not np.asarray(fm_t.binary)[fm_o.shape[0]:].any()


def test_padding_invariance():
    """Property (SURVEY.md section 4 item 3): features on the valid
    region are invariant under the amount of bucket padding."""
    wav = _wave(4)
    pc = FrontendConfig()
    outs = []
    for pad in (1024, 8192):
        buf = np.zeros(len(wav) + pad, np.float32)
        buf[: len(wav)] = wav
        fm = frontend(jnp.asarray(buf), jnp.int32(len(wav)), pc)
        outs.append((int(fm.valid_frames), np.asarray(fm.binary)[: int(fm.valid_frames)]))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_frontend_batch_matches_single():
    wav_a, wav_b = _wave(5, 9000), _wave(6, 12000)
    pc = FrontendConfig()
    n = 16384
    batch = np.zeros((2, n), np.float32)
    batch[0, : len(wav_a)] = wav_a
    batch[1, : len(wav_b)] = wav_b
    lens = jnp.asarray([len(wav_a), len(wav_b)], jnp.int32)
    fm_b = frontend_batch(jnp.asarray(batch), lens, pc)
    for i, wav in enumerate((wav_a, wav_b)):
        fm_s = frontend(jnp.asarray(batch[i]), jnp.int32(len(wav)), pc)
        assert int(fm_b.valid_frames[i]) == int(fm_s.valid_frames)
        np.testing.assert_array_equal(
            np.asarray(fm_b.binary[i]), np.asarray(fm_s.binary)
        )


def test_corpus_frontend_full_agreement():
    """On the synthetic corpus the CPU-backend framework frontend is
    *exactly* the oracle (same IEEE ops, same order)."""
    st = small_setup()
    po, pc = st["params"], FrontendConfig()
    utt = st["corpus"].utterances[0]
    fm_o = O.frontend(utt.waveform, po)
    buf = np.zeros(len(utt.waveform) + 2048, np.float32)
    buf[: len(utt.waveform)] = utt.waveform
    fm_t = frontend(jnp.asarray(buf), jnp.int32(len(utt.waveform)), pc)
    valid = np.asarray(fm_t.binary)[: fm_o.shape[0]]
    assert (valid == fm_o).mean() >= 0.999
