"""Streaming batched corpus scan (scan.py) vs the per-utterance loop,
plus manifest-resume semantics (round-1 verdict items 2 and 4)."""

import numpy as np
import pytest

import oracle as O
from template_speech_recognition_tpu import scan as scan_mod
from template_speech_recognition_tpu.checkpoint import ScanManifest
from template_speech_recognition_tpu.config import (
    DetectConfig,
    DTWConfig,
    PipelineConfig,
)
from template_speech_recognition_tpu.pipeline import (
    SyntheticAdapter,
    _detect_corpus_loop,
    detect_corpus,
    evaluate_detections,
    train_bank,
)


@pytest.fixture(scope="module")
def corpus():
    return SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=7, phones_per_utterance=5, seed=3)
    )


@pytest.fixture(scope="module")
def bank(corpus):
    return train_bank(corpus, ["aa"], PipelineConfig())


def _as_sets(result):
    """Per-utterance detection triples as comparable lists."""
    d = result.detections
    out = []
    for ui in range(len(result.utt_ids)):
        sel = d.utterance_ids == ui
        order = np.lexsort((d.template_ids[sel], d.times[sel]))
        out.append(
            (
                d.scores[sel][order],
                d.times[sel][order],
                d.template_ids[sel][order],
            )
        )
    return out


def _assert_same_detections(res_a, res_b, score_tol=0.0):
    assert res_a.utt_ids == res_b.utt_ids
    for (sa, ta, ka), (sb, tb, kb) in zip(_as_sets(res_a), _as_sets(res_b)):
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(ka, kb)
        if score_tol == 0.0:
            np.testing.assert_array_equal(sa, sb)
        else:
            np.testing.assert_allclose(sa, sb, rtol=score_tol, atol=score_tol)


@pytest.mark.parametrize("backend", ["conv", "fft"])
def test_stream_equals_loop(corpus, bank, backend):
    """Batched scan == per-utterance loop, both backends.  batch_size 3
    over 7 utterances also exercises the partial tail batch."""
    cfg = PipelineConfig(
        detect=DetectConfig(score_backend=backend, batch_size=3)
    )
    res_stream = detect_corpus(corpus, bank, cfg, target_phone="aa")
    res_loop = _detect_corpus_loop(corpus, bank, cfg, target_phone="aa")
    # conv: identical convs batched over N -> exact.  fft: the batched
    # GEMM may tile reductions differently than B=1 -> float-epsilon.
    _assert_same_detections(
        res_stream, res_loop, score_tol=0.0 if backend == "conv" else 1e-5
    )
    assert res_stream.labels_per_utterance[0].dtype == np.int64
    m_stream = evaluate_detections(res_stream, cfg.detect.match_tolerance)
    m_loop = evaluate_detections(res_loop, cfg.detect.match_tolerance)
    assert m_stream["num_detections"] == m_loop["num_detections"]
    assert m_stream["eer"] == pytest.approx(m_loop["eer"], abs=1e-6)


def test_stream_dtw_rescore_equals_loop(corpus, bank):
    cfg = PipelineConfig(
        detect=DetectConfig(score_backend="conv", batch_size=4,
                            dtw_rescore=True, top_k=8),
        dtw=DTWConfig(band=4),
    )
    res_stream = detect_corpus(corpus, bank, cfg, target_phone="aa")
    res_loop = _detect_corpus_loop(corpus, bank, cfg, target_phone="aa")
    _assert_same_detections(res_stream, res_loop, score_tol=1e-6)


def test_stream_counters(corpus, bank):
    cfg = PipelineConfig(detect=DetectConfig(batch_size=4))
    res = detect_corpus(corpus, bank, cfg, target_phone="aa")
    assert res.counters["utterances"] == 7.0
    assert res.counters["frames"] > 0
    assert res.counters["audio_s_per_s"] > 0
    assert (
        res.counters["windows_scored"]
        == res.counters["frames"] * bank.num_templates
    )


def test_manifest_resume(tmp_path, corpus, bank, monkeypatch):
    """A scan killed mid-corpus resumes from the manifest: completed
    batches load from disk (no recompute) and final results are
    identical to an uninterrupted scan."""
    cfg = PipelineConfig(detect=DetectConfig(batch_size=2))
    baseline = detect_corpus(corpus, bank, cfg, target_phone="aa")

    calls = {"n": 0}
    real_step = scan_mod.scan_step

    def counting_step(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("injected fault")
        return real_step(*a, **k)

    monkeypatch.setattr(scan_mod, "scan_step", counting_step)
    mdir = str(tmp_path / "scanckpt")
    with pytest.raises(RuntimeError, match="injected fault"):
        detect_corpus(
            corpus, bank, cfg, target_phone="aa", manifest=ScanManifest(mdir)
        )
    done_before = ScanManifest(mdir).completed()
    assert len(done_before) >= 1  # at least one batch landed pre-fault

    # resume: no fault, count fresh compute
    calls["n"] = 0

    def counting_step2(*a, **k):
        calls["n"] += 1
        return real_step(*a, **k)

    monkeypatch.setattr(scan_mod, "scan_step", counting_step2)
    resumed = detect_corpus(
        corpus, bank, cfg, target_phone="aa", manifest=ScanManifest(mdir)
    )
    # completed shards were loaded, not recomputed
    total_shards = len(ScanManifest(mdir).completed())
    assert calls["n"] == total_shards - len(done_before)
    _assert_same_detections(resumed, baseline)


def test_manifest_rejects_changed_corpus(tmp_path, corpus, bank):
    cfg = PipelineConfig(detect=DetectConfig(batch_size=2))
    mdir = str(tmp_path / "scanckpt")
    detect_corpus(corpus, bank, cfg, target_phone="aa",
                  manifest=ScanManifest(mdir))
    other = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=7, phones_per_utterance=5,
                                seed=9)
    )
    # same batching order but different utterance content is undetectable
    # from gidx alone; a *different order/count* must be rejected
    shorter = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=3, phones_per_utterance=5,
                                seed=3)
    )
    del other
    with pytest.raises(ValueError, match="corpus or config changed"):
        detect_corpus(shorter, bank, cfg, target_phone="aa",
                      manifest=ScanManifest(mdir))


def test_int16_upload_matches_f32_of_pcm16(monkeypatch):
    """SCAN_UPLOAD_INT16 contract: int16 feeding of a corpus equals
    the f32 path over the SAME PCM16-quantized samples, bitwise --
    i.e. for PCM16-sourced audio (TIMIT) the mode is lossless; a
    float corpus is merely snapped to the PCM16 grid once."""
    import oracle as O
    from template_speech_recognition_tpu.config import (
        DetectConfig,
        PipelineConfig,
    )
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        train_bank,
    )
    from template_speech_recognition_tpu.scan import detect_corpus_stream

    base = O.make_synthetic_corpus(num_utterances=4,
                                   phones_per_utterance=4, seed=5)
    quant_utts = []
    for u in base.utterances:
        w16 = np.clip(
            np.round(u.waveform * 32768.0), -32768, 32767
        ).astype(np.int16)
        quant_utts.append(
            type(u)(w16.astype(np.float32) / 32768.0, u.phones, u.utt_id)
        )
    pcm = type(base)(quant_utts, base.sample_rate, base.phone_names)
    corpus = SyntheticAdapter(base)
    corpus_pcm = SyntheticAdapter(pcm)
    cfg = PipelineConfig(detect=DetectConfig(batch_size=2))
    bank = train_bank(corpus_pcm, ["aa", "iy"], cfg)
    ref = detect_corpus_stream(corpus_pcm, bank, cfg, target_phone="aa")
    monkeypatch.setenv("SCAN_UPLOAD_INT16", "1")
    got = detect_corpus_stream(corpus, bank, cfg, target_phone="aa")
    r, g = ref.detections, got.detections
    np.testing.assert_array_equal(g.scores, r.scores)
    np.testing.assert_array_equal(g.times, r.times)
    np.testing.assert_array_equal(g.template_ids, r.template_ids)
    np.testing.assert_array_equal(g.utterance_ids, r.utterance_ids)
