"""Audio IO and TIMIT-style corpus reader tests."""

import numpy as np

from template_speech_recognition_tpu.io import (
    TimitCorpus,
    read_audio,
    read_sphere,
    read_wav,
    write_sphere,
    write_synthetic_timit,
    write_wav,
)


def _tone(n=8000, f=440.0, sr=16000):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    x = _tone()
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_sphere_roundtrip(tmp_path):
    x = _tone(f=880.0)
    p = str(tmp_path / "a.sph")
    write_sphere(p, x, 16000)
    y, sr = read_sphere(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_read_audio_sniffs_container(tmp_path):
    x = _tone()
    wav_p = str(tmp_path / "w.wav")
    sph_p = str(tmp_path / "s.wav")  # sphere bytes behind a .wav name (TIMIT-style)
    write_wav(wav_p, x, 16000)
    write_sphere(sph_p, x, 16000)
    for p in (wav_p, sph_p):
        y, sr = read_audio(p)
        assert sr == 16000 and len(y) == len(x)


def test_sphere_handcrafted_header(tmp_path):
    """Reader must parse a header it did not itself write."""
    pcm = (np.arange(-5, 5, dtype="<i2") * 1000).tobytes()
    header = (
        b"NIST_1A\n   1024\n"
        b"sample_rate -i 8000\nchannel_count -i 1\nsample_n_bytes -i 2\n"
        b"sample_count -i 10\nsample_byte_format -s2 01\n"
        b"sample_coding -s3 pcm\nend_head\n"
    ).ljust(1024, b" ")
    p = str(tmp_path / "h.sph")
    with open(p, "wb") as f:
        f.write(header + pcm)
    y, sr = read_sphere(p)
    assert sr == 8000 and len(y) == 10
    assert abs(y[0] - (-5000 / 32768)) < 1e-6


def test_synthetic_timit_tree(tmp_path):
    root = str(tmp_path / "timit")
    write_synthetic_timit(root, num_train=3, num_test=2, phones_per_utterance=4, seed=0)
    corpus = TimitCorpus(root)
    assert len(corpus.records) == 5
    assert len(corpus.split("TRAIN")) == 3
    assert len(corpus.split("TEST")) == 2
    rec = corpus.records[0]
    wav, sr = corpus.load_waveform(rec)
    assert sr == 16000 and len(wav) > 1000
    phones = corpus.load_phones(rec)
    assert phones and phones[0].end_sample > phones[0].start_sample
    inv = corpus.phone_inventory()
    assert "sil" in inv
    # exemplar clips slice the right spans
    target = next(p for p in inv if p != "sil")
    clips = corpus.exemplar_clips(target)
    occs = corpus.occurrences(target)
    assert len(clips) == len(occs) > 0
    assert len(clips[0]) == occs[0][1].end_sample - occs[0][1].start_sample
    assert len(corpus.background_clips(target, max_clips=5)) == 5
