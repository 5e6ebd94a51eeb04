"""Native (C++) audio IO vs the pure-Python readers: bit parity."""

import numpy as np
import pytest

from template_speech_recognition_tpu.io import audio
from template_speech_recognition_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _tone(n=5000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return np.clip(x, -1, 1).astype(np.float32)


def test_wav_roundtrip_matches_python(tmp_path):
    x = _tone()
    p = str(tmp_path / "a.wav")
    audio.write_wav(p, x, 16000)
    want, sr_w = audio.read_wav(p)
    got, sr_g = native.read_audio(p)
    assert sr_w == sr_g == 16000
    np.testing.assert_array_equal(got, want)


def test_sphere_roundtrip_matches_python(tmp_path):
    x = _tone(seed=1)
    p = str(tmp_path / "a.sph")
    audio.write_sphere(p, x, 16000)
    want, sr_w = audio.read_sphere(p)
    got, sr_g = native.read_audio(p)
    assert sr_w == sr_g == 16000
    np.testing.assert_array_equal(got, want)


def test_read_frames_matches_framing_ops(tmp_path):
    import jax.numpy as jnp

    from template_speech_recognition_tpu.ops import framing

    x = _tone(n=4000, seed=2)
    p = str(tmp_path / "b.wav")
    audio.write_wav(p, x, 16000)
    decoded, _ = audio.read_wav(p)
    y = framing.preemphasize(jnp.asarray(decoded), 0.95)
    want = np.asarray(framing.frame_signal(y, 400, 160))
    got, sr = native.read_frames(p, 0.95, 400, 160)
    assert sr == 16000
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_batch_loader(tmp_path):
    paths = []
    xs = []
    for i in range(6):
        x = _tone(n=3000 + 100 * i, seed=i)
        p = str(tmp_path / f"u{i}.wav")
        audio.write_wav(p, x, 16000)
        paths.append(p)
        xs.append(audio.read_wav(p)[0])
    arena, counts, rates = native.read_batch(paths, max_samples=4096,
                                             num_threads=3)
    assert arena.shape == (6, 4096)
    for i, x in enumerate(xs):
        assert counts[i] == len(x)
        assert rates[i] == 16000
        np.testing.assert_array_equal(arena[i, : len(x)], x)
        assert (arena[i, len(x):] == 0).all()


def test_error_paths(tmp_path):
    missing = str(tmp_path / "nope.wav")
    with pytest.raises(IOError):
        native.read_audio(missing)
    garbage = tmp_path / "bad.wav"
    garbage.write_bytes(b"not audio at all")
    with pytest.raises(IOError):
        native.read_audio(str(garbage))


def test_big_endian_sphere(tmp_path):
    # TIMIT SPHERE files are sometimes big-endian ("10" byte format).
    x = _tone(n=1000, seed=3)
    pcm = np.round(np.clip(x, -1, 1) * 32767.0).astype(">i2")
    body = (
        "sample_rate -i 16000\nchannel_count -i 1\nsample_n_bytes -i 2\n"
        f"sample_count -i {len(pcm)}\nsample_byte_format -s2 10\n"
        "sample_coding -s3 pcm\nend_head\n"
    )
    header = (b"NIST_1A\n   1024\n" + body.encode()).ljust(1024, b" ")
    p = tmp_path / "be.sph"
    p.write_bytes(header + pcm.tobytes())
    got, sr = native.read_audio(str(p))
    want, sr_w = audio.read_sphere(str(p))
    assert sr == sr_w == 16000
    np.testing.assert_array_equal(got, want)
