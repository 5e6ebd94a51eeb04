"""Checkpoint/restore + fault-injection resume tests (SURVEY.md
section 5: orbax state, scan manifests, killed-worker recovery)."""

import numpy as np
import jax.numpy as jnp
import pytest

from template_speech_recognition_tpu.checkpoint import (
    ScanManifest,
    restore_bank,
    restore_em_state,
    save_bank,
    save_em_state,
)
from template_speech_recognition_tpu.models.bank import TemplateBank
from template_speech_recognition_tpu.models.mixture import EMState


def _bank(seed=0):
    rng = np.random.default_rng(seed)
    tpl = np.clip(rng.random((3, 5, 4, 8)).astype(np.float32), 0.01, 0.99)
    bg = np.clip(rng.random((4, 8)).astype(np.float32), 0.01, 0.99)
    return TemplateBank(jnp.asarray(tpl), jnp.asarray(bg), ["aa", "aa", "iy"])


def test_bank_roundtrip(tmp_path):
    bank = _bank()
    path = str(tmp_path / "bank")
    save_bank(path, bank)
    got = restore_bank(path)
    np.testing.assert_array_equal(np.asarray(got.templates), np.asarray(bank.templates))
    np.testing.assert_array_equal(np.asarray(got.background), np.asarray(bank.background))
    assert got.labels == bank.labels


def test_em_state_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    state = EMState(
        iteration=jnp.int32(7),
        responsibilities=jnp.asarray(rng.random((10, 4)).astype(np.float32)),
        means=jnp.asarray(rng.random((4, 16)).astype(np.float32)),
        weights=jnp.asarray(np.full(4, 0.25, np.float32)),
        log_likelihood=jnp.float32(-12.5),
        done=jnp.asarray(False),
        history=jnp.full((20,), jnp.nan, jnp.float32),
    )
    path = str(tmp_path / "em")
    save_em_state(path, state)
    got = restore_em_state(path)
    np.testing.assert_array_equal(np.asarray(got.means), np.asarray(state.means))
    assert int(got.iteration) == 7
    np.testing.assert_allclose(float(got.log_likelihood), -12.5)


def test_scan_manifest_resume_matches_uninterrupted(tmp_path):
    """Fault injection: kill the scan mid-way; resumed results must be
    identical to an uninterrupted run (SURVEY.md section 5 "Fault
    injection")."""
    rng = np.random.default_rng(2)
    data = {sid: rng.random(8).astype(np.float32) for sid in range(6)}
    calls = []

    def work(sid):
        calls.append(sid)
        return {"scores": data[sid] * 2.0}

    # Uninterrupted reference run.
    ref = ScanManifest(str(tmp_path / "ref")).run(range(6), work)

    class Boom(RuntimeError):
        pass

    crashes = ScanManifest(str(tmp_path / "crash"))

    def work_crashing(sid):
        if sid == 3:
            raise Boom()
        return {"scores": data[sid] * 2.0}

    with pytest.raises(Boom):
        crashes.run(range(6), work_crashing)
    assert crashes.completed() == {0, 1, 2}

    calls.clear()
    resumed = ScanManifest(str(tmp_path / "crash")).run(range(6), work)
    # Only the incomplete shards re-ran.
    assert calls == [3, 4, 5]
    for sid in range(6):
        np.testing.assert_array_equal(resumed[sid]["scores"], ref[sid]["scores"])


def test_em_checkpointed_resume_matches_uninterrupted(tmp_path):
    """Kill EM between chunks; the resumed fit must equal the
    uninterrupted one bit-for-bit."""
    from oracle.mixture import init_responsibilities
    from template_speech_recognition_tpu.checkpoint import run_em_checkpointed
    from template_speech_recognition_tpu.models.mixture import bernoulli_mixture_em

    rng = np.random.default_rng(3)
    x = (rng.random((40, 24)) < 0.4).astype(np.float32)
    resp = init_responsibilities(40, 3, seed=0)

    ref = run_em_checkpointed(
        x, resp, str(tmp_path / "ref"), num_iters=8, chunk_iters=3, tol=0.0
    )
    # "Crash" after the first chunk: run only 3 iterations, then resume
    # the full budget from the same directory.
    crash_dir = str(tmp_path / "crash")
    partial = run_em_checkpointed(
        x, resp, crash_dir, num_iters=3, chunk_iters=3, tol=0.0
    )
    assert int(partial.iteration) == 3
    resumed = run_em_checkpointed(
        x, resp, crash_dir, num_iters=8, chunk_iters=3, tol=0.0
    )
    assert int(resumed.iteration) == int(ref.iteration) == 8
    np.testing.assert_array_equal(np.asarray(resumed.means), np.asarray(ref.means))
    np.testing.assert_array_equal(
        np.asarray(resumed.weights), np.asarray(ref.weights)
    )
    # And both equal the single-compilation EM.
    direct = bernoulli_mixture_em(
        jnp.asarray(x), jnp.asarray(resp), num_iters=8, tol=0.0
    )
    np.testing.assert_allclose(
        np.asarray(resumed.means), np.asarray(direct.means), rtol=1e-6, atol=1e-6
    )


def test_manifest_partial_shard_never_marked(tmp_path):
    m = ScanManifest(str(tmp_path / "m"))
    m.record(0, {"x": np.arange(3)})
    # Simulate a crash that wrote a stray temp file for shard 1.
    (tmp_path / "m" / "shard_00001.npz.tmp.npz").write_bytes(b"garbage")
    assert m.completed() == {0}
    out = m.run([0, 1], lambda sid: {"x": np.arange(3) + sid})
    np.testing.assert_array_equal(out[1]["x"], np.arange(3) + 1)
