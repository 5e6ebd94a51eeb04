"""Checkpoint / resume (SURVEY.md section 5 "Checkpoint / resume",
"Failure detection / elastic recovery").

The reference ad-hoc ``np.save``/pickled its templates and scores; the
framework standardizes on **orbax-checkpoint** for device/sharded
state plus a small JSON *scan manifest* for corpus-scan progress:

* ``save_bank`` / ``restore_bank`` -- template banks (orbax pytree;
  restores sharded arrays natively under a mesh).
* ``save_em_state`` / ``restore_em_state`` -- EM iteration state
  (means, weights, loglik, iteration counter), checkpointable every
  iteration.
* ``ScanManifest`` -- per-shard corpus-scan progress.  A failed host
  restarts, reads the manifest, and re-scans only incomplete shards;
  per-shard detection arrays are stored next to the manifest, so the
  recovery story is restart-from-manifest (pod slices are fixed-shape;
  no in-job elasticity -- SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from template_speech_recognition_tpu.models.bank import TemplateBank
from template_speech_recognition_tpu.models.mixture import EMState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_bank(path: str, bank: TemplateBank) -> None:
    """Orbax checkpoint of a bank at ``path`` (directory)."""
    ckptr = _checkpointer()
    state = {"templates": bank.templates, "background": bank.background}
    if bank.parts is not None:
        state["parts"] = bank.parts
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "labels.json"), "w") as f:
        json.dump(bank.labels, f)


def restore_bank(path: str) -> TemplateBank:
    ckptr = _checkpointer()
    state = ckptr.restore(os.path.abspath(path))
    with open(os.path.join(path, "labels.json")) as f:
        labels = json.load(f)
    return TemplateBank(
        jnp.asarray(state["templates"]),
        jnp.asarray(state["background"]),
        labels,
        jnp.asarray(state["parts"]) if "parts" in state else None,
    )


def save_em_state(path: str, state: EMState) -> None:
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()


def restore_em_state(path: str) -> EMState:
    state = _checkpointer().restore(os.path.abspath(path))
    return EMState(**{k: jnp.asarray(v) for k, v in state.items()})


def run_em_checkpointed(
    x,
    init_resp,
    path: str,
    num_iters: int = 50,
    chunk_iters: int = 10,
    eps: float = 0.01,
    tol: float = 1e-4,
    mask=None,
) -> EMState:
    """EM with iteration-granularity checkpoint/restart (SURVEY.md
    section 5: "checkpoint-restart granularity at (a) EM iteration").

    Runs ``models.mixture.bernoulli_mixture_em`` in compiled chunks of
    ``chunk_iters``, persisting the full EMState after each chunk.  A
    killed job re-invoked with the same arguments resumes from the last
    completed chunk and produces the same final state as an
    uninterrupted run (fault-injection tested).
    """
    from template_speech_recognition_tpu.models.mixture import em_step

    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    mask_arr = (
        jnp.ones((n,), jnp.float32) if mask is None
        else jnp.asarray(mask, jnp.float32)
    )

    state = None
    if os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")) or (
        os.path.isdir(path) and os.listdir(path)
    ):
        try:
            state = restore_em_state(path)
        except Exception:
            state = None
    if state is None:
        state = EMState(
            iteration=jnp.int32(0),
            responsibilities=jnp.asarray(init_resp, jnp.float32),
            means=jnp.zeros((init_resp.shape[1], x.shape[1]), jnp.float32),
            weights=jnp.full((init_resp.shape[1],), 1.0 / init_resp.shape[1]),
            log_likelihood=jnp.float32(-jnp.inf),
            done=jnp.bool_(False),
            history=jnp.full((num_iters,), jnp.nan, jnp.float32),
        )

    # x and the mask ride as ARGUMENTS, never closures: a closed-over
    # exemplar matrix becomes an HLO constant, and at corpus scale
    # (hundreds of MB) the tunneled remote compile rejects the request
    # outright (HTTP 413) -- same rule as bench._slope_time.
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run_chunk(xa, mask_a, s: EMState, steps: int) -> EMState:
        def cond(t):
            return (t.iteration < jnp.int32(s.iteration + steps)) \
                & (t.iteration < num_iters) & (~t.done)

        def body(t: EMState) -> EMState:
            it = t.iteration + 1
            new_resp, means, weights, mean_ll = em_step(
                xa, t.responsibilities, mask_a, eps
            )
            improvement = mean_ll - t.log_likelihood
            done = (improvement < tol) & (it > 1)
            history = t.history.at[it - 1].set(mean_ll)
            return EMState(it, new_resp, means, weights, mean_ll, done, history)

        return lax.while_loop(cond, body, s)

    while int(state.iteration) < num_iters and not bool(state.done):
        state = run_chunk(x, mask_arr, state, chunk_iters)
        save_em_state(path, state)
    return state


@dataclasses.dataclass
class ScanManifest:
    """Crash-tolerant corpus-scan progress.

    Shards are arbitrary work units (utterance buckets).  Completion
    marks are atomic (write-temp + rename), so a scan killed mid-shard
    never records that shard and resume recomputes it.
    """

    root: str

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _shard_path(self, shard_id: int) -> str:
        return os.path.join(self.root, f"shard_{shard_id:05d}.npz")

    def completed(self) -> set[int]:
        try:
            with open(self._manifest_path()) as f:
                return set(json.load(f)["completed"])
        except FileNotFoundError:
            return set()

    def record(self, shard_id: int, arrays: dict[str, np.ndarray]) -> None:
        """Persist one shard's results, then mark it complete."""
        os.makedirs(self.root, exist_ok=True)
        tmp = self._shard_path(shard_id) + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, self._shard_path(shard_id))
        done = sorted(self.completed() | {shard_id})
        tmp_m = self._manifest_path() + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump({"completed": done}, f)
        os.replace(tmp_m, self._manifest_path())

    def load_shard(self, shard_id: int) -> dict[str, np.ndarray]:
        with np.load(self._shard_path(shard_id)) as z:
            return {k: z[k] for k in z.files}

    def run(self, shard_ids, work_fn) -> dict[int, dict[str, np.ndarray]]:
        """Execute ``work_fn(shard_id) -> {name: array}`` for every
        shard not yet completed; return all shards' results (completed
        ones loaded from disk).  Idempotent: re-running after a crash
        resumes where the manifest left off."""
        results = {}
        done = self.completed()
        for sid in shard_ids:
            if sid in done:
                results[sid] = self.load_shard(sid)
            else:
                out = work_fn(sid)
                self.record(sid, out)
                results[sid] = out
        return results
