"""Config 5 end-to-end: sharded corpus scan (SURVEY.md section 2c,
BASELINE.json:11 "sharded 10k-template bank across a pod slice with
cross-host top-K detection merge").

``detect_corpus_sharded`` is the mesh-parallel twin of
``pipeline.detect_corpus``: utterances batch over the ``data`` axis,
the bank shards over ``bank``, frames over ``time`` (halo exchange);
per-utterance top-K detections come from one jitted batched
NMS/top-K over the sharded score tensor.  Output is the same
``CorpusDetections``, so ``evaluate_detections`` works unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from template_speech_recognition_tpu.config import PipelineConfig
from template_speech_recognition_tpu.detect.nms import top_detections
from template_speech_recognition_tpu.detect.scorer import masked_scores
from template_speech_recognition_tpu.frontend import frontend_batch
from template_speech_recognition_tpu.models.bank import TemplateBank
from template_speech_recognition_tpu.parallel.score_sharded import (
    sharded_bank_scores,
)
from template_speech_recognition_tpu.pipeline import (
    CorpusDetections,
    CorpusLike,
    bucket_length,
)
from template_speech_recognition_tpu.detect import evaluate as ev


@functools.partial(
    jax.jit, static_argnames=("template_length", "nms_radius", "top_k")
)
def _batched_detections(scores, valid_frames, template_length, nms_radius, top_k):
    """[B, K, T] sharded scores -> per-utterance (s, t, k) top-K."""

    def one(sc, vf):
        sc = masked_scores(sc, vf, template_length)
        return top_detections.__wrapped__(sc, nms_radius, top_k)

    return jax.vmap(one)(scores, valid_frames)


def detect_corpus_sharded(
    corpus: CorpusLike,
    bank: TemplateBank,
    cfg: PipelineConfig,
    mesh: Mesh,
    target_phone: str | None = None,
) -> CorpusDetections:
    """Mesh-parallel corpus scan; same results contract as
    ``pipeline.detect_corpus`` (scores allclose across shardings; the
    time-only sharding is bitwise)."""
    fcfg, dcfg = cfg.frontend, cfg.detect
    utts = list(corpus.iter_utterances())
    if not utts:
        raise ValueError("empty corpus")
    n_data = mesh.shape["data"]
    n_time = mesh.shape["time"] * mesh.shape["bank"]
    pad_samples = bucket_length(max(len(w) for _, w, _ in utts))
    batch = len(utts)
    b_pad = ((batch + n_data - 1) // n_data) * n_data
    wavs = np.zeros((b_pad, pad_samples), np.float32)
    valid_samples = np.zeros((b_pad,), np.int32)
    for i, (_uid, wav, _ph) in enumerate(utts):
        wavs[i, : len(wav)] = wav
        valid_samples[i] = len(wav)
    fm = frontend_batch(jnp.asarray(wavs), jnp.asarray(valid_samples), fcfg)
    t_frames = fm.binary.shape[1]
    # Pad T so every (bank, time) sharding divides it evenly.
    t_pad = ((t_frames + n_time - 1) // n_time) * n_time
    feats = jnp.zeros(
        (b_pad, t_pad) + fm.binary.shape[2:], fm.binary.dtype
    ).at[:, :t_frames].set(fm.binary)

    w, c = bank.llr()
    scores = sharded_bank_scores(feats, w, c, mesh)          # [B, K, T_pad]
    s_b, t_b, k_b = _batched_detections(
        scores, fm.valid_frames, bank.template_length,
        dcfg.nms_radius, dcfg.top_k,
    )
    s_b, t_b, k_b = np.asarray(s_b), np.asarray(t_b), np.asarray(k_b)

    per_utt, labels, utt_ids = [], [], []
    total_samples = 0
    for i, (uid, wav, phones) in enumerate(utts):
        total_samples += len(wav)
        per_utt.append((s_b[i], t_b[i], k_b[i]))
        if target_phone is not None:
            labels.append(np.asarray(
                [s0 // fcfg.hop_length
                 for (ph, s0, _e) in phones if ph == target_phone],
                dtype=np.int64,
            ))
        else:
            labels.append(np.zeros(0, np.int64))
        utt_ids.append(uid)
    dets = ev.DetectionSet.from_per_utterance(per_utt)
    return CorpusDetections(
        dets, labels, total_samples / corpus.sample_rate, utt_ids
    )
