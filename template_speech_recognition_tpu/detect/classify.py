"""Multi-class segment classification (SURVEY.md section 3.5).

The reference classifies an unknown segment by scoring it against each
class's template(s) and taking the argmax (oracle:
``oracle.classify.classify_segment``).  TPU-native design: the whole
bank scores every segment in ONE batched kernel -- sliding LLR
max-over-shift (or banded DTW) over [B, K] pairs -- then a segment-max
over the bank's class labels.  No per-class Python loop touches the
device.

Parity contract with the oracle, per segment/template pair:

* ``seg_len >= L``: ``max_t sliding_score(segment, W_k, c_k)`` over
  valid window starts.
* ``seg_len < L``: the segment is registered (uniform nearest-neighbor
  resample, same index map as ``oracle.template.register_exemplars``)
  up to length L and scored with a single dot product.

Both branches are computed batched and selected with ``jnp.where`` --
jit-friendly (no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from template_speech_recognition_tpu.align.dtw import dtw_keyword_scores_batch
from template_speech_recognition_tpu.detect.scorer import masked_scores, sliding_scores
from template_speech_recognition_tpu.models.bank import TemplateBank


def _register_to_length(segment: jnp.ndarray, seg_len: jnp.ndarray, length: int):
    """Uniform nearest-neighbor resample of the valid prefix to
    ``length`` rows (oracle.template.register_exemplars index map:
    src_row(i) = floor(i * L_i / L_target))."""
    idx = (jnp.arange(length, dtype=jnp.int32) * seg_len.astype(jnp.int32)) // length
    return jnp.take(segment, idx, axis=0)


@jax.jit
def _pair_scores_sliding(
    segments: jnp.ndarray,    # [B, M_pad, F, E] float32/bool
    seg_lens: jnp.ndarray,    # [B] int32
    w: jnp.ndarray,           # [K, L, F, E]
    c: jnp.ndarray,           # [K]
) -> jnp.ndarray:             # [B, K]
    length = w.shape[1]
    wf = w.reshape(w.shape[0], -1).astype(jnp.float32)

    def one(seg, ln):
        scores = sliding_scores.__wrapped__(seg.astype(jnp.float32), w, c)
        best_slide = jnp.max(masked_scores(scores, ln, length), axis=-1)   # [K]
        reg = _register_to_length(seg, ln, length).astype(jnp.float32)
        reg_score = wf @ reg.reshape(-1) + c                               # [K]
        return jnp.where(ln < length, reg_score, best_slide)

    return jax.vmap(one)(segments, seg_lens)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _per_class_best(pair_scores: jnp.ndarray, class_ids: jnp.ndarray, num_classes: int):
    """[B, K] x [K] -> (argmax class [B], best score per class [B, C]).

    Ties between classes break toward the lower class id (sorted class
    order), matching the oracle's deterministic tie rule.
    """
    neg = jnp.float32(-jnp.inf)
    onehot = class_ids[None, :] == jnp.arange(num_classes)[:, None]        # [C, K]
    per_class = jnp.max(
        jnp.where(onehot[None], pair_scores[:, None, :], neg), axis=-1
    )                                                                      # [B, C]
    return jnp.argmax(per_class, axis=-1), per_class


def classify_segments(
    segments: np.ndarray | jnp.ndarray,
    seg_lens: np.ndarray | jnp.ndarray,
    bank: TemplateBank,
    use_dtw: bool = False,
    band: int = 6,
) -> tuple[list[str], np.ndarray]:
    """Classify a padded batch [B, M_pad, F, E] with valid lengths.

    Returns (predicted class names, per-class best scores [B, C]) with
    classes in sorted-name order (= ``sorted(set(bank.labels))``).
    """
    classes = sorted(set(bank.labels))
    class_to_id = {name: i for i, name in enumerate(classes)}
    class_ids = jnp.asarray([class_to_id[l] for l in bank.labels], jnp.int32)
    segments = jnp.asarray(segments)
    seg_lens = jnp.asarray(seg_lens, jnp.int32)
    if use_dtw:
        w, c_rows = bank.llr_rows()
        pair = dtw_keyword_scores_batch(
            segments.astype(jnp.float32), seg_lens, w, c_rows, band
        )
    else:
        w, c = bank.llr()
        pair = _pair_scores_sliding(segments, seg_lens, w, c)
    pred_ids, per_class = _per_class_best(pair, class_ids, len(classes))
    return [classes[int(i)] for i in np.asarray(pred_ids)], np.asarray(per_class)


def pad_segments(
    segments: list[np.ndarray], pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length [M_i, F, E] maps into a zero-padded batch."""
    m_pad = pad_to or max(s.shape[0] for s in segments)
    out = np.zeros((len(segments), m_pad) + segments[0].shape[1:], np.float32)
    lens = np.zeros(len(segments), np.int32)
    for i, s in enumerate(segments):
        m = min(s.shape[0], m_pad)
        out[i, :m] = s[:m]
        lens[i] = m
    return out, lens
