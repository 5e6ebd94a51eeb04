"""Cross-shard / cross-host top-K detection merge (SURVEY.md 2c).

Each shard reduces its local detections to a fixed top-K of
(score, time, template_id) triples (``detect.top_detections``); the
merge all-gathers the small triples along the sharded axes and
re-top-Ks with the global deterministic order

    score desc, then time asc, then template id asc

-- total and shard-invariant, so the merged result is independent of
shard count and gather order (the "race-shaped hazard" note in
SURVEY.md section 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("top_k",))
def merge_topk(
    scores: jnp.ndarray,
    times: jnp.ndarray,
    template_ids: jnp.ndarray,
    top_k: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten candidate detections and keep the global top-K.

    scores/times/template_ids: any (identical) shape -- e.g.
    [num_shards, K_local] after an all_gather.  Empty slots must hold
    score == -inf.  Returns ([top_k] scores, times, ids) in
    (score desc, time asc, id asc) order.
    """
    s = scores.reshape(-1).astype(jnp.float32)
    t = times.reshape(-1).astype(jnp.int32)
    k = template_ids.reshape(-1).astype(jnp.int32)
    order = jnp.lexsort((k, t, -s))
    top = order[:top_k]
    out_s = jnp.take(s, top)
    out_t = jnp.take(t, top)
    out_k = jnp.take(k, top)
    if top_k > s.shape[0]:
        pad = top_k - s.shape[0]
        out_s = jnp.concatenate([out_s, jnp.full((pad,), -jnp.inf, jnp.float32)])
        out_t = jnp.concatenate([out_t, jnp.zeros((pad,), jnp.int32)])
        out_k = jnp.concatenate([out_k, jnp.zeros((pad,), jnp.int32)])
    return out_s, out_t, out_k


def merge_topk_collective_batched(
    local_scores: jnp.ndarray,      # [B_l, P]
    local_times: jnp.ndarray,       # [B_l, P]
    local_template_ids: jnp.ndarray,
    axis_names,
    top_k: int,
    time_offset: jnp.ndarray | None = None,
    template_offset: jnp.ndarray | None = None,
):
    """Per-utterance inside-``shard_map`` merge: all_gather each
    utterance's local top-K triples over ``axis_names``, then re-top-K
    per utterance with the global deterministic order.  Unlike
    ``merge_topk_collective`` the batch axis is preserved -- detections
    never merge across utterances.  Returns [B_l, top_k] triples,
    replicated along the gathered axes."""
    t = local_times + (0 if time_offset is None else time_offset)
    k = local_template_ids + (0 if template_offset is None else template_offset)
    s = local_scores
    for ax in axis_names:
        s = jax.lax.all_gather(s, ax)       # prepend [axis_size]
        t = jax.lax.all_gather(t, ax)
        k = jax.lax.all_gather(k, ax)
    b_l = local_scores.shape[0]
    s = jnp.moveaxis(s, -2, 0).reshape(b_l, -1)
    t = jnp.moveaxis(t, -2, 0).reshape(b_l, -1)
    k = jnp.moveaxis(k, -2, 0).reshape(b_l, -1)
    return jax.vmap(
        lambda a, b, c: merge_topk.__wrapped__(a, b, c, top_k)
    )(s, t, k)


def merge_topk_collective(
    local_scores: jnp.ndarray,
    local_times: jnp.ndarray,
    local_template_ids: jnp.ndarray,
    axis_names,
    top_k: int,
    time_offset: jnp.ndarray | None = None,
    template_offset: jnp.ndarray | None = None,
):
    """Inside-``shard_map`` merge: all_gather local triples over
    ``axis_names`` then global re-top-K.

    ``time_offset``/``template_offset`` translate shard-local indices
    to global ones before the gather (pass e.g.
    ``axis_index("time") * frames_per_shard``).
    """
    t = local_times + (0 if time_offset is None else time_offset)
    k = local_template_ids + (0 if template_offset is None else template_offset)
    s = local_scores
    for ax in axis_names:
        s = jax.lax.all_gather(s, ax).reshape(-1)
        t = jax.lax.all_gather(t, ax).reshape(-1)
        k = jax.lax.all_gather(k, ax).reshape(-1)
    return merge_topk.__wrapped__(s, t, k, top_k)
