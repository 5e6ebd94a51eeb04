"""Non-max suppression and fixed-size top-K detection extraction.

NMS definition shared with ``oracle.detect.nms_mask``:

    keep[t]  <=>  s[t] >  max(s[t-r .. t-1])
             and  s[t] >= max(s[t+1 .. t+r])

(ties go to the earliest frame).  Both one-sided window maxima are
single ``lax.reduce_window`` passes, so the whole NMS fuses into a
couple of VPU sweeps; on the int32 scoring path the mask is
bit-identical to the oracle.  Detection *lists* have dynamic length,
so on-device we return a fixed top-K (scores/times/template ids) with
suppressed slots at -inf -- the cross-host merge
(``parallel.topk_merge``) re-top-Ks these fixed-size triples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _one_sided_max(s: jnp.ndarray, radius: int, side: str) -> jnp.ndarray:
    """left: out[t] = max(s[t-r..t-1]); right: out[t] = max(s[t+1..t+r])."""
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(s.dtype, jnp.floating) else jnp.iinfo(s.dtype).min, s.dtype)
    n = s.shape[-1]
    pad = jnp.full(s.shape[:-1] + (radius,), neg, s.dtype)
    if side == "left":
        p = jnp.concatenate([pad, s], axis=-1)[..., :-1]          # [.., T+r-1]
    else:
        p = jnp.concatenate([s[..., 1:], pad], axis=-1)           # [.., T+r-1]
    window = (1,) * (s.ndim - 1) + (radius,)
    return lax.reduce_window(
        p, neg, lax.max, window_dimensions=window, window_strides=(1,) * s.ndim,
        padding=[(0, 0)] * (s.ndim - 1) + [(0, 0)],
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def nms_mask(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """[..., T] scores -> bool keep mask (see module docstring)."""
    if radius == 0:
        return jnp.ones(scores.shape, jnp.bool_)
    left = _one_sided_max(scores, radius, "left")
    right = _one_sided_max(scores, radius, "right")
    return (scores > left) & (scores >= right)


@functools.partial(jax.jit, static_argnames=("radius", "top_k", "time_major"))
def top_detections(
    scores: jnp.ndarray,
    radius: int,
    top_k: int,
    time_major: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bank scores [K, T''] (or [T'', K] with ``time_major``) ->
    fixed-size detections.

    Reduces over templates (max; ties -> lowest template id, matching
    ``oracle.detect.bank_nms``), applies time NMS, then top-K by
    (score desc, time asc).  Returns (scores [top_k] float32,
    times [top_k] int32, template_ids [top_k] int32); suppressed /
    absent slots have score -inf.  ``time_major`` matches the native
    layout of the fused FFT-scorer epilogue (``ops.fft_idft_pallas``)
    so no transpose sits between scoring and NMS.
    """
    k_axis = 1 if time_major else 0
    best = jnp.max(scores, axis=k_axis)
    best_k = jnp.argmax(scores, axis=k_axis).astype(jnp.int32)
    keep = nms_mask(best, radius)
    neg = jnp.float32(-jnp.inf)
    masked = jnp.where(keep, best.astype(jnp.float32), neg)
    k = min(top_k, masked.shape[0])
    # lax.top_k tie-breaks toward the lower index = earlier time.
    vals, times = lax.top_k(masked, k)
    if k < top_k:
        pad = top_k - k
        vals = jnp.concatenate([vals, jnp.full((pad,), neg)])
        times = jnp.concatenate([times, jnp.zeros((pad,), times.dtype)])
    return vals, times.astype(jnp.int32), jnp.take(best_k, times).astype(jnp.int32)
