"""Waveform framing ops (jit-friendly, static shapes).

Counterpart of ``oracle.frontend.{preemphasize, frame_signal,
hamming_window}``.  Shapes are static: callers pad waveforms to a
bucket length and pass the valid sample count separately (XLA needs
static shapes -- SURVEY.md section 7, "hard parts" item 1; the NumPy
reference never faced this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def preemphasize(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """y[0] = x[0]; y[t] = x[t] - alpha * x[t-1].  [..., S] -> same."""
    x = x.astype(jnp.float32)
    # shifted[..., 0] == 0, so y[..., 0] == x[..., 0] automatically.
    shifted = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    return x - jnp.float32(alpha) * shifted


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """[..., S] -> [..., T, frame_length] of overlapping frames.

    Gather-free: reshape the signal into hop-sized rows, then frame t is
    the concatenation of rows t..t+n_full-1 plus the first ``rem``
    columns of row t+n_full (frame_length = n_full*hop + rem).  Each
    piece is a contiguous strided slice, so XLA lowers this to a few
    flat copies instead of a [T, frame_length] gather (which was ~50x
    slower on TPU -- ``bench_frontend_stages.py``).  Values are exact
    copies: bit-identical to the oracle's stride-tricks framing.
    """
    x = x.astype(jnp.float32)
    s = x.shape[-1]
    t = 1 + (s - frame_length) // hop_length
    if t <= 0:
        raise ValueError(f"signal too short: {s} < {frame_length}")
    n_full, rem = divmod(frame_length, hop_length)
    rows = t - 1 + n_full + (1 if rem else 0)
    pad_to = rows * hop_length
    if pad_to > s:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad_to - s)]
        xp = jnp.pad(x, widths)
    else:
        xp = x[..., :pad_to]
    r = xp.reshape(x.shape[:-1] + (rows, hop_length))
    parts = [jax.lax.slice_in_dim(r, j, j + t, axis=-2) for j in range(n_full)]
    if rem:
        parts.append(
            jax.lax.slice_in_dim(r, n_full, n_full + t, axis=-2)[..., :rem]
        )
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


@functools.lru_cache(maxsize=8)
def _hamming_np(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float32)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def hamming_window(n: int) -> jnp.ndarray:
    """Symmetric Hamming window, float32 (same arithmetic as oracle)."""
    return jnp.asarray(_hamming_np(n))
