"""Waveform framing ops (jit-friendly, static shapes).

Counterpart of ``oracle.frontend.{preemphasize, frame_signal,
hamming_window}``.  Shapes are static: callers pad waveforms to a
bucket length and pass the valid sample count separately (XLA needs
static shapes -- SURVEY.md section 7, "hard parts" item 1; the NumPy
reference never faced this).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def preemphasize(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """y[0] = x[0]; y[t] = x[t] - alpha * x[t-1].  [..., S] -> same."""
    x = x.astype(jnp.float32)
    # shifted[..., 0] == 0, so y[..., 0] == x[..., 0] automatically.
    shifted = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    return x - jnp.float32(alpha) * shifted


@functools.lru_cache(maxsize=32)
def _frame_indices(num_samples: int, frame_length: int, hop_length: int) -> np.ndarray:
    num_frames = 1 + (num_samples - frame_length) // hop_length
    if num_frames <= 0:
        raise ValueError(f"signal too short: {num_samples} < {frame_length}")
    return (
        np.arange(frame_length)[None, :] + hop_length * np.arange(num_frames)[:, None]
    ).astype(np.int32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """[..., S] -> [..., T, frame_length] via a static gather."""
    idx = jnp.asarray(_frame_indices(x.shape[-1], frame_length, hop_length))
    return jnp.take(x.astype(jnp.float32), idx, axis=-1)


@functools.lru_cache(maxsize=8)
def _hamming_np(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float32)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def hamming_window(n: int) -> jnp.ndarray:
    """Symmetric Hamming window, float32 (same arithmetic as oracle)."""
    return jnp.asarray(_hamming_np(n))
