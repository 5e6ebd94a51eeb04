"""Oriented edge features: responses, quantile binarization, spreading.

Counterpart of ``oracle.frontend.{edge_responses, quantile_threshold,
binary_edge_map, spread_binary}`` (SURVEY.md section 1 row L1).  The
threshold is the exact k-th order statistic -- an *element* of the
response array, never an interpolated value -- so identical responses
give the identical threshold on CPU and TPU; k itself is computed in
float32 on both sides (``k = floor(f32(q) * f32(n))``) to rule out
rounding-width divergence.

Static-shape discipline: all arrays carry the padded time extent; the
dynamic number of valid frames enters only as (a) a mask and (b) the
dynamic order-statistic index k, both jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NUM_EDGE_CHANNELS = 8


def edge_responses(spec: jnp.ndarray) -> jnp.ndarray:
    """[..., T, F] -> [..., T-1, F-1, 8]; orientation/polarity layout
    identical to ``oracle.frontend.edge_responses``."""
    d_time = (spec[..., 1:, :] - spec[..., :-1, :])[..., :, :-1]
    d_freq = (spec[..., :, 1:] - spec[..., :, :-1])[..., :-1, :]
    d_diag = spec[..., 1:, 1:] - spec[..., :-1, :-1]
    d_anti = spec[..., 1:, :-1] - spec[..., :-1, 1:]
    chans = []
    for d in (d_time, d_freq, d_diag, d_anti):
        chans.append(d)
        chans.append(-d)
    return jnp.stack(chans, axis=-1)


def quantile_threshold(
    responses: jnp.ndarray,
    quantile: float,
    valid_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-channel exact order-statistic threshold over valid cells.

    responses: [T', F', C]; valid_frames: scalar int (rows < valid are
    real; None -> all T' rows).  Returns [C] float32 thresholds
    tau_c = ascending_sorted(valid r_c)[k],  k = min(n-1, floor(f32(q)*f32(n))).
    """
    t, f, c = responses.shape
    flat = responses.reshape(t * f, c)
    if valid_frames is None:
        n = jnp.int32(t * f)
        masked = flat
    else:
        n = (valid_frames * f).astype(jnp.int32)
        row_valid = jnp.arange(t, dtype=jnp.int32) < valid_frames
        cell_valid = jnp.repeat(row_valid, f)
        masked = jnp.where(cell_valid[:, None], flat, jnp.float32(jnp.inf))
    srt = jnp.sort(masked, axis=0)
    k = jnp.minimum(n - 1, jnp.floor(jnp.float32(quantile) * n.astype(jnp.float32)).astype(jnp.int32))
    return jnp.take(srt, k, axis=0)


def binarize(
    responses: jnp.ndarray,
    quantile: float,
    valid_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Strict-threshold binarization; invalid rows forced to False."""
    tau = quantile_threshold(responses, quantile, valid_frames)
    binary = responses > tau[None, None, :]
    if valid_frames is not None:
        row_valid = jnp.arange(responses.shape[0], dtype=jnp.int32) < valid_frames
        binary = binary & row_valid[:, None, None]
    return binary


def spread_binary(binary: jnp.ndarray, spread_time: int, spread_freq: int) -> jnp.ndarray:
    """Binary dilation by a (2rt+1) x (2rf+1) rectangle (zero-padded).

    Implemented as a max reduce-window on int8 -- a single fused VPU
    pass on TPU.  [T', F', C] bool -> same, bool.
    """
    if spread_time == 0 and spread_freq == 0:
        return binary
    x = binary.astype(jnp.int8)
    out = lax.reduce_window(
        x,
        jnp.int8(0),
        lax.max,
        window_dimensions=(2 * spread_time + 1, 2 * spread_freq + 1, 1),
        window_strides=(1, 1, 1),
        padding=((spread_time, spread_time), (spread_freq, spread_freq), (0, 0)),
    )
    return out.astype(jnp.bool_)


def mask_rows(binary: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
    """Zero out rows >= valid_frames (post-spread cleanup)."""
    row_valid = jnp.arange(binary.shape[0], dtype=jnp.int32) < valid_frames
    return binary & row_valid[:, None, None]
