"""Oriented edge features: responses, quantile binarization, spreading.

Counterpart of ``oracle.frontend.{edge_responses, quantile_threshold,
binary_edge_map, spread_binary}`` (SURVEY.md section 1 row L1).  The
threshold is the exact k-th order statistic -- an *element* of the
response array, never an interpolated value -- so identical responses
give the identical threshold on CPU and TPU; k itself is computed in
float32 on both sides (``k = floor(f32(q) * f32(n))``) to rule out
rounding-width divergence.

The order statistic is computed by a bitwise RADIX SELECT rather than a
full sort (SURVEY.md section 7 hard-part 5): map float32 responses
through the monotone bijection to uint32 keys, then bisect the key's
bits 4 at a time -- 8 passes, each counting ``key_prefix <= candidate``
for the 16 possible next digits and descending into the digit whose
cumulative count first reaches rank k+1.  Each pass is one fused
compare+reduce over the response array (no prefix mask is needed:
counting with the ABSOLUTE rank k makes lower-prefix elements count
toward every candidate equally).  This selects the bit-identical value
``sort(x)[k]`` would, at ~50x less device time than ``jnp.sort`` on TPU
(bitonic sorts are the pathological op for the VPU; measured in
``bench_frontend_stages.py``).

Static-shape discipline: all arrays carry the padded time extent; the
dynamic number of valid frames enters only as (a) a mask and (b) the
dynamic order-statistic index k, both jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

NUM_EDGE_CHANNELS = 8

# np scalars (module import must not initialize a jax backend --
# jax.distributed.initialize needs to run first in multi-process use)
_SIGN = np.uint32(0x80000000)
_MASKED_KEY = np.uint32(0xFFFFFFFF)


def order_keys(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone bijection float32 -> uint32: a < b  <=>  key(a) < key(b).

    Positive floats (sign bit clear) map to ``bits | 0x80000000``
    (ascending with magnitude); negative floats to ``~bits`` (more
    negative -> larger magnitude bits -> smaller key).  -0.0 maps to
    0x7FFFFFFF and +0.0 to 0x80000000, preserving -0.0 < +0.0 in key
    space -- harmless, since a +/-0.0 threshold binarizes identically.
    """
    bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(bits >= _SIGN, ~bits, bits | _SIGN)


def key_to_float(key: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``order_keys``."""
    bits = jnp.where(key >= _SIGN, key ^ _SIGN, ~key)
    return lax.bitcast_convert_type(bits, jnp.float32)


def radix_kth_smallest(keys: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th smallest (0-indexed) per column of uint32 keys [N, C].

    8 bisection passes of 4 bits each; every pass counts, for the 16
    candidate digit extensions of the known prefix, how many keys have
    top bits <= candidate, and descends into the first candidate whose
    count reaches k+1 (which always exists: the widest candidate counts
    at least as many keys as the previous level's selection did).
    ``k`` is a scalar or [C] int32 and must be < the number of
    non-masked keys per column.
    """
    c = keys.shape[1]
    need = (k + 1).astype(jnp.int32)
    prefix = jnp.zeros((c,), jnp.uint32)
    for level in range(8):
        shift = jnp.uint32(28 - 4 * level)
        hi = keys >> shift                                # [N, C]
        base = prefix << jnp.uint32(4)                    # [C]
        cand = base[None, :] + jnp.arange(16, dtype=jnp.uint32)[:, None]
        cnt = jnp.sum(
            (hi[:, None, :] <= cand[None, :, :]).astype(jnp.int32), axis=0
        )                                                 # [16, C]
        digit = jnp.argmax(cnt >= need, axis=0).astype(jnp.uint32)
        prefix = base + digit
    return prefix


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


def _order_statistic_rank(
    t: int, f: int, quantile: float, valid_frames: jnp.ndarray | None
) -> jnp.ndarray:
    if valid_frames is None:
        n = jnp.int32(t * f)
    else:
        n = (valid_frames * f).astype(jnp.int32)
    return jnp.minimum(
        n - 1,
        jnp.floor(jnp.float32(quantile) * n.astype(jnp.float32)).astype(jnp.int32),
    )


def quantile_threshold(
    responses: jnp.ndarray,
    quantile: float,
    valid_frames: jnp.ndarray | None = None,
    method: str = "radix",
) -> jnp.ndarray:
    """Per-channel exact order-statistic threshold over valid cells.

    responses: [T', F', C]; valid_frames: scalar int (rows < valid are
    real; None -> all T' rows).  Returns [C] float32 thresholds
    tau_c = ascending_sorted(valid r_c)[k],  k = min(n-1, floor(f32(q)*f32(n))).

    ``method="radix"`` (default, production) and ``method="sort"``
    select the identical element -- the sort path exists as the
    readable spec and cross-check (``tests/test_radix_quantile.py``).
    """
    t, f, c = responses.shape
    flat = responses.reshape(t * f, c)
    k = _order_statistic_rank(t, f, quantile, valid_frames)
    if valid_frames is None:
        cell_valid = None
    else:
        row_valid = jnp.arange(t, dtype=jnp.int32) < valid_frames
        cell_valid = jnp.repeat(row_valid, f)
    if method == "sort":
        masked = flat if cell_valid is None else jnp.where(
            cell_valid[:, None], flat, jnp.float32(jnp.inf)
        )
        srt = jnp.sort(masked, axis=0)
        return jnp.take(srt, k, axis=0)
    keys = order_keys(flat)
    if cell_valid is not None:
        keys = jnp.where(cell_valid[:, None], keys, _MASKED_KEY)
    return key_to_float(radix_kth_smallest(keys, k))


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


def _shifted(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """x shifted by s along axis, False-filled (no wraparound)."""
    n = x.shape[axis]
    zeros_shape = list(x.shape)
    zeros_shape[axis] = abs(s)
    z = jnp.zeros(zeros_shape, x.dtype)
    if s > 0:
        return jnp.concatenate(
            [z, lax.slice_in_dim(x, 0, n - s, axis=axis)], axis=axis
        )
    return jnp.concatenate(
        [lax.slice_in_dim(x, -s, n, axis=axis), z], axis=axis
    )


def _dilate_axis(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    out = x
    for s in range(1, radius + 1):
        out = out | _shifted(x, s, axis) | _shifted(x, -s, axis)
    return out


def spread_binary(binary: jnp.ndarray, spread_time: int, spread_freq: int) -> jnp.ndarray:
    """Binary dilation by a (2rt+1) x (2rf+1) rectangle (zero-padded).

    Separable OR-of-shifts (time pass then freq pass): each shift is a
    contiguous slice + concat and each OR runs on the flat [T'*F'*C]
    vector layout with full lanes.  ``lax.reduce_window`` over the
    leading two axes of a channels-minor array relayouts instead
    (measured ~30x slower -- ``bench_frontend_stages.py``).
    [..., T', F', C] bool -> same, bool.
    """
    if spread_time == 0 and spread_freq == 0:
        return binary
    out = _dilate_axis(binary, spread_time, binary.ndim - 3)
    return _dilate_axis(out, spread_freq, binary.ndim - 2)


def mask_rows(binary: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
    """Zero out rows >= valid_frames (post-spread cleanup)."""
    row_valid = jnp.arange(binary.shape[0], dtype=jnp.int32) < valid_frames
    return binary & row_valid[:, None, None]
