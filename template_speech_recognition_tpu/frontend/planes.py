"""Plane-major frontend: waveform -> flat lane-aligned feature map.

Round-2 verdict missing item 1: the frontend bound the whole framework
at ~1.9k audio-s/s because its canonical channels-minor [T, F', 8]
layout puts 8 in the lane dimension of every (8, 128)-tiled vector op
(15/16 of each tile wasted) and its quantile was a full bitonic sort.
This module is the TPU-native redesign:

* edge responses stay as four [T, F'] PLANES (dt, df, dd, da); the 8
  logical channels are the planes and their negations (channel 2i =
  plane i, channel 2i+1 = -plane i) and are never materialized as a
  channels-minor array;
* the per-channel quantile threshold is a DUAL-RANK radix select over
  plane keys (``ops.edges.order_keys``): the order statistic of
  -plane at rank k equals minus the order statistic of plane at rank
  n-1-k, so 8 channel thresholds cost 4 planes x 2 ranks of bisection
  counting -- half the reads of a per-channel pass and ~100x less
  device time than the sort;
* binarize + spreading run on [T, F] planes (freq dilation = lane
  shifts) and on the final flat [T, D] map (time dilation = row
  shifts), all at full lane occupancy;
* the output is the FLAT feature map [T, D = E*F'] with channel-major
  order d = e*F' + f.  This is a pure relayout of the classic
  [T, F', E] map (``ops.layout`` converts both ways); scoring
  contracts over D, so banks flattened with
  ``ops.layout.filters_to_flat`` give BIT-IDENTICAL contractions.

Parity: every value equals the channels-minor pipeline exactly (same
floats, same compares; negation and the rank identity are exact in
IEEE), tested in ``tests/test_planes_frontend.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from template_speech_recognition_tpu.config import FrontendConfig
from template_speech_recognition_tpu.ops import dft, edges, framing


class FlatFeatureMap(NamedTuple):
    """Flat binary edge map [.., T, D] (d = e*F' + f) + valid rows."""

    binary: jnp.ndarray        # [.., T, E*F'] bool (invalid rows False)
    valid_frames: jnp.ndarray  # [..] int32: rows < valid are real


def _fused_ok(cfg: FrontendConfig) -> bool:
    """Shapes the fused Pallas kernel covers (see ops.frontend_pallas)."""
    return cfg.use_mel or (cfg.nfft // 2) % 128 == 0


# VMEM budget of the resident select kernel, in per-plane cells (T*F):
# per (utterance, plane) program 2x input [T, F] f32 block (8 B/cell)
# + 2x output [T, 2F] u8 block (4) + key scratch (4) + epilogue
# temporaries (~16) ~= 32 bytes/cell; 32 B * 1.5M ~= 48 MB of the
# 128 MB VMEM (kernel cap 100 MB).
_SELBIN_MAX_CELLS = 1_572_864


def _selbin_ok(cfg: FrontendConfig, t_pad: int) -> bool:
    """Shapes the VMEM-resident select+binspread kernel covers: the
    whole [T, F] plane must sit in VMEM (ops.selbin_pallas)."""
    f = cfg.feature_freqs
    return f % 128 == 0 and t_pad % 128 == 0 and (
        t_pad * f <= _SELBIN_MAX_CELLS
    )


def _windowed_frames(waveforms: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[B, S] -> [B, T, frame_length] preemphasized windowed frames."""
    y = framing.preemphasize(waveforms, cfg.preemphasis)
    frames = framing.frame_signal(y, cfg.frame_length, cfg.hop_length)
    return frames * framing.hamming_window(cfg.frame_length)[None, None, :]


def response_planes(
    frames: jnp.ndarray,         # [B, T, frame_length]
    cfg: FrontendConfig,
    use_pallas: bool,
) -> jnp.ndarray:                # [B, 4, T_out, F']
    """Windowed frames -> the four oriented difference planes.

    Pallas path: T_out = T rounded up to 128 (rows >= T-1 are garbage
    and must be masked by the caller's valid_frames, which is always
    <= T-1).  XLA path: T_out = T - 1 (exact rows only).
    """
    b, t = frames.shape[0], frames.shape[1]
    f = cfg.feature_freqs
    if use_pallas and _fused_ok(cfg):
        from template_speech_recognition_tpu.ops.frontend_pallas import (
            edge_response_planes_pallas,
        )

        t_pad = ((t + 127) // 128) * 128
        fp = (
            jnp.zeros((b, t_pad, cfg.frame_length), jnp.float32)
            .at[:, :t].set(frames)
            .reshape(b * t_pad, cfg.frame_length)
        )
        planes = edge_response_planes_pallas(
            fp, cfg.nfft,
            sample_rate=cfg.sample_rate,
            n_mels=cfg.n_mels if cfg.use_mel else 0,
        )
        return jnp.stack(
            [p.reshape(b, t_pad, f) for p in planes], axis=1
        )
    if cfg.use_mel:
        spec = dft.log_mel_spectrogram(
            frames.reshape(b * t, -1), cfg.nfft, cfg.sample_rate, cfg.n_mels,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(b, t, -1)
    else:
        spec = dft.log_magnitude_spectrogram(
            frames.reshape(b * t, -1), cfg.nfft,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(b, t, -1)
    cur = spec[:, :-1]
    nxt = spec[:, 1:]
    d_time = nxt[:, :, :f] - cur[:, :, :f]
    d_freq = cur[:, :, 1 : f + 1] - cur[:, :, :f]
    d_diag = nxt[:, :, 1 : f + 1] - cur[:, :, :f]
    d_anti = nxt[:, :, :f] - cur[:, :, 1 : f + 1]
    return jnp.stack([d_time, d_freq, d_diag, d_anti], axis=1)


def plane_order_statistics(
    planes: jnp.ndarray,          # [B, P, T, F]
    valid_frames: jnp.ndarray,    # [B] int32
    quantile: float,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact order statistics of each plane's valid cells at ranks
    k = min(n-1, floor(q*n)) and n-1-k: (os_k, os_{n-1-k}), each
    [B, P] float32.  Channel thresholds follow as tau[2i] = os_k[i],
    tau[2i+1] = -os_{n-1-k}[i] (the dual-rank identity
    sorted(-x)[k] == -sorted(x)[n-1-k]).

    Dual-rank radix bisection (see ``ops.edges.radix_kth_smallest``):
    8 passes; each pass reads the keys once and counts the 2 ranks x
    16 candidate digit extensions.  ``use_pallas=True`` runs each
    counting pass as the fused ``ops.radix_pallas`` kernel (one HBM
    stream of the keys per level; XLA restreams them per candidate
    group -- measured ~5x slower at the bench shape); both paths
    select the bit-identical element.
    """
    b, p, t, f = planes.shape
    keys = edges.order_keys(planes.reshape(b, p, t * f))
    row_valid = jnp.arange(t, dtype=jnp.int32)[None, :] < valid_frames[:, None]
    cell_valid = jnp.broadcast_to(
        row_valid[:, None, :, None], (b, p, t, f)
    ).reshape(b, p, t * f)
    keys = jnp.where(cell_valid, keys, jnp.uint32(0xFFFFFFFF))
    n = (valid_frames * f).astype(jnp.int32)                    # [B]
    k1 = jnp.minimum(
        n - 1,
        jnp.floor(jnp.float32(quantile) * n.astype(jnp.float32)).astype(jnp.int32),
    )
    k2 = n - 1 - k1
    need = jnp.stack([k1, k2], axis=-1)[:, None, :] + 1         # [B, 1, 2]
    prefix = jnp.zeros((b, p, 2), jnp.uint32)
    keys_flat = keys.reshape(b * p, t * f) if use_pallas else None
    # The selected element is identical for ANY digit-width schedule
    # (each level refines the same bisection); the Pallas path uses
    # 3-bit digits -- 11 levels x 8 candidates = 168 compares/key vs
    # 256 for 8x4-bit -- because the fused kernel is compute-bound,
    # while the XLA path keeps 4-bit digits (fewer, wider fused
    # reduces suit the compiler better).
    widths = (2,) + (3,) * 10 if use_pallas else (4,) * 8
    bits_done = 0
    for w in widths:
        bits_done += w
        shift = 32 - bits_done
        iota = jnp.arange(1 << w, dtype=jnp.uint32)
        base = prefix << jnp.uint32(w)                          # [B, P, 2]
        cand = base[..., None] + iota                           # [B,P,2,2^w]
        if use_pallas:
            from template_speech_recognition_tpu.ops.radix_pallas import (
                radix_level_counts_pallas,
            )

            cnt = radix_level_counts_pallas(
                keys_flat, cand.reshape(b * p, 2 << w), shift
            ).reshape(b, p, 2, 1 << w)
        else:
            hi = keys >> jnp.uint32(shift)                      # [B, P, N]
            cnt = jnp.sum(
                (hi[:, :, None, None, :] <= cand[..., None]).astype(
                    jnp.int32
                ),
                axis=-1,
            )                                                   # [B,P,2,2^w]
        digit = jnp.argmax(cnt >= need[..., None], axis=-1).astype(jnp.uint32)
        prefix = base + digit
    os_ = edges.key_to_float(prefix)                            # [B, P, 2]
    return os_[..., 0], os_[..., 1]


def binarize_spread_flat(
    planes: jnp.ndarray,          # [B, P, T, F]
    os_hi: jnp.ndarray,           # [B, P] rank-k order statistic
    os_lo: jnp.ndarray,           # [B, P] rank-(n-1-k) order statistic
    valid_frames: jnp.ndarray,    # [B]
    spread_time: int,
    spread_freq: int,
    use_pallas: bool = False,
) -> jnp.ndarray:                 # [B, T, 2P*F] bool
    """Binarize both polarities of each plane, dilate, emit flat map.

    Channel 2i keeps plane > os_hi; channel 2i+1 keeps
    -plane > -os_lo, i.e. plane < os_lo (exact equivalents).  Rows >=
    valid are forced False before spreading and again after (identical
    to the classic binarize -> spread -> mask_rows sequence).

    ``use_pallas=True`` fuses binarize + freq dilation into one
    kernel pass over the planes (``ops.binspread_pallas``); time
    dilation and the final mask stay in XLA (cheap [B, T, D] passes).
    """
    b, p, t, f = planes.shape
    row_valid = (
        jnp.arange(t, dtype=jnp.int32)[None, :, None] < valid_frames[:, None, None]
    )                                                           # [B, T, 1]
    if use_pallas and t % 128 == 0:
        from template_speech_recognition_tpu.ops.binspread_pallas import (
            binarize_freqspread_pallas,
        )

        flat = binarize_freqspread_pallas(
            planes, os_hi, os_lo, valid_frames, spread_freq
        ).astype(jnp.bool_)
        if spread_time:
            flat = edges._dilate_axis(flat, spread_time, 1)
        return flat & row_valid
    chans = []
    for i in range(p):
        chans.append((planes[:, i] > os_hi[:, i, None, None]) & row_valid)
        chans.append((planes[:, i] < os_lo[:, i, None, None]) & row_valid)
    flat = jnp.concatenate(chans, axis=-1)                      # [B, T, 2P*F]
    if spread_freq:
        # freq dilation directly on the flat map: a +/-s lane shift
        # crosses channel blocks at f < s (resp. f >= F-s), so those
        # columns are masked -- 2r masked OR-shift passes over ONE
        # [B, T, D] array instead of 2r passes over each of the 2P
        # per-channel maps (the dilation dominated the epilogue)
        fidx = jnp.arange(flat.shape[-1], dtype=jnp.int32) % f
        out = flat
        for s in range(1, spread_freq + 1):
            out = out | (
                edges._shifted(flat, s, flat.ndim - 1) & (fidx >= s)
            ) | (
                edges._shifted(flat, -s, flat.ndim - 1) & (fidx < f - s)
            )
        flat = out
    if spread_time:
        flat = edges._dilate_axis(flat, spread_time, 1)
    return flat & row_valid


def _dual_ranks(
    valid_frames: jnp.ndarray, f: int, quantile: float
) -> jnp.ndarray:
    """[B] valid frames -> [B, 2] (rank+1) for ranks k and n-1-k, the
    exact arithmetic of ``plane_order_statistics`` (k in f32 on both
    CPU and TPU to rule out rounding-width divergence)."""
    n = (valid_frames * f).astype(jnp.int32)
    k1 = jnp.minimum(
        n - 1,
        jnp.floor(
            jnp.float32(quantile) * n.astype(jnp.float32)
        ).astype(jnp.int32),
    )
    k2 = n - 1 - k1
    return jnp.stack([k1, k2], axis=-1) + 1


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def frontend_batch_flat(
    waveforms: jnp.ndarray,       # [B, S] padded
    num_valid_samples: jnp.ndarray,  # [B]
    cfg: FrontendConfig,
    use_pallas: bool | None = None,
) -> FlatFeatureMap:
    """[B, S] padded waveforms -> flat binary feature maps.

    The production frontend (the streaming scans consume this
    directly).  Output rows beyond each utterance's valid extent are
    False; the time extent is 128-aligned on the Pallas path.

    Hot path (``use_pallas`` and shapes in the VMEM budget): TWO
    kernels -- the stacked response-plane kernel and the resident
    select+binspread kernel (``ops.selbin_pallas``) -- so the response
    planes cross HBM exactly once (written by the first, read by the
    second); only the cheap [B, T, D] u8 time dilation and row mask
    stay in XLA.  Bit-identical to the layered path below it (same
    floats, same compares; tested in tests/test_selbin_pallas.py).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    frames = _windowed_frames(waveforms, cfg)
    valid_frames = jnp.where(
        num_valid_samples >= cfg.frame_length,
        (num_valid_samples - cfg.frame_length) // cfg.hop_length,
        0,
    ).astype(jnp.int32)
    b, t = frames.shape[0], frames.shape[1]
    t_pad = ((t + 127) // 128) * 128
    f = cfg.feature_freqs
    if use_pallas and _fused_ok(cfg) and _selbin_ok(cfg, t_pad):
        from template_speech_recognition_tpu.ops.frontend_pallas import (
            edge_response_planes_stacked_pallas,
        )
        from template_speech_recognition_tpu.ops.selbin_pallas import (
            select_binspread_pallas,
        )

        fp = (
            jnp.zeros((b, t_pad, cfg.frame_length), jnp.float32)
            .at[:, :t].set(frames)
            .reshape(b * t_pad, cfg.frame_length)
        )
        stacked = edge_response_planes_stacked_pallas(
            fp, cfg.nfft,
            sample_rate=cfg.sample_rate,
            n_mels=cfg.n_mels if cfg.use_mel else 0,
        )                                        # [4, B*T_pad, F]
        need = _dual_ranks(valid_frames, f, cfg.edge_quantile)
        flat_u8, _ = select_binspread_pallas(
            stacked.reshape(4, b, t_pad, f), need, valid_frames,
            cfg.spread_freq, cfg.spread_time,
        )
        # the kernel emits the FINAL map (both dilations + row mask);
        # only the dtype view remains
        return FlatFeatureMap(flat_u8.astype(jnp.bool_), valid_frames)
    planes = response_planes(frames, cfg, use_pallas)
    os_hi, os_lo = plane_order_statistics(
        planes, valid_frames, cfg.edge_quantile, use_pallas=use_pallas
    )
    flat = binarize_spread_flat(
        planes, os_hi, os_lo, valid_frames, cfg.spread_time,
        cfg.spread_freq, use_pallas=use_pallas,
    )
    return FlatFeatureMap(flat, valid_frames)
