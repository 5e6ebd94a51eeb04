"""The front end: waveform -> binary oriented-edge feature map.

Composition of the ops in ``ops/{framing, dft, edges}`` (SURVEY.md
section 3.4); jit-compiled with static shapes.  Callers pad waveforms
to bucket lengths and pass valid sample counts; outputs carry a valid
feature-frame count.

Parity contract vs ``oracle.frontend.frontend``: identical arithmetic
modulo GEMM summation order -> spectrograms allclose; binary maps
agree except at cells whose response ties the threshold within float
tolerance (tested at >= 99.9% agreement, SURVEY.md section 4 item 2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from template_speech_recognition_tpu.config import FrontendConfig
from template_speech_recognition_tpu.ops import dft, edges, framing


class FeatureMap(NamedTuple):
    """Padded binary edge map plus its valid time extent."""

    binary: jnp.ndarray        # [T', F', 8] bool (padded rows False)
    valid_frames: jnp.ndarray  # scalar int32: rows < valid are real


def spectrogram(
    waveform: jnp.ndarray,
    cfg: FrontendConfig,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """[S] (padded) -> [T, num_bins] float32 log-(mel-)spectrogram."""
    y = framing.preemphasize(waveform, cfg.preemphasis)
    frames = framing.frame_signal(y, cfg.frame_length, cfg.hop_length)
    frames = frames * framing.hamming_window(cfg.frame_length)[None, :]
    if cfg.use_mel:
        return dft.log_mel_spectrogram(
            frames, cfg.nfft, cfg.sample_rate, cfg.n_mels, precision=precision
        )
    return dft.log_magnitude_spectrogram(frames, cfg.nfft, precision=precision)


def _fused_ok(cfg: FrontendConfig) -> bool:
    """Shapes the fused DFT[+mel]+log+edge kernel covers: the mel
    variant always (DFT bins are a contraction axis); the log-magnitude
    variant when the output frequency extent is lane-aligned."""
    return cfg.use_mel or (cfg.nfft // 2) % 128 == 0


def _edge_responses_fused(waveform: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Fused-Pallas path: waveform -> edge responses without the
    spectrogram round-tripping HBM (``ops.frontend_pallas``)."""
    from template_speech_recognition_tpu.ops.frontend_pallas import (
        edge_responses_pallas,
    )

    y = framing.preemphasize(waveform, cfg.preemphasis)
    frames = framing.frame_signal(y, cfg.frame_length, cfg.hop_length)
    frames = frames * framing.hamming_window(cfg.frame_length)[None, :]
    t = frames.shape[0]
    t_pad = ((t + 127) // 128) * 128
    frames = jnp.zeros((t_pad, cfg.frame_length), jnp.float32).at[:t].set(frames)
    return edge_responses_pallas(
        frames, cfg.nfft,
        sample_rate=cfg.sample_rate,
        n_mels=cfg.n_mels if cfg.use_mel else 0,
    )[: t - 1]


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "use_pallas"))
def frontend(
    waveform: jnp.ndarray,
    num_valid_samples: jnp.ndarray,
    cfg: FrontendConfig,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    use_pallas: bool | None = None,
) -> FeatureMap:
    """Padded waveform [S] + valid count -> FeatureMap.

    The quantile threshold is computed over valid cells only, so the
    result for the valid region is independent of bucket padding
    (property-tested: score invariance under padding, SURVEY.md
    section 4 item 3).  ``use_pallas`` routes the DFT+log+edge stage
    through the fused Pallas kernel (log-magnitude path only; the mel
    variant and non-lane-aligned nfft fall back to the XLA path).
    Default ``None`` = on for accelerator backends (production fast
    path), off on CPU where interpret-mode pallas is slow.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas and _fused_ok(cfg):
        resp = _edge_responses_fused(waveform, cfg)
    else:
        spec = spectrogram(waveform, cfg, precision=precision)
        resp = edges.edge_responses(spec)
    # Feature rows = num_frames(valid) - 1 = (valid - frame_length)//hop.
    valid_frames = jnp.where(
        num_valid_samples >= cfg.frame_length,
        (num_valid_samples - cfg.frame_length) // cfg.hop_length,
        0,
    ).astype(jnp.int32)
    binary = edges.binarize(resp, cfg.edge_quantile, valid_frames)
    binary = edges.spread_binary(binary, cfg.spread_time, cfg.spread_freq)
    binary = edges.mask_rows(binary, valid_frames)
    return FeatureMap(binary, valid_frames)


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "use_pallas"))
def frontend_batch(
    waveforms: jnp.ndarray,
    num_valid_samples: jnp.ndarray,
    cfg: FrontendConfig,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    use_pallas: bool | None = None,
) -> FeatureMap:
    """[B, S] + [B] -> FeatureMap with leading batch axis.

    On the fused-pallas path the batch flattens into the kernel's time
    grid (one kernel launch for the whole batch, B x more tiles to
    pipeline) instead of vmapping the pallas_call.  Tile-adjacency
    contamination at utterance boundaries only ever reaches the final
    (already-masked) edge row of each utterance, because every
    utterance contributes a full 128-aligned tile block.  The
    per-utterance quantile threshold / spread / mask stages vmap over
    the batch as plain XLA ops.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas and _fused_ok(cfg):
        from template_speech_recognition_tpu.ops.frontend_pallas import (
            edge_responses_pallas,
        )

        y = jax.vmap(
            lambda w: framing.preemphasize(w, cfg.preemphasis)
        )(waveforms)
        frames = jax.vmap(
            lambda s: framing.frame_signal(s, cfg.frame_length, cfg.hop_length)
        )(y)
        frames = frames * framing.hamming_window(cfg.frame_length)[None, None, :]
        bsz, t = frames.shape[0], frames.shape[1]
        t_pad = ((t + 127) // 128) * 128
        frames_p = (
            jnp.zeros((bsz, t_pad, cfg.frame_length), jnp.float32)
            .at[:, :t].set(frames)
            .reshape(bsz * t_pad, cfg.frame_length)
        )
        resp = edge_responses_pallas(
            frames_p, cfg.nfft,
            sample_rate=cfg.sample_rate,
            n_mels=cfg.n_mels if cfg.use_mel else 0,
        )
        resp = resp.reshape(bsz, t_pad, cfg.feature_freqs, 8)[:, : t - 1]
        valid_frames = jnp.where(
            num_valid_samples >= cfg.frame_length,
            (num_valid_samples - cfg.frame_length) // cfg.hop_length,
            0,
        ).astype(jnp.int32)

        def finish(r, vf):
            b = edges.binarize(r, cfg.edge_quantile, vf)
            b = edges.spread_binary(b, cfg.spread_time, cfg.spread_freq)
            return edges.mask_rows(b, vf)

        return FeatureMap(jax.vmap(finish)(resp, valid_frames), valid_frames)
    fn = functools.partial(
        frontend.__wrapped__, cfg=cfg, precision=precision, use_pallas=False
    )
    return jax.vmap(fn)(waveforms, num_valid_samples)
