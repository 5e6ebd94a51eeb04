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
from template_speech_recognition_tpu.ops import dft, framing


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
    section 4 item 3).  Compat wrapper over the plane-major production
    path (``frontend.planes``), converting its flat [T, D] output to
    the classic channels-minor layout.
    """
    fm = frontend_batch.__wrapped__(
        waveform[None], num_valid_samples[None], cfg,
        precision=precision, use_pallas=use_pallas,
    )
    return FeatureMap(fm.binary[0], fm.valid_frames[0])


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "use_pallas"))
def frontend_batch(
    waveforms: jnp.ndarray,
    num_valid_samples: jnp.ndarray,
    cfg: FrontendConfig,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    use_pallas: bool | None = None,
) -> FeatureMap:
    """[B, S] + [B] -> FeatureMap with leading batch axis.

    Classic-layout wrapper: runs the plane-major flat frontend
    (``frontend.planes.frontend_batch_flat`` -- identical values, see
    its module docstring) and relayouts to [B, T', F', 8] with
    T' = num_frames - 1.  Hot paths (the streaming scans) call the
    flat variant directly and skip the relayout.
    """
    del precision  # plane path always uses HIGHEST (log amplifies error)
    from template_speech_recognition_tpu.frontend.planes import (
        frontend_batch_flat,
    )
    from template_speech_recognition_tpu.ops.layout import flat_to_channels

    fm = frontend_batch_flat(
        waveforms, num_valid_samples, cfg, use_pallas=use_pallas
    )
    t_out = cfg.num_feature_frames(waveforms.shape[-1])
    binary = flat_to_channels(fm.binary[:, :t_out], cfg.feature_freqs)
    return FeatureMap(binary, fm.valid_frames)
