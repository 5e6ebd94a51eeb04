"""Fused Pallas frontend kernel: windowed frames -> oriented edge
responses in one VMEM pass (BASELINE.json:5 "the front end ... runs as
fused Pallas kernels"; SURVEY.md section 3.4 / Stage 3a).

Per time-tile the kernel runs the GEMM-native DFT (frames @ cos/sin,
MelT-style -- PAPERS.md:5), squares/logs on the VPU -- optionally
through the mel filterbank as a second MXU matmul (the log-mel variant
of BASELINE.json:5) -- and immediately takes the four oriented finite
differences: the [T, F] spectrogram never round-trips to HBM.  The
time-adjacent row needed by the d_time/d_diag/d_anti diffs comes from
the next frames block (adjacent-tile trick, as in
``ops.correlation_pallas``).

Outputs the 4 positive-polarity difference planes [T_pad, F-1]; the
caller negates/stacks to the [T', F', 8] layout and applies the
(globally-coupled) quantile threshold + spreading, which cannot fuse
into a tile-local kernel.  Parity: identical arithmetic to
``ops.dft.log_magnitude_spectrogram`` / ``ops.dft.log_mel_spectrogram``
+ ``ops.edges.edge_responses`` modulo MXU summation order (allclose;
see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from template_speech_recognition_tpu.ops.dft import LOG_EPS, dft_matrices


def _kernel(f0_ref, f1_ref, cos_ref, sin_ref, mel_ref,
            dt_ref, df_ref, dd_ref, da_ref,
            spec_ref, *, freq_out: int, use_mel: bool):
    bt = f0_ref.shape[0]

    def logspec(frames):
        # HIGHEST precision: the MXU's default bf16-pass f32 matmul
        # loses ~1e-3 relative, which the log amplifies unboundedly in
        # near-zero power bins (compiled-vs-oracle mismatch of O(1)).
        re = jax.lax.dot_general(
            frames, cos_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im = jax.lax.dot_general(
            frames, sin_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        power = re * re + im * im
        if use_mel:
            mel = jax.lax.dot_general(
                power, mel_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.log(mel + LOG_EPS)
        return 0.5 * jnp.log(power + LOG_EPS)

    spec_ref[0:bt, :] = logspec(f0_ref[:, :])
    spec_ref[bt : bt + 8, :] = logspec(f1_ref[0:8, :])

    cur = spec_ref[0:bt, :]                     # rows t   .. t+bt-1
    nxt = spec_ref[1 : bt + 1, :]               # rows t+1 .. t+bt
    f = freq_out
    dt_ref[:, :] = nxt[:, 0:f] - cur[:, 0:f]            # d_time
    df_ref[:, :] = cur[:, 1 : f + 1] - cur[:, 0:f]      # d_freq
    dd_ref[:, :] = nxt[:, 1 : f + 1] - cur[:, 0:f]      # d_diag
    da_ref[:, :] = nxt[:, 0:f] - cur[:, 1 : f + 1]      # d_anti


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "block_t", "interpret", "sample_rate", "n_mels"),
)
def edge_response_planes_pallas(
    frames: jnp.ndarray,        # [T_pad, frame_length] f32 windowed frames
    nfft: int,
    block_t: int = 128,
    interpret: bool | None = None,
    sample_rate: int = 0,
    n_mels: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused DFT[+mel]+log+edge kernel returning the four raw
    difference PLANES (dt, df, dd, da), each [T_pad, F-1].

    This is the production entry: the plane layout keeps every
    downstream op (quantile select, binarize, spreading) on
    lane-aligned [T, F] arrays instead of the channels-minor
    [T, F, 8] layout, whose (F, 8) trailing-dims tiling wastes 15/16
    of each (8, 128) vector tile (measured ~20x slowdowns --
    ``bench_frontend_stages.py``).  The 8 logical edge channels are
    the planes and their negations: channel 2i = plane i, channel
    2i+1 = -plane i.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t, fl = frames.shape
    use_mel = n_mels > 0
    bins = nfft // 2 + 1
    freq_out = (n_mels - 1) if use_mel else nfft // 2
    if t % block_t:
        raise ValueError(f"T_pad={t} not divisible by block_t={block_t}")
    if not use_mel and freq_out % 128:
        raise ValueError(f"nfft//2={freq_out} must be a lane multiple")
    fl_pad = ((fl + 127) // 128) * 128
    # spec needs columns up to freq_out (edges read col freq_out).
    nb = freq_out + 1 if not use_mel else bins
    b_pad = ((nb + 127) // 128) * 128
    cos_m, sin_m = dft_matrices(fl, nfft)          # [fl, bins]
    cos_p = jnp.zeros((fl_pad, b_pad), jnp.float32).at[:fl, :nb].set(
        cos_m[:, :nb]
    )
    sin_p = jnp.zeros((fl_pad, b_pad), jnp.float32).at[:fl, :nb].set(
        sin_m[:, :nb]
    )
    if use_mel:
        from template_speech_recognition_tpu.ops.dft import mel_filterbank

        fb = mel_filterbank(sample_rate, nfft, n_mels)      # [bins, n_mels]
        m_pad = ((n_mels + 127) // 128) * 128
        mel_p = jnp.zeros((b_pad, m_pad), jnp.float32).at[:bins, :n_mels].set(fb)
        spec_cols = m_pad
    else:
        mel_p = jnp.zeros((8, 128), jnp.float32)   # unused dummy operand
        spec_cols = b_pad
    frames_p = jnp.zeros((t, fl_pad), jnp.float32).at[:, :fl].set(
        frames.astype(jnp.float32)
    )
    n_t = t // block_t
    grid = (n_t,)
    out_shape = [jax.ShapeDtypeStruct((t, freq_out), jnp.float32)] * 4
    out_spec = pl.BlockSpec(
        (block_t, freq_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dt, df, dd, da = pl.pallas_call(
        functools.partial(_kernel, freq_out=freq_out, use_mel=use_mel),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, fl_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, fl_pad),
                         lambda i, _n=n_t: (jnp.minimum(i + 1, _n - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, b_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, b_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_p.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((block_t + 8, spec_cols), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * t * fl_pad * b_pad)
            + (int(2 * t * b_pad * spec_cols) if use_mel else 0),
            bytes_accessed=int(frames_p.size * 8 + 4 * t * freq_out * 4),
            transcendentals=int(t * spec_cols),
        ),
        interpret=interpret,
    )(frames_p, frames_p, cos_p, sin_p, mel_p)
    return dt, df, dd, da


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "block_t", "interpret", "sample_rate", "n_mels"),
)
def edge_responses_pallas(
    frames: jnp.ndarray,        # [T_pad, frame_length] f32 windowed frames
    nfft: int,
    block_t: int = 128,
    interpret: bool | None = None,
    sample_rate: int = 0,
    n_mels: int = 0,
) -> jnp.ndarray:               # [T_pad, F-1, 8] edge responses
    """Channels-minor view of the fused kernel (legacy / parity API).

    Log-magnitude variant (``n_mels == 0``): F-1 = nfft//2 output
    frequencies, which must be a lane multiple (the spec column shifts
    stay tile-aligned).  Log-mel variant (``n_mels > 0``): the power
    spectrum projects through the HTK filterbank inside the kernel
    (one extra MXU matmul per tile) and F-1 = n_mels - 1; any nfft
    works -- the DFT bins are a contraction axis, zero-padded to lanes.

    Rows [0, T_pad-2] are exact edge-response rows; the final row
    (needing spectrogram row T_pad) is clamped garbage -- callers mask
    rows >= valid anyway.  Constraint: T_pad % block_t == 0.
    """
    dt, df, dd, da = edge_response_planes_pallas(
        frames, nfft, block_t=block_t, interpret=interpret,
        sample_rate=sample_rate, n_mels=n_mels,
    )
    # Stack to the [T, F', E] channel layout of ops.edges.edge_responses.
    return jnp.stack([dt, -dt, df, -df, dd, -dd, da, -da], axis=-1)
