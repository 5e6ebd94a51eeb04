"""Fused Pallas frontend kernel: windowed frames -> oriented edge
responses in one VMEM pass (BASELINE.json:5 "the front end ... runs as
fused Pallas kernels"; SURVEY.md section 3.4 / Stage 3a).

Per time-tile the kernel runs the GEMM-native DFT (frames @ cos/sin,
MelT-style -- PAPERS.md:5), squares/logs on the VPU, and immediately
takes the four oriented finite differences -- the [T, F] spectrogram
never round-trips to HBM.  The time-adjacent row needed by the
d_time/d_diag/d_anti diffs comes from the next frames block (adjacent-
tile trick, as in ``ops.correlation_pallas``).

Outputs the 4 positive-polarity difference planes [T_pad, F-1]; the
caller negates/stacks to the [T', F', 8] layout and applies the
(globally-coupled) quantile threshold + spreading, which cannot fuse
into a tile-local kernel.  Parity: identical arithmetic to
``ops.dft.log_magnitude_spectrogram`` + ``ops.edges.edge_responses``
modulo MXU summation order (allclose; see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from template_speech_recognition_tpu.ops.dft import LOG_EPS, dft_matrices


def _kernel(f0_ref, f1_ref, cos_ref, sin_ref, dt_ref, df_ref, dd_ref, da_ref,
            spec_ref, *, freq_out: int):
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
        return 0.5 * jnp.log(re * re + im * im + LOG_EPS)

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
    jax.jit, static_argnames=("nfft", "block_t", "interpret")
)
def edge_responses_pallas(
    frames: jnp.ndarray,        # [T_pad, frame_length] f32 windowed frames
    nfft: int,
    block_t: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:               # [T_pad, nfft//2, 8] edge responses
    """Fused DFT+log+edge kernel.

    Rows [0, T_pad-2] are exact edge-response rows; the final row
    (needing spectrogram row T_pad) is clamped garbage -- callers mask
    rows >= valid anyway.  Constraints: T_pad % block_t == 0,
    nfft//2 % 128 == 0; frame_length is zero-padded to a lane multiple
    here (zero taps contribute nothing to the DFT).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t, fl = frames.shape
    freq_out = nfft // 2
    if t % block_t:
        raise ValueError(f"T_pad={t} not divisible by block_t={block_t}")
    if freq_out % 128:
        raise ValueError(f"nfft//2={freq_out} must be a lane multiple")
    fl_pad = ((fl + 127) // 128) * 128
    f_pad = ((freq_out + 1 + 127) // 128) * 128   # spec needs bin freq_out
    cos_m, sin_m = dft_matrices(fl, nfft)          # [fl, freq_out+1]
    cos_p = jnp.zeros((fl_pad, f_pad), jnp.float32).at[:fl, : freq_out + 1].set(cos_m)
    sin_p = jnp.zeros((fl_pad, f_pad), jnp.float32).at[:fl, : freq_out + 1].set(sin_m)
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
        functools.partial(_kernel, freq_out=freq_out),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, fl_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, fl_pad),
                         lambda i, _n=n_t: (jnp.minimum(i + 1, _n - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fl_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((block_t + 8, f_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * t * fl_pad * f_pad),
            bytes_accessed=int(frames_p.size * 8 + 4 * t * freq_out * 4),
            transcendentals=int(t * f_pad),
        ),
        interpret=interpret,
    )(frames_p, frames_p, cos_p, sin_p)
    # Stack to the [T, F', E] channel layout of ops.edges.edge_responses.
    return jnp.stack([dt, -dt, df, -df, dd, -dd, da, -da], axis=-1)
