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




def _kernel(f0_ref, f1_ref, cos_ref, sin_ref, mel_ref, ny_ref,
            dt_ref, df_ref, dd_ref, da_ref,
            spec_ref, *, freq_out: int, use_mel: bool, precision):
    bt = f0_ref.shape[0]
    logspec = _make_logspec(cos_ref, sin_ref, mel_ref, ny_ref, use_mel,
                            precision)

    _fill_spec(spec_ref, 0, bt, logspec(f0_ref[:, :]))
    _fill_spec(spec_ref, bt, 8, logspec(f1_ref[0:8, :]))

    cur = spec_ref[0:bt, :]                     # rows t   .. t+bt-1
    nxt = spec_ref[1 : bt + 1, :]               # rows t+1 .. t+bt
    f = freq_out
    dt_ref[:, :] = nxt[:, 0:f] - cur[:, 0:f]            # d_time
    df_ref[:, :] = cur[:, 1 : f + 1] - cur[:, 0:f]      # d_freq
    dd_ref[:, :] = nxt[:, 1 : f + 1] - cur[:, 0:f]      # d_diag
    da_ref[:, :] = nxt[:, 0:f] - cur[:, 1 : f + 1]      # d_anti


def _kernel_stacked(f0_ref, f1_ref, cos_ref, sin_ref, mel_ref, ny_ref,
                    out_ref, spec_ref, *, freq_out: int, use_mel: bool,
                    precision):
    """Stacked-output variant for the fused select kernel
    (``ops.selbin_pallas``): the grid is (time tiles, 4 planes) with
    the plane axis minor; sub-step p == 0 runs the DFT+log into the
    persistent spec scratch (one GEMM per time tile, exactly as the
    4-output kernel) and every sub-step writes ONE plane's
    [block_t, F] tile into the [4, T_pad, F] output -- each write is a
    single contiguous tile, which is what a (4, block_t, F) block
    could not give (measured +0.5 ms).  The input blocks' index maps
    ignore p, so the pipeline fetches each frames block once per time
    tile."""
    p = pl.program_id(1)
    bt = f0_ref.shape[0]
    logspec = _make_logspec(cos_ref, sin_ref, mel_ref, ny_ref, use_mel,
                            precision)

    @pl.when(p == 0)
    def _():
        _fill_spec(spec_ref, 0, bt, logspec(f0_ref[:, :]))
        _fill_spec(spec_ref, bt, 8, logspec(f1_ref[0:8, :]))

    cur = spec_ref[0:bt, :]
    nxt = spec_ref[1 : bt + 1, :]
    f = freq_out
    n0 = nxt[:, 0:f]
    c0 = cur[:, 0:f]
    # plane p: lhs - rhs with lhs in {n0, c1, n1, n0}, rhs in
    # {c0, c0, c0, c1} -- two selects instead of a lax.switch
    lhs = jnp.where(
        p == 1,
        cur[:, 1 : f + 1],
        jnp.where(p == 2, nxt[:, 1 : f + 1], n0),
    )
    rhs = jnp.where(p == 3, cur[:, 1 : f + 1], c0)
    out_ref[0] = lhs - rhs


def _make_logspec(cos_ref, sin_ref, mel_ref, ny_ref, use_mel, precision):
    """DFT + log of one frames tile.

    Precision (``dft_precision``): the single-pass bf16 default
    loses ~1e-3 relative, which the log amplifies unboundedly in
    near-zero power bins (compiled-vs-oracle mismatch of O(1)), so
    only two modes exist: "highest" (the MXU's 6-pass exact-f32
    emulation) and "split3" -- a manual 3-pass Markidis-style split
    (x ~ hi(x) + lo(x) in bf16; drop the lo*lo term) that Mosaic's
    dot lowering does not offer natively (Precision.HIGH raises
    NotImplementedError in pallas).  split3's residual is the dropped
    lo*lo product, ~2^-16 relative on the power, which the LOG_EPS
    floor turns into < 2e-5 absolute on the log -- far inside every
    parity gate -- at half the MXU passes.

    Non-mel path: the GEMM covers the freq_out lane-aligned columns
    only; the one extra spectrogram column the freq diffs read (the
    Nyquist bin at freq_out = nfft/2) is a rank-1 row dot computed on
    the VPU (ny_ref rows: cos, sin), saving the 33% lane padding a
    (freq_out+1)-column GEMM would pay (384 vs 256 lanes at nfft=512).
    """
    if precision == "split3":
        def matmul(x, w):
            x1 = x.astype(jnp.bfloat16)
            x2 = (x - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            w1 = w.astype(jnp.bfloat16)
            w2 = (w - w1.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot(a, b):
                return jax.lax.dot_general(
                    a, b,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return dot(x1, w1) + dot(x1, w2) + dot(x2, w1)
    elif precision == "highest":
        def matmul(x, w):
            return jax.lax.dot_general(
                x, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    else:
        raise ValueError(f"dft_precision must be highest|split3: {precision}")

    def logspec(frames):
        re = matmul(frames, cos_ref[:, :])
        im = matmul(frames, sin_ref[:, :])
        power = re * re + im * im
        if use_mel:
            mel = matmul(power, mel_ref[:, :])
            return jnp.log(mel + LOG_EPS), None
        re_n = jnp.sum(frames * ny_ref[0, :][None, :], axis=1,
                       keepdims=True)
        im_n = jnp.sum(frames * ny_ref[1, :][None, :], axis=1,
                       keepdims=True)
        power_n = re_n * re_n + im_n * im_n
        spec = 0.5 * jnp.log(power + LOG_EPS)
        spec_n = 0.5 * jnp.log(power_n + LOG_EPS)
        return spec, spec_n

    return logspec


def _fill_spec(spec_ref, row0, nrows, result):
    """Write a logspec result (main block + optional Nyquist column)
    into the spec scratch rows [row0, row0+nrows)."""
    if isinstance(result, tuple):
        main, extra = result
    else:
        main, extra = result, None
    cols = main.shape[1]
    spec_ref[row0 : row0 + nrows, 0:cols] = main
    if extra is not None:
        spec_ref[row0 : row0 + nrows, cols : cols + 1] = extra


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "block_t", "interpret", "sample_rate",
                     "n_mels", "dft_precision"),
)
def edge_response_planes_pallas(
    frames: jnp.ndarray,        # [T_pad, frame_length] f32 windowed frames
    nfft: int,
    block_t: int = 128,
    interpret: bool | None = None,
    sample_rate: int = 0,
    n_mels: int = 0,
    dft_precision: str = "highest",
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
    use_mel = n_mels > 0
    (frames_p, cos_p, sin_p, mel_p, ny_p, freq_out, spec_cols, in_specs,
     n_t) = _prepare_operands(frames, nfft, block_t, sample_rate, n_mels)
    t = frames_p.shape[0]
    out_spec = pl.BlockSpec(
        (block_t, freq_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dt, df, dd, da = pl.pallas_call(
        functools.partial(_kernel, freq_out=freq_out, use_mel=use_mel,
                          precision=dft_precision),
        out_shape=[jax.ShapeDtypeStruct((t, freq_out), jnp.float32)] * 4,
        grid=(n_t,),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((block_t + 8, spec_cols), jnp.float32)],
        cost_estimate=_cost(t, frames_p.shape[1], cos_p.shape[1],
                            spec_cols, freq_out, use_mel,
                            frames_p.size),
        interpret=interpret,
    )(frames_p, frames_p, cos_p, sin_p, mel_p, ny_p)
    return dt, df, dd, da


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "block_t", "interpret", "sample_rate",
                     "n_mels", "dft_precision"),
)
def edge_response_planes_stacked_pallas(
    frames: jnp.ndarray,        # [T_pad, frame_length] f32 windowed frames
    nfft: int,
    block_t: int = 128,
    interpret: bool | None = None,
    sample_rate: int = 0,
    n_mels: int = 0,
    dft_precision: str = "highest",
) -> jnp.ndarray:               # [4, T_pad, F-1]
    """Same fused kernel, single stacked [4, T_pad, F'] output -- the
    input layout of the resident select+binspread kernel
    (``ops.selbin_pallas``), written directly so no XLA restack
    touches HBM.  See ``_kernel_stacked`` for the (time, plane) grid
    trick that keeps every output write one contiguous tile while the
    DFT GEMM still runs once per time tile."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    use_mel = n_mels > 0
    (frames_p, cos_p, sin_p, mel_p, ny_p, freq_out, spec_cols, in_specs,
     n_t) = _prepare_operands(frames, nfft, block_t, sample_rate, n_mels)
    t = frames_p.shape[0]
    return pl.pallas_call(
        functools.partial(
            _kernel_stacked, freq_out=freq_out, use_mel=use_mel,
            precision=dft_precision,
        ),
        out_shape=jax.ShapeDtypeStruct((4, t, freq_out), jnp.float32),
        grid=(n_t, 4),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_t, freq_out), lambda i, p: (p, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_t + 8, spec_cols), jnp.float32)],
        cost_estimate=_cost(t, frames_p.shape[1], cos_p.shape[1],
                            spec_cols, freq_out, use_mel,
                            frames_p.size),
        interpret=interpret,
    )(frames_p, frames_p, cos_p, sin_p, mel_p, ny_p)


def _prepare_operands(frames, nfft, block_t, sample_rate, n_mels):
    """Shared operand padding + block specs of the two plane kernels.
    The in-spec index maps take any number of grid dims and read only
    the first (time-tile) index, so the stacked (time, plane) grid
    reuses them -- equal indices across the plane sub-steps mean the
    pipeline fetches each block once per time tile."""
    t, fl = frames.shape
    use_mel = n_mels > 0
    bins = nfft // 2 + 1
    freq_out = (n_mels - 1) if use_mel else nfft // 2
    if t % block_t:
        raise ValueError(f"T_pad={t} not divisible by block_t={block_t}")
    if not use_mel and freq_out % 128:
        raise ValueError(f"nfft//2={freq_out} must be a lane multiple")
    fl_pad = ((fl + 127) // 128) * 128
    cos_m, sin_m = dft_matrices(fl, nfft)          # [fl, bins]
    # Non-mel: the GEMM covers exactly the freq_out lane-aligned
    # columns; the Nyquist column (col freq_out, which the freq diffs
    # read) rides the VPU rank-1 dot (ny operand) instead of forcing
    # the GEMM to 128 more padded lanes (_make_logspec docstring).
    nb = freq_out if not use_mel else bins
    b_pad = ((nb + 127) // 128) * 128
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
        ny_p = jnp.zeros((8, fl_pad), jnp.float32)  # unused dummy
    else:
        mel_p = jnp.zeros((8, 128), jnp.float32)   # unused dummy operand
        spec_cols = freq_out + 128                 # + the Nyquist column
        ny_p = (
            jnp.zeros((8, fl_pad), jnp.float32)
            .at[0, :fl].set(cos_m[:, freq_out])
            .at[1, :fl].set(sin_m[:, freq_out])
        )
    frames_p = jnp.zeros((t, fl_pad), jnp.float32).at[:, :fl].set(
        frames.astype(jnp.float32)
    )
    n_t = t // block_t
    in_specs = [
        pl.BlockSpec((block_t, fl_pad), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, fl_pad),
                     lambda i, *_, _n=n_t: (jnp.minimum(i + 1, _n - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((fl_pad, b_pad), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((fl_pad, b_pad), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mel_p.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, fl_pad), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return (frames_p, cos_p, sin_p, mel_p, ny_p, freq_out, spec_cols,
            in_specs, n_t)


def _cost(t, fl_pad, b_pad, spec_cols, freq_out, use_mel, frames_size):
    return pl.CostEstimate(
        flops=int(4 * t * fl_pad * b_pad)
        + (int(2 * t * b_pad * spec_cols) if use_mel else 0),
        bytes_accessed=int(frames_size * 8 + 4 * t * freq_out * 4),
        transcendentals=int(t * spec_cols),
    )


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
