"""Pallas TPU kernel: fused per-bin complex bank matmul for the
frequency-domain scorer (``detect.fft_scorer``).

Replaces three XLA passes with one kernel:

  * the [Xr|Xi] / [Xi|-Xr] pack (a 474 MB HBM round trip at the bench
    shape) is assembled on the fly in VMEM from the loaded xr/xi tiles;
  * the per-bin batched GEMM  [2m, 2D] @ [2D, K]  accumulates in a VMEM
    f32 scratch across D chunks;
  * the yr/yi split+concat for the inverse DFT: the output is written
    directly in the (part, bin)-major layout [2, bins, m, K] the iDFT
    GEMM consumes.

Grid (bins, 2D/dc), D-chunk innermost so each [2m, K] accumulator is
revisited consecutively while xr/xi/w2 tiles stream double-buffered.
The W2 spectra stream exactly once; xr/xi stream twice (once per half
of the 2D contraction).

Shape contract: m % 8 == 0, K % 128 == 0, D % dc == 0 (callers pad).
With the 4-D input layout [bins, B, nblk, D] the kernel reshapes each
(B, nblk, dc) block to (m, dc) in VMEM, which is layout-trivial only
when B == 1 or nblk % 8 == 0 -- ``detect.fft_scorer`` gates the 4-D
path on exactly that and reshapes to 3-D otherwise.  bins need not be
lane-aligned (the grid walks bins one at a time); ``pick_nfft``
chooses nfft = hop + L - 1 with hop 16-aligned (159 -> bins = 80 at
L = 32), and parity of nfft is handled by the Nyquist weight in
``_idft_mats`` -- the DFT here is a GEMM, not an FFT, so nfft need
not be composite or even.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, w2_ref, out_ref, acc_ref, *, nd: int, m: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    first_half = c < nd
    dc = xr_ref.shape[-1]
    xr_t = xr_ref[0].reshape(m, dc)        # [m, dc] (4-D input: [B,nblk,dc])
    xi_t = xi_ref[0].reshape(m, dc)

    # rows 0:m  = Xr (first half of 2D) | Xi (second half)   -> yr
    # rows m:2m = Xi (first half)       | -Xr (second half)  -> yi
    # (pl.when branches, not a tile-select: Mosaic rejects jnp.where
    # on some tile shapes and the select would burn VPU cycles anyway)
    def accumulate(top, bot):
        x_t = jnp.concatenate([top, bot], axis=0)          # [2m, dc]
        acc_ref[:, :] += jax.lax.dot_general(
            x_t,
            w2_ref[0],                                      # [dc, K]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_half)
    def _first():
        accumulate(xr_t, xi_t)

    @pl.when(jnp.logical_not(first_half))
    def _second():
        accumulate(xi_t, -xr_t)

    @pl.when(c == pl.num_programs(1) - 1)
    def _flush():
        out_ref[:, 0, :, :] = (
            acc_ref[:, :].reshape(2, m, out_ref.shape[-1])
        ).astype(out_ref.dtype)


def _kernel_q(xr_ref, xi_ref, w2_ref, sc_ref, out_ref, acc_ref,
              *, nd: int, m: int):
    """int8 variant: int8 x int8 -> int32 accumulation on the MXU
    (2x the bf16 rate and half the W2 stream), dequantized at flush by
    the per-(bin, template) combined scale sc = sx[bin] * sw[bin, k]."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    first_half = c < nd
    dc = xr_ref.shape[-1]
    xr_t = xr_ref[0].reshape(m, dc)
    xi_t = xi_ref[0].reshape(m, dc)

    def accumulate(top, bot):
        x_t = jnp.concatenate([top, bot], axis=0)          # [2m, dc] int8
        acc_ref[:, :] += jax.lax.dot_general(
            x_t,
            w2_ref[0],                                      # [dc, K] int8
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(first_half)
    def _first():
        accumulate(xr_t, xi_t)

    @pl.when(jnp.logical_not(first_half))
    def _second():
        accumulate(xi_t, -xr_t)

    @pl.when(c == pl.num_programs(1) - 1)
    def _flush():
        y = acc_ref[:, :].astype(jnp.float32) * sc_ref[0, 0][None, :]
        out_ref[:, 0, :, :] = (
            y.reshape(2, m, out_ref.shape[-1])
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dc", "interpret", "vmem_limit")
)
def fft_binmm_pallas(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    w2: jnp.ndarray,
    sc: jnp.ndarray | None = None,
    dc: int = 512,
    interpret: bool | None = None,
    vmem_limit: int | None = 100 * 1024 * 1024,
) -> jnp.ndarray:
    """xr, xi [bins, m, D] or [bins, B, nblk, D] (the forward-DFT
    kernel's native 4-D layout -- no reshape between the two pallas
    calls) x W2 [bins, 2D, K] -> y [2, bins, m, K] (bf16), where
    y[0] = Xr Wr + Xi Wi (real part of Xf * conj(Wf)) and
    y[1] = Xi Wr - Xr Wi (imag part), per frequency bin.

    int8 mode (round-4 verdict, weak item 4 -- the K=10k spectra
    stream): pass int8 xr/xi/w2 plus ``sc`` [bins, K] f32, the
    combined dequantization scale; the GEMM runs int8 x int8 -> int32
    on the MXU and the flush multiplies by sc, emitting bf16."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    quant = sc is not None
    if quant and (xr.dtype != jnp.int8 or w2.dtype != jnp.int8):
        raise ValueError("sc given but inputs are not int8")
    if xr.ndim == 4:
        bins, nb, nblk, d = xr.shape
        m = nb * nblk
        in_block = (1, nb, nblk, dc)
    else:
        bins, m, d = xr.shape
        in_block = (1, m, dc)
    k = w2.shape[-1]
    if w2.shape != (bins, 2 * d, k):
        raise ValueError(f"w2 {w2.shape} != ({bins}, {2*d}, {k})")
    if m % 8 or k % 128 or d % dc:
        raise ValueError(f"bad tile alignment: m={m} k={k} d={d} dc={dc}")
    nd = d // dc
    grid = (bins, 2 * nd)
    if len(in_block) == 4:
        def x_index(f, c, _nd=nd):
            return (f, 0, 0, jnp.where(c < _nd, c, c - _nd))
    else:
        def x_index(f, c, _nd=nd):
            return (f, 0, jnp.where(c < _nd, c, c - _nd))

    flops = 2 * bins * 2 * m * 2 * d * k
    bytes_accessed = (
        2 * (xr.size + xi.size) * xr.dtype.itemsize
        + w2.size * w2.dtype.itemsize
        + 2 * bins * m * k * 2
    )
    in_specs = [
        pl.BlockSpec(in_block, x_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(in_block, x_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, dc, k), lambda f, c: (f, c, 0), memory_space=pltpu.VMEM
        ),
    ]
    if quant:
        # Mosaic wants the block's second-minor dim 8-aligned: carry
        # the per-bin scale row as an 8-row broadcast (tiny)
        in_specs.append(
            pl.BlockSpec((1, 8, k), lambda f, c: (f, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        kernel = functools.partial(_kernel_q, nd=nd, m=m)
        out_dtype = jnp.bfloat16
        acc_dtype = jnp.int32
        sc8 = jnp.broadcast_to(
            sc.astype(jnp.float32)[:, None, :], (bins, 8, k)
        )
        operands = (xr, xi, w2, sc8)
    else:
        kernel = functools.partial(_kernel, nd=nd, m=m)
        out_dtype = xr.dtype
        acc_dtype = jnp.float32
        operands = (xr, xi, w2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, bins, m, k), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, 1, m, k), lambda f, c: (0, f, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2 * m, k), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*operands)
