"""Pallas TPU kernel: fused binarize + freq-spread epilogue of the
plane-major frontend (``frontend.planes.binarize_spread_flat``).

In XLA the epilogue re-streams intermediates (plane compares, the
pre-spread flat map, each masked OR-shift) for ~2.2x the compulsory
traffic (1.21 ms at the bench shape).  Here one kernel instance per
(utterance, plane, time-block) reads its [Tb, F] plane tile once and
writes the two finished channels [Tb, 2F] (pos | neg polarity)
directly into the channel-major flat map:

* threshold compares against the two scalar order statistics
  (SMEM), with the row-validity mask built from an in-kernel iota;
* FREQ dilation as in-register lane shifts -- the zero fill at the
  plane's own f-edges IS the channel-boundary masking, since each
  polarity is dilated before entering the flat map;
* TIME dilation is left to the caller (a cross-row halo across
  time-block boundaries is not worth the tile plumbing: it is 2r
  OR-shift passes over a [B, T, D] u8 map in XLA, ~0.06 ms/pass).

Dilation-order note: rectangle dilation is separable and
order-independent under zero padding, so freq-inside / time-outside
equals the classic time-then-freq ``ops.edges.spread_binary`` exactly
(parity: tests/test_planes_frontend.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(plane_ref, hi_ref, lo_ref, vf_ref, out_ref, *, rf, f, tb):
    bi = pl.program_id(0)
    pi = pl.program_id(1)
    ti = pl.program_id(2)
    plane = plane_ref[0, 0]                        # [Tb, F] f32
    hi = hi_ref[bi, pi]                            # SMEM scalars
    lo = lo_ref[bi, pi]
    v = vf_ref[bi, 0]
    rows = ti * tb + jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    rv = rows < v                                  # [Tb, 1]
    pos = ((plane > hi) & rv).astype(jnp.uint8)
    neg = ((plane < lo) & rv).astype(jnp.uint8)

    def dil(x):
        out = x
        for s in range(1, rf + 1):
            z = jnp.zeros((tb, s), jnp.uint8)
            out = (
                out
                | jnp.concatenate([z, x[:, : f - s]], 1)
                | jnp.concatenate([x[:, s:], z], 1)
            )
        return out

    if rf:
        pos = dil(pos)
        neg = dil(neg)
    out_ref[0] = jnp.concatenate([pos, neg], 1)    # [Tb, 2F]


@functools.partial(
    jax.jit, static_argnames=("spread_freq", "block_t", "interpret")
)
def binarize_freqspread_pallas(
    planes: jnp.ndarray,        # [B, P, T, F] f32 (T % 128 == 0)
    os_hi: jnp.ndarray,         # [B, P] f32 rank-k order statistic
    os_lo: jnp.ndarray,         # [B, P] f32 rank-(n-1-k) statistic
    valid_frames: jnp.ndarray,  # [B] int32
    spread_freq: int,
    block_t: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:               # [B, T, 2P*F] uint8 flat map
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, p, t, f = planes.shape
    if t % block_t:
        raise ValueError(f"T={t} not a multiple of block_t={block_t}")
    vf = valid_frames.astype(jnp.int32).reshape(b, 1)
    return pl.pallas_call(
        functools.partial(_kernel, rf=spread_freq, f=f, tb=block_t),
        grid=(b, p, t // block_t),
        in_specs=[
            pl.BlockSpec((1, 1, block_t, f), lambda bi, pi, ti: (bi, pi, ti, 0)),
            pl.BlockSpec((b, p), lambda bi, pi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, p), lambda bi, pi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda bi, pi, ti: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, 2 * f), lambda bi, pi, ti: (bi, ti, pi)),
        out_shape=jax.ShapeDtypeStruct((b, t, 2 * p * f), jnp.uint8),
        interpret=interpret,
    )(planes, os_hi, os_lo, vf)
