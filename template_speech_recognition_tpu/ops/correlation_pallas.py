"""Pallas TPU kernel for the sliding-window LLR correlation.

The hot kernel of the whole framework (SURVEY.md section 3.2;
BASELINE.json:5 "batched sliding-window log-likelihood
cross-correlation kernel (templates x time)").

    scores[k, t] = sum_tau sum_d  F[t + tau, d] * W[k, tau, d]  + c[k]

Design (MXU-first):

* Grid (K/bk, T/bt, D/dc); the D axis is innermost so each [bk, bt]
  output tile is revisited consecutively and accumulates in place
  (float32) while W/feature tiles stream through VMEM double-buffered
  by the Pallas pipeline.
* The tau loop runs inside the kernel: L matmuls of
  [bk, dc] @ [dc, bt] hit the MXU back to back with bf16 inputs and
  f32 accumulation.
* Overlapping windows (a t-tile reads bt + L - 1 feature rows) are
  expressed by passing the feature array twice with block indices
  (t, t+1): the kernel concatenates two adjacent [bt, dc] tiles and
  slides within them.  Requires L - 1 <= bt.

Tail contract: the last L - 1 window starts of the final t-tile read
the clamped (duplicated) last block instead of zero padding -- exactly
the window starts that overrun the utterance, which callers already
mask via ``detect.masked_scores``.  Valid region: t < T - L + 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(f0_ref, f1_ref, w_ref, c_ref, out_ref, fcat_ref, length: int):
    d_idx = pl.program_id(2)

    @pl.when(d_idx == 0)
    def _init():
        out_ref[:, :] = jnp.broadcast_to(
            c_ref[0, :].astype(jnp.float32)[:, None], out_ref.shape
        )

    bt = f0_ref.shape[0]
    fcat_ref[0:bt, :] = f0_ref[:, :]
    fcat_ref[bt : 2 * bt, :] = f1_ref[:, :]

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for tau in range(length):  # static unroll: offsets known to Mosaic
        acc += jax.lax.dot_general(
            w_ref[:, tau, :],                                         # [bk, dc]
            fcat_ref[tau : tau + bt, :],                              # [bt, dc]
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:, :] += acc


@functools.partial(
    jax.jit, static_argnames=("block_k", "block_t", "block_d", "interpret")
)
def correlation_scores_pallas(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    block_k: int = 128,
    block_t: int = 128,
    block_d: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """feats [T, D] x W [K, L, D] + c [K] -> scores [K, T] (see module
    docstring for the tail contract).

    Shape contract: T % block_t == 0, K % block_k == 0,
    D % block_d == 0, L - 1 <= block_t.  Inputs any float dtype
    (bf16 recommended); output float32.  ``block_d`` defaults by dtype
    so the double-buffered W tile fits VMEM (16 MB).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t, d = feats.shape
    k, length = w.shape[0], w.shape[1]
    if block_d is None:
        block_d = 512 if w.dtype.itemsize <= 2 else 256
    if t % block_t or k % block_k or d % block_d:
        raise ValueError(f"shape ({t},{d},{k}) not divisible by blocks")
    if length - 1 > block_t:
        raise ValueError(f"template length {length} > block_t + 1")
    n_t = t // block_t
    grid = (k // block_k, n_t, d // block_d)

    flops = 2 * k * t * length * d
    bytes_accessed = (
        feats.size * feats.dtype.itemsize * 2
        + w.size * w.dtype.itemsize * (t // block_t)
        + k * t * 4
    )
    return pl.pallas_call(
        functools.partial(_kernel, length=length),
        out_shape=jax.ShapeDtypeStruct((k, t), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_t, block_d), lambda i, j, l: (j, l), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_t, block_d),
                lambda i, j, l, _nt=n_t: (jnp.minimum(j + 1, _nt - 1), l),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_k, length, block_d),
                lambda i, j, l: (i, 0, l),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k), lambda i, j, l: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_k, block_t), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2 * block_t, block_d), feats.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
        interpret=interpret,
    )(feats, feats, w, c.reshape(1, k))


def correlation_scores_reference(feats, w, c):
    """jnp twin with the same [K, T] layout + tail contract (clamped
    duplicate tail blocks are NOT reproduced -- only the valid region
    t < T - L + 1 is comparable)."""
    t, d = feats.shape
    k, length = w.shape[0], w.shape[1]
    lhs = feats.astype(jnp.float32).T[None]
    rhs = jnp.swapaxes(w.astype(jnp.float32), 1, 2)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1,), [(0, length - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[0] + c.astype(jnp.float32)[:, None]
