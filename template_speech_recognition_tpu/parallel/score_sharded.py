"""Sharded bank scoring: data x bank x time with halo exchange.

SURVEY.md section 2c: utterance batches are data-parallel, the
template bank shards across chips when it exceeds one chip's HBM
(config 5, BASELINE.json:11), and long audio shards across the time
axis.  A window starting in time-shard i reaches up to L-1 frames into
shard i+1, so each shard receives a halo of its right neighbor's first
L-1 frames via a single ring ``lax.ppermute`` -- the workload's analog
of context/sequence parallelism (SURVEY.md section 5 "long-context"
row).  Devices with no right neighbor receive zeros from ppermute,
which exactly matches the zero-padded tail of the unsharded reference,
so sharded == unsharded *bitwise* (tested; SURVEY.md section 4 item
4c).

Layout contract: T and K must divide by the respective mesh axis
sizes (pad the bank / bucket the audio first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_DN = ("NCH", "OIH", "NCH")


def _conv_scores(feats_flat, w_flat, c, precision):
    """feats [T, D], w [K, L, D], c [K] -> [K, T] (tail zero-padded)."""
    t, d = feats_flat.shape
    k, length = w_flat.shape[0], w_flat.shape[1]
    lhs = feats_flat.T[None]                                    # [1, D, T]
    rhs = jnp.swapaxes(w_flat, 1, 2)                            # [K, D, L]
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(0, length - 1)],
        dimension_numbers=_DN,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out[0] + c.astype(jnp.float32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("mesh", "precision", "compute_dtype")
)
def sharded_bank_scores(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    mesh: Mesh,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Batched sharded scoring.

    feats: [B, T, F, E]  -> sharded (data, time) over (B, T)
    w:     [K, L, F, E]  -> sharded (bank) over K
    c:     [K]
    Returns scores [B, K, T] sharded (data, bank, time); entries at
    window starts > T - L are the zero-padded tail (mask downstream
    with ``detect.masked_scores``).
    """
    b, t = feats.shape[0], feats.shape[1]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
    feats_flat = feats.reshape(b, t, d).astype(compute_dtype)
    w_flat = w.reshape(k, length, d).astype(compute_dtype)

    def body(feats_l, w_l, c_l):
        # feats_l [B_l, T_l, D]; w_l [K_l, L, D]; c_l [K_l]
        n_time = lax.axis_size("time")
        halo = feats_l[:, : length - 1, :]
        if n_time > 1:
            # Shard i receives shard i+1's first L-1 frames; the last
            # shard receives zeros (no (src -> last) pair in perm).
            perm = [(i, i - 1) for i in range(1, n_time)]
            halo = lax.ppermute(halo, "time", perm)
        else:
            halo = jnp.zeros_like(halo)
        feats_ext = jnp.concatenate([feats_l, halo], axis=1)     # [B_l, T_l+L-1, D]

        def one(f):
            return _conv_scores(f, w_l, c_l, precision)[:, : feats_l.shape[1]]

        return jax.vmap(one)(feats_ext)                          # [B_l, K_l, T_l]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", "time", None), P("bank", None, None), P("bank")),
        out_specs=P("data", "bank", "time"),
        check_vma=False,
    )
    return fn(feats_flat, w_flat, c)


@functools.partial(jax.jit, static_argnames=("precision", "compute_dtype"))
def padded_scores_reference(
    feats: jnp.ndarray,
    w: jnp.ndarray,
    c: jnp.ndarray,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Unsharded twin of ``sharded_bank_scores`` (same [B, K, T] layout,
    zero-padded tail); the exactness oracle for the halo test."""
    b, t = feats.shape[0], feats.shape[1]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
    feats_flat = feats.reshape(b, t, d).astype(compute_dtype)
    w_flat = w.reshape(k, length, d).astype(compute_dtype)
    return jax.vmap(lambda f: _conv_scores(f, w_flat, c, precision))(feats_flat)
