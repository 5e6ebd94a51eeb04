"""Ring schedule + all_to_all reshard (SURVEY.md section 2c, rows
"Ring attention (analog)" and "Ulysses (analog)").

Two memory-frugal alternatives to ``score_sharded.sharded_bank_scores``
(which replicates each time shard across the bank axis):

* **Ring** (``ring_bank_scores``): the time axis is sharded over the
  COMBINED (bank, time) mesh axes -- each device holds 1/(nb*nt) of
  the frames.  nb ring steps rotate the feature chunks around the bank
  axis (``lax.ppermute`` neighbor exchange, the ring-attention comm
  pattern); each chip scores its resident bank shard against every
  chunk as it passes through.  Peak feature HBM per chip drops nb x
  versus the replicated layout, at the cost of nb - 1 chunk rotations
  that overlap with scoring.

* **Ulysses-style reshard** (``channel_parallel_scores``): a single
  ``lax.all_to_all`` along the bank axis converts time-sharding into
  channel (F*E) sharding -- the workload's analog of sequence->head
  resharding.  Scoring then runs with every template resident but only
  D/nb channels, and partial scores ``psum`` over the bank axis.

Both return bit-identical scores to the replicated layout (tested on
the fake 8-device CPU mesh, SURVEY.md section 4 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from template_speech_recognition_tpu.parallel.score_sharded import _conv_scores


@functools.partial(
    jax.jit, static_argnames=("mesh", "precision", "compute_dtype")
)
def ring_bank_scores(
    feats: jnp.ndarray,        # [B, T, F, E]
    w: jnp.ndarray,            # [K, L, F, E]
    c: jnp.ndarray,            # [K]
    mesh: Mesh,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:              # [B, K, T] sharded (data, bank, time)
    """Bank x time ring scoring.

    Layout: T splits into nt contiguous spans (time axis), each span
    into nb subchunks (bank axis).  Device (b, t) starts with subchunk
    b of span t plus its L-1 right halo; nb ring steps rotate
    (subchunk + halo) to bank-neighbor b-1 so step s scores subchunk
    (b + s) mod nb.  Scores accumulate into the device's [K_l, T/nt]
    output slice, so the result is plainly (data, bank, time)-sharded.
    Requires T % (nb * nt) == 0 and subchunk length >= L - 1.
    """
    b_, t_ = feats.shape[0], feats.shape[1]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
    nb = mesh.shape["bank"]
    nt = mesh.shape["time"]
    if t_ % (nb * nt):
        raise ValueError(f"T={t_} not divisible by bank*time={nb * nt}")
    chunk = t_ // (nb * nt)
    if chunk < length - 1:
        raise ValueError(f"subchunk {chunk} < template halo {length - 1}")
    feats_flat = feats.reshape(b_, t_, d).astype(compute_dtype)
    w_flat = w.reshape(k, length, d).astype(compute_dtype)

    def body(feats_l, w_l, c_l):
        # feats_l [B_l, chunk, D] = subchunk (bank b, span t);
        # w_l [K_l, L, D]; c_l [K_l].
        halo_src = feats_l[:, : length - 1, :]
        # Halo = first L-1 frames of the successor subchunk:
        #   (b, t) <- (b+1, t)            for b < nb-1
        #   (nb-1, t) <- (0, t+1)         across spans, zeros at the end.
        if nb > 1:
            halo_in = lax.ppermute(
                halo_src, "bank", [(i, i - 1) for i in range(1, nb)]
            )
        else:
            halo_in = jnp.zeros_like(halo_src)
        if nt > 1:
            next_span = lax.ppermute(
                halo_src, "time", [(i, i - 1) for i in range(1, nt)]
            )
        else:
            next_span = jnp.zeros_like(halo_src)
        if nb > 1:
            # Move span-successor halos (valid on b=0) to b=nb-1.
            wrap = lax.ppermute(next_span, "bank", [(0, nb - 1)])
        else:
            wrap = next_span
        b_idx = lax.axis_index("bank")
        halo = jnp.where(b_idx == nb - 1, wrap, halo_in)
        block = jnp.concatenate([feats_l, halo], axis=1)  # [B_l, chunk+L-1, D]

        out = jnp.zeros(
            (feats_l.shape[0], w_l.shape[0], nb * chunk), jnp.float32
        )

        def ring_step(s, carry):
            blk, acc = carry
            scores = jax.vmap(
                lambda f: _conv_scores(f, w_l, c_l, precision)[:, :chunk]
            )(blk)                                         # [B_l, K_l, chunk]
            j = (b_idx + s) % nb                           # subchunk slot
            acc = lax.dynamic_update_slice(
                acc, scores, (0, 0, j * chunk)
            )
            # Rotate to bank-neighbor b-1 so next step holds b+s+1.
            if nb > 1:
                blk = lax.ppermute(
                    blk, "bank", [(i, (i - 1) % nb) for i in range(nb)]
                )
            return blk, acc

        _, out = lax.fori_loop(0, nb, ring_step, (block, out))
        return out

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("data", ("time", "bank"), None),
            P("bank", None, None),
            P("bank"),
        ),
        out_specs=P("data", "bank", "time"),
        check_vma=False,
    )
    return fn(feats_flat, w_flat, c)


@functools.partial(
    jax.jit, static_argnames=("mesh", "precision", "compute_dtype")
)
def channel_parallel_scores(
    feats: jnp.ndarray,        # [B, T, F, E]
    w: jnp.ndarray,            # [K, L, F, E]
    c: jnp.ndarray,            # [K]
    mesh: Mesh,
    precision: lax.Precision = lax.Precision.HIGHEST,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:              # [B, K, T] sharded (data, None, time)
    """Ulysses-style phase switch: frontend output arrives time-sharded
    over the combined (time, bank) axes; one ``all_to_all`` along
    "bank" re-shards it to (time over "time") x (channels over "bank"),
    then scoring runs partial-channel convs + one ``psum("bank")``.

    The bias c is added once (on bank rank 0's partial) so the psum
    reconstructs exactly one copy.  Requires D % nb == 0 and
    T % (nb * nt) == 0.
    """
    b_, t_ = feats.shape[0], feats.shape[1]
    k, length = w.shape[0], w.shape[1]
    d = w.shape[2] * w.shape[3]
    nb = mesh.shape["bank"]
    nt = mesh.shape["time"]
    if d % nb or t_ % (nb * nt):
        raise ValueError(f"D={d} or T={t_} not divisible by mesh axes")
    feats_flat = feats.reshape(b_, t_, d).astype(compute_dtype)
    w_flat = w.reshape(k, length, d).astype(compute_dtype)

    def body(feats_l, w_l, c_l):
        # feats_l [B_l, T/(nt*nb), D] -> all_to_all -> [B_l, T/nt, D/nb]
        x = lax.all_to_all(
            feats_l, "bank", split_axis=2, concat_axis=1, tiled=True
        )
        b_idx = lax.axis_index("bank")
        d_l = x.shape[2]
        w_chan = lax.dynamic_slice_in_dim(w_l, b_idx * d_l, d_l, axis=2)
        c_part = jnp.where(b_idx == 0, c_l, jnp.zeros_like(c_l))
        # Halo along the time axis (same exchange as sharded_bank_scores).
        halo = x[:, : length - 1, :]
        if nt > 1:
            halo = lax.ppermute(
                halo, "time", [(i, i - 1) for i in range(1, nt)]
            )
        else:
            halo = jnp.zeros_like(halo)
        x_ext = jnp.concatenate([x, halo], axis=1)
        partial = jax.vmap(
            lambda f: _conv_scores(f, w_chan, c_part, precision)[:, : x.shape[1]]
        )(x_ext)                                           # [B_l, K, T/nt]
        return lax.psum(partial, "bank")

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("data", ("time", "bank"), None),
            P(None, None, None),
            P(None),
        ),
        out_specs=P("data", None, "time"),
        check_vma=False,
    )
    return fn(feats_flat, w_flat, c)
