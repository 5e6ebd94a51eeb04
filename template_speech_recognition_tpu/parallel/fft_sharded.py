"""Sharded frequency-domain bank scoring: data x bank x time.

The production fast path (``detect.fft_scorer``) under the same mesh
contract as ``parallel.score_sharded``:

  * utterance batches data-parallel over the ``data`` axis;
  * the template SPECTRA bank W2 [bins, 2D, K] sharded over K on the
    ``bank`` axis -- each chip scores only its K-shard, no gather of
    the bank ever happens (the spectra are ~4x the time-domain filters,
    so bank sharding matters sooner here);
  * long audio sharded over the ``time`` axis with the same L-1-frame
    right-neighbor halo ``ppermute`` as the conv path -- each shard
    then runs overlap-save locally on its halo-extended frames, which
    yields exactly its T_l window starts.

When each time shard's length is a multiple of the overlap-save hop,
the local block decomposition coincides with the unsharded one and
every window's dot products see identical operands (sharded matches
unsharded to the last ulp; GEMM tiling may still split reductions
differently, so exact bit equality is not guaranteed); for other
lengths the block boundaries differ and scores agree to accumulation
order.  Bit-parity detection decisions stay on the int32 direct path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from template_speech_recognition_tpu.detect.fft_scorer import (
    FFTBank,
    fft_sliding_scores,
)


@functools.partial(jax.jit, static_argnames=("mesh", "use_pallas"))
def sharded_fft_bank_scores(
    feats: jnp.ndarray,
    bank: FFTBank,
    mesh: Mesh,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """feats [B, T, F, E] x FFTBank -> scores [B, K, T].

    Sharding: feats (data, time) over (B, T); bank.w2 over K; output
    (data, bank, time).  Entries at window starts > T - L are the
    zero-padded tail (mask downstream with ``detect.masked_scores``).
    B, T, K must divide their mesh axes.
    """
    b, t = feats.shape[0], feats.shape[1]
    d = bank.d
    length, nfft = bank.length, bank.nfft
    x = feats.reshape(b, t, d)

    def body(x_l, w2_l, c_l):
        # x_l [B_l, T_l, D]; w2_l [bins, 2D, K_l]; c_l [K_l]
        n_time = lax.axis_size("time")
        halo = x_l[:, : length - 1, :]
        if n_time > 1:
            # shard i receives shard i+1's first L-1 frames; the last
            # shard receives zeros (no (src -> last) pair in perm),
            # matching the unsharded zero-padded tail.
            perm = [(i, i - 1) for i in range(1, n_time)]
            halo = lax.ppermute(halo, "time", perm)
        else:
            halo = jnp.zeros_like(halo)
        x_ext = jnp.concatenate([x_l, halo], axis=1)   # [B_l, T_l+L-1, D]
        bank_l = FFTBank(
            w2=w2_l, c=c_l, length=length, nfft=nfft, d=d
        )
        # tout of the halo-extended input == T_l exactly
        return fft_sliding_scores(x_ext, bank_l, use_pallas=use_pallas)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("data", "time", None),
            P(None, None, "bank"),
            P("bank"),
        ),
        out_specs=P("data", "bank", "time"),
        check_vma=False,
    )
    return fn(x, bank.w2, bank.c)
