"""Feature-layout conversions: channels-minor <-> channel-major flat.

The classic feature map is [.., T, F', E] (oracle layout, used for
template estimation, parts coding, and parity tests).  The production
frontend (``frontend.planes``) emits the FLAT channel-major layout
[.., T, D] with d = e*F' + f, whose trailing-dims (T, D) tiling keeps
every vector op at full lane occupancy (the [.., F', 8] layout tiles
(F', 8) and wastes 15/16 of each (8, 128) tile).

Scoring contracts features against filters over D, so the only
correctness requirement is that BOTH sides flatten in the same order:
use ``filters_to_flat`` for every w/template flattening that will meet
a flat feature map.  All conversions are exact relayouts (pure
transposes); mixing layouts across a contraction is a silent
wrong-answer bug, which the oracle-parity tests would catch.
"""

from __future__ import annotations

import jax.numpy as jnp


def channels_to_flat(binary: jnp.ndarray) -> jnp.ndarray:
    """[.., T, F', E] -> [.., T, E*F'] with d = e*F' + f."""
    x = jnp.moveaxis(binary, -1, -2)                 # [.., T, E, F']
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def flat_to_channels(flat: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[.., T, E*F'] -> [.., T, F', E]."""
    e = flat.shape[-1] // num_freqs
    x = flat.reshape(flat.shape[:-1] + (e, num_freqs))
    return jnp.moveaxis(x, -2, -1)


def filters_to_flat(w: jnp.ndarray) -> jnp.ndarray:
    """[.., L, F', E] filter/template stacks -> [.., L, E*F'].

    The filter-side twin of ``channels_to_flat``: contractions of
    flat features against filters flattened here compute the same
    multiset of products as the [F', E]-ordered contraction -- exactly
    equal for integer scorers, ulp-level (summation order) for float
    GEMMs.  Every path that scores flat features must flatten its
    filters here, never with a bare reshape.
    """
    x = jnp.swapaxes(w, -1, -2)                      # [.., L, E, F']
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
