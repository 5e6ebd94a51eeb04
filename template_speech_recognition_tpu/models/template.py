"""Exemplar registration and Bernoulli template / background estimation.

TPU counterpart of ``oracle.template`` (SURVEY.md section 1 row L2).
Registration uses the same integer nearest-neighbor index map
``src_row(i) = floor(i * L_i / L_target)`` so registered stacks are
bit-identical to the oracle's; estimation is a masked mean, vectorized
over the whole exemplar stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("template_length",))
def register_exemplars(
    exemplars: jnp.ndarray,
    lengths: jnp.ndarray,
    template_length: int,
) -> jnp.ndarray:
    """Padded exemplars [N, Lmax, F, E] + lengths [N] -> [N, L, F, E].

    Uniform time resampling by exact integer index mapping (no
    interpolation arithmetic => bit-reproducible).
    """

    def one(ex, ln):
        i = jnp.arange(template_length, dtype=jnp.int32)
        src = jnp.minimum((i * ln) // template_length, ln - 1)
        return jnp.take(ex, src, axis=0)

    return jax.vmap(one)(exemplars, lengths.astype(jnp.int32))


@jax.jit
def estimate_template(stack: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    """[N, L, F, E] binary stack -> clipped mean template, float32."""
    mean = jnp.mean(stack.astype(jnp.float32), axis=0)
    return jnp.clip(mean, jnp.float32(eps), jnp.float32(1.0 - eps))


@jax.jit
def estimate_background(
    binary_maps: jnp.ndarray,
    valid_frames: jnp.ndarray,
    eps: float = 0.01,
) -> jnp.ndarray:
    """Occurrence frequency over background spans.

    binary_maps: [B, T', F, E] (padded rows already False);
    valid_frames: [B].  Returns q [F, E] float32 in [eps, 1-eps].
    """
    total = jnp.sum(binary_maps.astype(jnp.float32), axis=(0, 1))
    count = jnp.maximum(jnp.sum(valid_frames.astype(jnp.float32)), 1.0)
    q = total / count
    return jnp.clip(q, jnp.float32(eps), jnp.float32(1.0 - eps))
