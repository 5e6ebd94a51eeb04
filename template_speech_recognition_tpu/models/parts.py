"""Parts-based feature coding (SURVEY.md section 1 row L5).

The reference learns a dictionary of small binary patches ("parts") by
Bernoulli-mixture EM over random crops of edge maps, then re-codes
utterances as part-indicator maps (oracle: ``oracle.parts``).  The
coding step's per-location Bernoulli log-likelihood

    ll[t, f, j] = sum_{dt,df,e} logit_j[dt,df,e] * X[t+dt, f+df, e]
                  + offset_j

is exactly a 2-D valid cross-correlation with J output channels -- on
TPU one ``lax.conv_general_dilated`` that lowers onto the MXU, instead
of the oracle's per-location loop.  Learning reuses the jitted
while-loop EM from ``models.mixture``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from template_speech_recognition_tpu.models.mixture import bernoulli_mixture_em

_DN = ("NCHW", "OIHW", "NCHW")


def learn_parts(
    feature_maps: list[np.ndarray],
    num_parts: int,
    patch_time: int = 5,
    patch_freq: int = 5,
    num_patches: int = 2000,
    seed: int = 0,
    num_iters: int = 30,
    eps: float = 0.01,
) -> jnp.ndarray:
    """Learn a part dictionary [num_parts, pt, pf, E] on device.

    Patch sampling is host-side and bit-shared with
    ``oracle.parts.extract_random_patches`` (same RNG stream), so the
    learned dictionaries are comparable; the EM itself runs as the
    jitted device loop.
    """
    from oracle.mixture import init_responsibilities
    from oracle.parts import extract_random_patches

    patches = extract_random_patches(
        feature_maps, patch_time, patch_freq, num_patches, seed
    )
    resp = jnp.asarray(init_responsibilities(patches.shape[0], num_parts, seed + 1))
    state = bernoulli_mixture_em(
        jnp.asarray(patches), resp, num_iters=num_iters, eps=eps
    )
    e = feature_maps[0].shape[2]
    return state.means.reshape(num_parts, patch_time, patch_freq, e)


@functools.partial(jax.jit, static_argnames=("stride_time", "stride_freq"))
def part_logliks(
    feature_map: jnp.ndarray,   # [T, F, E] bool/float
    parts: jnp.ndarray,         # [J, pt, pf, E] float in (0, 1)
    stride_time: int = 1,
    stride_freq: int = 1,
) -> jnp.ndarray:               # [T', F', J] float32
    """Bernoulli log-likelihood of every (strided) patch location under
    every part, as one MXU conv."""
    j = parts.shape[0]
    p = jnp.clip(parts.astype(jnp.float32), 1e-4, 1 - 1e-4)
    logit = jnp.log(p) - jnp.log1p(-p)                      # [J, pt, pf, E]
    offset = jnp.sum(jnp.log1p(-p), axis=(1, 2, 3))         # [J]
    lhs = jnp.transpose(feature_map.astype(jnp.float32), (2, 0, 1))[None]  # [1,E,T,F]
    rhs = jnp.transpose(logit, (0, 3, 1, 2))                # [J, E, pt, pf]
    ll = lax.conv_general_dilated(
        lhs, rhs, (stride_time, stride_freq), "VALID",
        dimension_numbers=_DN,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )[0]                                                    # [J, T', F']
    return jnp.transpose(ll, (1, 2, 0)) + offset[None, None, :]


@functools.partial(jax.jit, static_argnames=("stride_time", "stride_freq"))
def code_parts(
    feature_map: jnp.ndarray,
    parts: jnp.ndarray,
    loglik_threshold: float = -jnp.inf,
    stride_time: int = 1,
    stride_freq: int = 1,
) -> jnp.ndarray:
    """One-hot argmax part per location, gated by ``loglik_threshold``
    (oracle: ``oracle.parts.code_parts``).  Returns [T', F', J] bool."""
    ll = part_logliks.__wrapped__(feature_map, parts, stride_time, stride_freq)
    j = parts.shape[0]
    best = jnp.argmax(ll, axis=-1)
    gate = jnp.max(ll, axis=-1) >= loglik_threshold
    onehot = jax.nn.one_hot(best, j, dtype=jnp.bool_)
    return onehot & gate[..., None]


def code_parts_batch(
    feature_maps: jnp.ndarray,  # [B, T, F, E]
    parts: jnp.ndarray,
    loglik_threshold: float = -jnp.inf,
    stride_time: int = 1,
    stride_freq: int = 1,
) -> jnp.ndarray:
    """vmapped ``code_parts`` over a padded utterance batch."""
    return jax.vmap(
        lambda fm: code_parts(
            fm, parts, loglik_threshold, stride_time, stride_freq
        )
    )(feature_maps)
