"""Vectorized Bernoulli mixture EM (SURVEY.md section 3.1 hot loop #2).

TPU counterpart of ``oracle.mixture.bernoulli_mixture_em``: identical
update equations in float32 (GEMM E-step on the MXU, HIGHEST matmul
precision for parity), compiled as a single ``lax.while_loop`` so the
whole fit is one XLA computation.  Initial responsibilities are an
*input* (shared deterministic initializer lives in the oracle), so
parity never depends on RNG equivalence.

The data mask supports static-shape padding of the exemplar stack and
is also how the data-parallel sharded EM (``parallel.em_sharded``)
drops remainder rows per shard.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_PRECISION = lax.Precision.HIGHEST


class EMState(NamedTuple):
    iteration: jnp.ndarray      # int32, iterations completed
    responsibilities: jnp.ndarray  # [N, K] float32
    means: jnp.ndarray          # [K, D] float32
    weights: jnp.ndarray        # [K] float32
    log_likelihood: jnp.ndarray  # scalar float32, latest mean loglik
    done: jnp.ndarray           # bool, tolerance reached
    history: jnp.ndarray        # [max_iters] float32, NaN-padded


def _log_likelihoods(x, means, log_weights):
    """[N, D] x, [K, D] means -> [N, K] loglik + log w (float32 GEMM)."""
    log_p = jnp.log(means)
    log_1mp = jnp.log1p(-means)
    logit = log_p - log_1mp
    return (
        jnp.matmul(x, logit.T, precision=_PRECISION)
        + jnp.sum(log_1mp, axis=1)[None, :]
        + log_weights[None, :]
    )


def em_step(
    x: jnp.ndarray,
    resp: jnp.ndarray,
    mask: jnp.ndarray,
    eps: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One M-step + E-step. Returns (new_resp, means, weights, mean_ll).

    Update equations match the oracle exactly (M from current resp,
    then E with the new parameters).  ``mask`` [N] zero-weights padded
    rows everywhere, including the reported mean log-likelihood.
    """
    resp = resp * mask[:, None]
    n_eff = jnp.maximum(jnp.sum(mask), 1.0)
    counts = jnp.sum(resp, axis=0)                               # [K]
    weights = counts / n_eff
    means = jnp.matmul(resp.T, x, precision=_PRECISION) / jnp.maximum(counts, 1e-30)[:, None]
    means = jnp.clip(means, jnp.float32(eps), jnp.float32(1.0 - eps))
    ll = _log_likelihoods(x, means, jnp.log(jnp.maximum(weights, 1e-30)))
    mx = jnp.max(ll, axis=1, keepdims=True)
    p = jnp.exp(ll - mx)
    z = jnp.sum(p, axis=1, keepdims=True)
    new_resp = p / z
    per_row = (jnp.log(z[:, 0]) + mx[:, 0]) * mask
    mean_ll = jnp.sum(per_row) / n_eff
    return new_resp, means, weights, mean_ll


@functools.partial(jax.jit, static_argnames=("num_iters", "eps", "tol"))
def bernoulli_mixture_em(
    x: jnp.ndarray,
    init_resp: jnp.ndarray,
    num_iters: int = 50,
    eps: float = 0.01,
    tol: float = 1e-4,
    mask: jnp.ndarray | None = None,
) -> EMState:
    """Fit a K-component Bernoulli mixture; one compiled while_loop.

    x: [N, D] binary (any dtype); init_resp: [N, K]
    (``oracle.mixture.init_responsibilities``); mask: [N] optional
    row-validity.  Semantics identical to the oracle: stop after
    iteration i>1 whose mean-loglik improvement is < tol, or at
    num_iters.
    """
    x = x.astype(jnp.float32)
    n, k = init_resp.shape
    if mask is None:
        mask = jnp.ones((n,), jnp.float32)
    mask = mask.astype(jnp.float32)

    init = EMState(
        iteration=jnp.int32(0),
        responsibilities=init_resp.astype(jnp.float32),
        means=jnp.zeros((k, x.shape[1]), jnp.float32),
        weights=jnp.full((k,), 1.0 / k, jnp.float32),
        log_likelihood=jnp.float32(-jnp.inf),
        done=jnp.bool_(False),
        history=jnp.full((num_iters,), jnp.nan, jnp.float32),
    )

    def cond(s: EMState):
        return (s.iteration < num_iters) & (~s.done)

    def body(s: EMState) -> EMState:
        it = s.iteration + 1
        new_resp, means, weights, mean_ll = em_step(x, s.responsibilities, mask, eps)
        improvement = mean_ll - s.log_likelihood
        done = (improvement < tol) & (it > 1)
        history = s.history.at[it - 1].set(mean_ll)
        return EMState(it, new_resp, means, weights, mean_ll, done, history)

    return lax.while_loop(cond, body, init)


@functools.partial(jax.jit, static_argnames=("num_iters", "eps", "tol"))
def bernoulli_mixture_em_restarts(
    x: jnp.ndarray,
    init_resps: jnp.ndarray,      # [R, N, K] stacked restart inits
    num_iters: int = 50,
    eps: float = 0.01,
    tol: float = 1e-4,
    mask: jnp.ndarray | None = None,
) -> tuple[EMState, jnp.ndarray]:
    """Multi-restart EM (SURVEY.md section 2a mixture row "restarts"):
    every restart's full fit runs as one vmapped while_loop (all
    restarts advance in lockstep on device -- R more rows in the same
    GEMMs, not R sequential fits), then the restart with the highest
    final mean log-likelihood wins; ties break to the lowest restart
    index, matching ``oracle.mixture.bernoulli_mixture_em_restarts``.

    Returns (winning EMState, winning restart index int32).
    """
    states = jax.vmap(
        lambda r: bernoulli_mixture_em.__wrapped__(
            x, r, num_iters=num_iters, eps=eps, tol=tol, mask=mask
        )
    )(init_resps.astype(jnp.float32))
    best = jnp.argmax(states.log_likelihood).astype(jnp.int32)
    return jax.tree.map(lambda a: a[best], states), best
