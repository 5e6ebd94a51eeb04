"""Sharded Bernoulli-mixture EM (SURVEY.md sections 2c, 3.1).

Two axes compose:

* ``data`` (DP): exemplar rows shard across chips; the M-step's
  sufficient statistics (responsibility column sums and
  responsibility-weighted feature sums) cross the host boundary via a
  single ``psum`` each, after which every chip holds identical means
  -- the classic data-parallel EM.
* ``bank`` (EP): mixture components shard across chips ("components
  as experts").  The E-step's log-sum-exp normalizer is computed with
  a ``pmax`` + ``psum`` pair over the bank axis, so no chip ever
  materializes the full [N, K] responsibility matrix.

The update equations are the same float32 arithmetic as
``models.mixture.em_step``; with a 1x1 mesh the results are bitwise
identical, and sharded vs replicated parity is tested on the fake
8-device CPU mesh (SURVEY.md section 4 item 4b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from template_speech_recognition_tpu.models.mixture import EMState

_PRECISION = lax.Precision.HIGHEST


def _sharded_em_step(x, resp, mask, eps, data_axis, bank_axis):
    """One EM step on local shards.

    x [N_l, D], resp [N_l, K_l], mask [N_l]; data rows sharded on
    ``data_axis``, components sharded on ``bank_axis`` (either may be
    None for a replicated axis).
    """

    def psum_data(v):
        return lax.psum(v, data_axis) if data_axis else v

    def psum_bank(v):
        return lax.psum(v, bank_axis) if bank_axis else v

    def pmax_bank(v):
        return lax.pmax(v, bank_axis) if bank_axis else v

    resp = resp * mask[:, None]
    n_eff = jnp.maximum(psum_data(jnp.sum(mask)), 1.0)
    counts = psum_data(jnp.sum(resp, axis=0))                    # [K_l]
    weights = counts / n_eff
    sums = psum_data(jnp.matmul(resp.T, x, precision=_PRECISION))  # [K_l, D]
    means = sums / jnp.maximum(counts, 1e-30)[:, None]
    means = jnp.clip(means, jnp.float32(eps), jnp.float32(1.0 - eps))

    log_p = jnp.log(means)
    log_1mp = jnp.log1p(-means)
    logit = log_p - log_1mp
    ll = (
        jnp.matmul(x, logit.T, precision=_PRECISION)
        + jnp.sum(log_1mp, axis=1)[None, :]
        + jnp.log(jnp.maximum(weights, 1e-30))[None, :]
    )                                                             # [N_l, K_l]
    mx = pmax_bank(jnp.max(ll, axis=1, keepdims=True))            # [N_l, 1]
    p = jnp.exp(ll - mx)
    z = psum_bank(jnp.sum(p, axis=1, keepdims=True))              # [N_l, 1]
    new_resp = p / z
    per_row = (jnp.log(z[:, 0]) + mx[:, 0]) * mask
    mean_ll = psum_data(jnp.sum(per_row)) / n_eff
    return new_resp, means, weights, mean_ll


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_iters", "eps", "tol", "data_axis", "bank_axis"),
)
def sharded_bernoulli_mixture_em(
    x: jnp.ndarray,
    init_resp: jnp.ndarray,
    mesh: Mesh,
    num_iters: int = 50,
    eps: float = 0.01,
    tol: float = 1e-4,
    mask: jnp.ndarray | None = None,
    data_axis: str | None = "data",
    bank_axis: str | None = "bank",
) -> EMState:
    """Fit a Bernoulli mixture with data and/or component sharding.

    x [N, D] (N % mesh.data == 0), init_resp [N, K]
    (K % mesh.bank == 0), mask [N] optional.  Semantics identical to
    ``models.mixture.bernoulli_mixture_em``.
    """
    x = x.astype(jnp.float32)
    n, k = init_resp.shape
    if mask is None:
        mask = jnp.ones((n,), jnp.float32)
    mask = mask.astype(jnp.float32)

    d_ax = data_axis if (data_axis and mesh.shape[data_axis] > 1) else None
    b_ax = bank_axis if (bank_axis and mesh.shape[bank_axis] > 1) else None

    def body_shard(x_l, resp_l, mask_l):
        k_l = resp_l.shape[1]
        init = EMState(
            iteration=jnp.int32(0),
            responsibilities=resp_l.astype(jnp.float32),
            means=jnp.zeros((k_l, x_l.shape[1]), jnp.float32),
            weights=jnp.full((k_l,), 1.0 / k, jnp.float32),
            log_likelihood=jnp.float32(-jnp.inf),
            done=jnp.bool_(False),
            history=jnp.full((num_iters,), jnp.nan, jnp.float32),
        )

        def cond(s):
            return (s.iteration < num_iters) & (~s.done)

        def body(s):
            it = s.iteration + 1
            new_resp, means, weights, mean_ll = _sharded_em_step(
                x_l, s.responsibilities, mask_l, eps, d_ax, b_ax
            )
            done = ((mean_ll - s.log_likelihood) < tol) & (it > 1)
            return EMState(
                it, new_resp, means, weights, mean_ll, done,
                s.history.at[it - 1].set(mean_ll),
            )

        return lax.while_loop(cond, body, init)

    out_specs = EMState(
        iteration=P(),
        responsibilities=P(data_axis, bank_axis),
        means=P(bank_axis, None),
        weights=P(bank_axis),
        log_likelihood=P(),
        done=P(),
        history=P(),
    )
    fn = shard_map(
        body_shard,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis, bank_axis), P(data_axis)),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(x, init_resp.astype(jnp.float32), mask)
