"""Bernoulli mixture estimation by EM.

SURVEY.md section 1 row L2 / section 3.1 hot loop #2 ([HIGH]): the
reference fits multi-template classes (and its parts dictionaries)
with a Bernoulli mixture -- E-step responsibilities from per-component
Bernoulli log-likelihoods via log-sum-exp, M-step responsibility-
weighted means plus mixture weights, means clipped away from {0,1}.

All arithmetic float32 (GEMM-form log-likelihood) so the TPU
implementation performs the same operations; the shared deterministic
initializer lives here and is passed *into* both implementations so
parity does not depend on RNG equivalence.
"""

from __future__ import annotations

import numpy as np


def init_responsibilities(num_data: int, num_components: int, seed: int) -> np.ndarray:
    """Deterministic soft-assignment init shared by oracle and TPU EM.

    Dirichlet-ish: iid uniform(0.1, 1.1) then row-normalized; float32.
    """
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.1, 1.1, size=(num_data, num_components)).astype(np.float32)
    return r / r.sum(axis=1, keepdims=True)


def _log_likelihoods(x: np.ndarray, means: np.ndarray, log_weights: np.ndarray) -> np.ndarray:
    """[N, D] binary x, [K, D] means -> [N, K] per-component loglik + log w.

    ll_nk = x_n . (log p_k - log(1-p_k)) + sum_d log(1 - p_kd) + log w_k
    """
    log_p = np.log(means)
    log_1mp = np.log1p(-means).astype(np.float32)
    logit = (log_p - log_1mp).astype(np.float32)
    return x @ logit.T + log_1mp.sum(axis=1)[None, :] + log_weights[None, :]


def bernoulli_mixture_em(
    x: np.ndarray,
    init_resp: np.ndarray,
    num_iters: int = 50,
    eps: float = 0.01,
    tol: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fit a K-component Bernoulli mixture to binary data.

    Args:
      x: [N, D] binary data (any dtype; cast to float32).
      init_resp: [N, K] initial responsibilities (see
        ``init_responsibilities``).
      num_iters: max EM iterations.
      eps: clip means to [eps, 1-eps].
      tol: stop when mean loglik improves by less than tol.

    Returns:
      (means [K, D] float32, weights [K] float32,
       loglik_history [<=num_iters] float32, iters_run).

    The loglik history is monotone non-decreasing (EM property; tested).
    """
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    resp = np.asarray(init_resp, dtype=np.float32)
    k = resp.shape[1]
    eps32 = np.float32(eps)
    history: list[float] = []
    means = np.zeros((k, x.shape[1]), dtype=np.float32)
    weights = np.full((k,), 1.0 / k, dtype=np.float32)
    prev_ll = -np.inf
    it = 0
    for it in range(1, num_iters + 1):
        # M-step from current responsibilities.
        counts = resp.sum(axis=0)                       # [K]
        weights = (counts / n).astype(np.float32)
        means = (resp.T @ x) / counts[:, None]
        means = np.clip(means, eps32, 1.0 - eps32).astype(np.float32)
        # E-step.
        ll = _log_likelihoods(x, means, np.log(np.maximum(weights, 1e-30)).astype(np.float32))
        mx = ll.max(axis=1, keepdims=True)
        p = np.exp(ll - mx)
        z = p.sum(axis=1, keepdims=True)
        resp = (p / z).astype(np.float32)
        mean_ll = float((np.log(z[:, 0]) + mx[:, 0]).mean())
        history.append(mean_ll)
        if mean_ll - prev_ll < tol and it > 1:
            break
        prev_ll = mean_ll
    return means, weights, np.asarray(history, dtype=np.float32), it


def bernoulli_mixture_em_restarts(
    x: np.ndarray,
    num_components: int,
    num_restarts: int,
    seed: int = 0,
    num_iters: int = 50,
    eps: float = 0.01,
    tol: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Multi-restart EM: run ``num_restarts`` fits from
    ``init_responsibilities(n, k, seed + r)`` and keep the one with the
    highest final mean log-likelihood (ties -> lowest restart index).

    Returns (means, weights, history, iters_run, best_restart).
    """
    n = np.asarray(x).shape[0]
    best = None
    best_final = -np.inf
    best_r = -1
    for r in range(num_restarts):
        resp = init_responsibilities(n, num_components, seed + r)
        means, weights, history, iters = bernoulli_mixture_em(
            x, resp, num_iters=num_iters, eps=eps, tol=tol
        )
        final = history[-1] if len(history) else -np.inf
        if best is None or final > best_final:
            best = (means, weights, history, iters)
            best_final = final
            best_r = r
    means, weights, history, iters = best
    return means, weights, history, iters, best_r
