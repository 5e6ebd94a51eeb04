"""Parts-based feature coding (SURVEY.md section 1 row L5, [MED]).

A dictionary of small binary patches ("parts") is learned with the
Bernoulli mixture EM over random patches cropped from binary edge
maps; utterances are then re-coded as part-indicator maps (argmax part
per location, gated by a log-likelihood threshold), and templates can
be built over part features instead of raw edges.
"""

from __future__ import annotations

import numpy as np

from oracle.mixture import bernoulli_mixture_em, init_responsibilities


def extract_random_patches(
    feature_maps: list[np.ndarray],
    patch_time: int,
    patch_freq: int,
    num_patches: int,
    seed: int,
    min_active: int = 1,
) -> np.ndarray:
    """Sample random [pt, pf, E] patches with >= min_active set bits.

    Returns [num_patches, pt*pf*E] float32 (flattened binary patches).
    """
    rng = np.random.default_rng(seed)
    out = np.zeros((num_patches, patch_time * patch_freq * feature_maps[0].shape[2]), dtype=np.float32)
    count = 0
    attempts = 0
    max_attempts = num_patches * 100
    while count < num_patches and attempts < max_attempts:
        attempts += 1
        fm = feature_maps[int(rng.integers(0, len(feature_maps)))]
        t_max = fm.shape[0] - patch_time
        f_max = fm.shape[1] - patch_freq
        if t_max <= 0 or f_max <= 0:
            continue
        t0 = int(rng.integers(0, t_max))
        f0 = int(rng.integers(0, f_max))
        patch = fm[t0 : t0 + patch_time, f0 : f0 + patch_freq, :]
        if patch.sum() >= min_active:
            out[count] = patch.reshape(-1).astype(np.float32)
            count += 1
    return out[:count]


def learn_parts(
    feature_maps: list[np.ndarray],
    num_parts: int,
    patch_time: int = 5,
    patch_freq: int = 5,
    num_patches: int = 2000,
    seed: int = 0,
    num_iters: int = 30,
    eps: float = 0.01,
) -> np.ndarray:
    """Learn a part dictionary: [num_parts, pt, pf, E] float32 means."""
    patches = extract_random_patches(feature_maps, patch_time, patch_freq, num_patches, seed)
    resp = init_responsibilities(patches.shape[0], num_parts, seed + 1)
    means, _, _, _ = bernoulli_mixture_em(patches, resp, num_iters=num_iters, eps=eps)
    e = feature_maps[0].shape[2]
    return means.reshape(num_parts, patch_time, patch_freq, e)


def code_parts(
    feature_map: np.ndarray,
    parts: np.ndarray,
    loglik_threshold: float = -np.inf,
    stride_time: int = 1,
    stride_freq: int = 1,
) -> np.ndarray:
    """Re-code a binary map as a part-indicator map.

    feature_map: [T, F, E] bool; parts: [J, pt, pf, E].
    For every (strided) location, compute the Bernoulli log-likelihood
    of the patch under each part; emit a one-hot of the argmax part
    when its loglik clears the threshold.  Returns [T', F', J] bool.
    """
    j, pt, pf, e = parts.shape
    p = np.clip(parts.reshape(j, -1).astype(np.float32), 1e-4, 1 - 1e-4)
    logit = np.log(p) - np.log1p(-p)
    offset = np.log1p(-p).sum(axis=1)
    t_out = (feature_map.shape[0] - pt) // stride_time + 1
    f_out = (feature_map.shape[1] - pf) // stride_freq + 1
    out = np.zeros((t_out, f_out, j), dtype=bool)
    for ti in range(t_out):
        for fi in range(f_out):
            t0, f0 = ti * stride_time, fi * stride_freq
            x = feature_map[t0 : t0 + pt, f0 : f0 + pf, :].reshape(-1).astype(np.float32)
            ll = logit @ x + offset
            best = int(np.argmax(ll))
            if ll[best] >= loglik_threshold:
                out[ti, fi, best] = True
    return out
