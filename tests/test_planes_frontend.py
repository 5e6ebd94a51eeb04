"""Plane-major flat frontend == classic channels-minor pipeline.

The production path (``frontend.planes``) must produce exactly the
same binary decisions as the spec pipeline: per-channel sort-based
thresholds on the stacked [T', F', 8] responses + reduce-window
spreading.  Covers the dual-rank identity (threshold of -plane at
rank k == -threshold of plane at rank n-1-k), the flat layout
round-trip, and the flat <-> filter flattening consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from template_speech_recognition_tpu.config import FrontendConfig
from template_speech_recognition_tpu.frontend import (
    frontend_batch,
    frontend_batch_flat,
)
from template_speech_recognition_tpu.frontend.planes import (
    binarize_spread_flat,
    plane_order_statistics,
)
from template_speech_recognition_tpu.ops import edges
from template_speech_recognition_tpu.ops.layout import (
    channels_to_flat,
    filters_to_flat,
    flat_to_channels,
)


def _planes(rng, b, t, f):
    return jnp.asarray(rng.standard_normal((b, 4, t, f)).astype(np.float32))


def _stack_channels(planes):
    """[B, 4, T, F] -> [B, T, F, 8] classic response layout."""
    chans = []
    for i in range(4):
        chans.append(planes[:, i])
        chans.append(-planes[:, i])
    return jnp.stack(chans, axis=-1)


@pytest.mark.parametrize("q", [0.98, 0.5, 0.9])
def test_dual_rank_matches_per_channel_sort(q):
    rng = np.random.default_rng(0)
    planes = _planes(rng, 2, 40, 13)
    vf = jnp.asarray([40, 17], jnp.int32)
    os_hi, os_lo = plane_order_statistics(planes, vf, q)
    resp = _stack_channels(planes)
    tau_ref = jax.vmap(
        lambda r, v: edges.quantile_threshold(r, q, v, method="sort")
    )(resp, vf)
    tau_got = jnp.stack(
        [jnp.stack([os_hi[:, i], -os_lo[:, i]], -1) for i in range(4)], 1
    ).reshape(2, 8)
    np.testing.assert_array_equal(np.asarray(tau_got), np.asarray(tau_ref))


@pytest.mark.parametrize("rt,rf", [(0, 0), (1, 1), (2, 1)])
def test_binarize_spread_flat_matches_classic(rt, rf):
    rng = np.random.default_rng(1)
    planes = _planes(rng, 2, 30, 11)
    vf = jnp.asarray([30, 12], jnp.int32)
    q = 0.9
    os_hi, os_lo = plane_order_statistics(planes, vf, q)
    flat = binarize_spread_flat(planes, os_hi, os_lo, vf, rt, rf)
    # classic: binarize (masked) -> rect spread -> mask
    resp = _stack_channels(planes)

    def classic(r, v):
        b = edges.binarize(r, q, v)
        b = edges.spread_binary(b, rt, rf)
        return edges.mask_rows(b, v)

    want = jax.vmap(classic)(resp, vf)
    np.testing.assert_array_equal(
        np.asarray(flat_to_channels(flat, 11)), np.asarray(want)
    )


def test_layout_round_trip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((3, 20, 17, 8)) < 0.2)
    flat = channels_to_flat(x)
    assert flat.shape == (3, 20, 8 * 17)
    np.testing.assert_array_equal(
        np.asarray(flat_to_channels(flat, 17)), np.asarray(x)
    )
    # d = e*F + f ordering
    np.testing.assert_array_equal(
        np.asarray(flat[..., 3 * 17 + 5]), np.asarray(x[..., 5, 3])
    )


def test_filter_feature_flat_contract():
    """Contraction of flat features vs flat filters == the [F, E]
    contraction (integer arithmetic -> exact)."""
    rng = np.random.default_rng(3)
    feats = (rng.random((9, 6, 4)) < 0.3).astype(np.int32)
    w = rng.integers(-5, 5, (3, 2, 6, 4)).astype(np.int32)
    # full valid correlation over a length-2 window
    ref = np.asarray(
        [
            [
                np.sum(feats[t : t + 2] * w[k])
                for t in range(feats.shape[0] - 1)
            ]
            for k in range(3)
        ]
    )
    ff = np.asarray(channels_to_flat(jnp.asarray(feats)))
    wf = np.asarray(filters_to_flat(jnp.asarray(w)))
    got = np.asarray(
        [
            [np.sum(ff[t : t + 2] * wf[k]) for t in range(feats.shape[0] - 1)]
            for k in range(3)
        ]
    )
    np.testing.assert_array_equal(got, ref)


def test_flat_frontend_matches_wrapper():
    cfg = FrontendConfig()
    rng = np.random.default_rng(4)
    wavs = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    valid = jnp.asarray([8000, 5000], jnp.int32)
    fm_flat = frontend_batch_flat(wavs, valid, cfg, use_pallas=False)
    fm = frontend_batch(wavs, valid, cfg, use_pallas=False)
    t_out = cfg.num_feature_frames(8000)
    np.testing.assert_array_equal(
        np.asarray(flat_to_channels(fm_flat.binary[:, :t_out], cfg.feature_freqs)),
        np.asarray(fm.binary),
    )
    np.testing.assert_array_equal(
        np.asarray(fm_flat.valid_frames), np.asarray(fm.valid_frames)
    )


@pytest.mark.parametrize("q", [0.98, 0.5])
def test_plane_order_statistics_pallas_matches_xla(q):
    """The fused counting kernel selects the bit-identical element
    (non-lane-aligned N exercises the kernel's padding)."""
    rng = np.random.default_rng(3)
    planes = _planes(rng, 2, 48, 13)
    vf = jnp.asarray([48, 19], jnp.int32)
    ref = plane_order_statistics(planes, vf, q)
    got = plane_order_statistics(planes, vf, q, use_pallas=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_radix_level_counts_kernel():
    from template_speech_recognition_tpu.ops.radix_pallas import (
        radix_level_counts_pallas,
    )

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, (5, 300), dtype=np.uint32)
    cand = rng.integers(0, 2**28, (5, 32), dtype=np.uint32)
    # the kernel pads N/R with the 0xFFFFFFFF mask key, which counts
    # exactly as the XLA path counts masked cells -- model it here
    keys_pad = np.full((5, 8192), 0xFFFFFFFF, np.uint32)
    keys_pad[:, :300] = keys
    for shift in (28, 12, 0):
        got = np.asarray(
            radix_level_counts_pallas(
                jnp.asarray(keys), jnp.asarray(cand), shift
            )
        )
        ref = (
            ((keys_pad[:, None, :] >> np.uint32(shift)) <= cand[:, :, None])
            .sum(-1)
            .astype(np.int32)
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("rt,rf", [(0, 0), (1, 1), (2, 2)])
def test_binarize_spread_pallas_matches_xla(rt, rf):
    """Fused binarize+freq-spread kernel == XLA epilogue, bitwise."""
    rng = np.random.default_rng(5)
    b, p, t, f = 2, 4, 256, 16
    planes = jnp.asarray(rng.standard_normal((b, p, t, f)).astype(np.float32))
    vf = jnp.asarray([256, 100], jnp.int32)
    os_hi = jnp.asarray(rng.standard_normal((b, p)).astype(np.float32) + 0.5)
    os_lo = os_hi - 1.5
    ref = binarize_spread_flat(planes, os_hi, os_lo, vf, rt, rf)
    got = binarize_spread_flat(planes, os_hi, os_lo, vf, rt, rf,
                               use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
