"""Parity tests for the VMEM-resident fused select+binspread kernel
(``ops.selbin_pallas``) and the two-kernel hot frontend path it powers
(``frontend.planes.frontend_batch_flat``).

The contract is BIT-parity: the resident value-space bisection selects
the same element as the layered 4-bit XLA counting path (any digit
schedule descends into the same digit -- planes.py), and the key-space
binarize reproduces the float compares exactly (monotone bijection).
CPU runs use interpret mode; the same kernels compile on the chip
(verify_tpu.py).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from template_speech_recognition_tpu.config import FrontendConfig
from template_speech_recognition_tpu.frontend import planes as planes_mod
from template_speech_recognition_tpu.ops import edges
from template_speech_recognition_tpu.ops.selbin_pallas import (
    select_binspread_pallas,
)


def _random_planes(b, p, t, f, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((p, b, t, f)).astype(np.float32)
    # heavy ties: quantize a third of cells so equal keys exercise the
    # rank tie-handling
    x[:, :, : t // 3] = np.round(x[:, :, : t // 3] * 4) / 4
    return jnp.asarray(x)


@pytest.mark.parametrize("q", [0.3, 0.5, 0.98])
@pytest.mark.parametrize("rf,rt", [(0, 0), (1, 0), (2, 1), (1, 2)])
def test_selbin_matches_layered_select(q, rf, rt):
    b, p, t, f = 3, 4, 256, 128
    planes = _random_planes(b, p, t, f)
    valid = jnp.asarray([t, t // 2, 7], jnp.int32)
    need = planes_mod._dual_ranks(valid, f, q)

    flat, keys = select_binspread_pallas(
        planes, need, valid, rf, rt, interpret=True
    )

    # reference: the layered path (XLA 4-bit radix + binarize/spread)
    planes_bptf = jnp.transpose(planes, (1, 0, 2, 3))
    os_hi, os_lo = planes_mod.plane_order_statistics(
        planes_bptf, valid, q, use_pallas=False
    )
    ref = planes_mod.binarize_spread_flat(
        planes_bptf, os_hi, os_lo, valid, rt, rf, use_pallas=False
    )
    np.testing.assert_array_equal(
        np.asarray(flat, bool), np.asarray(ref)
    )
    # selected keys decode to the same float statistics bit-for-bit
    np.testing.assert_array_equal(
        np.asarray(edges.key_to_float(keys[..., 0])), np.asarray(os_hi)
    )
    np.testing.assert_array_equal(
        np.asarray(edges.key_to_float(keys[..., 1])), np.asarray(os_lo)
    )


def test_selbin_digit_bits_schedules_identical():
    """1-bit and 2-bit bisection schedules select the bit-identical
    element (digit-schedule invariance) and emit identical maps."""
    b, p, t, f = 2, 4, 256, 128
    planes = _random_planes(b, p, t, f, seed=11)
    valid = jnp.asarray([t, 19], jnp.int32)
    need = planes_mod._dual_ranks(valid, f, 0.98)
    f1, k1 = select_binspread_pallas(
        planes, need, valid, 1, 1, digit_bits=1, interpret=True
    )
    f2, k2 = select_binspread_pallas(
        planes, need, valid, 1, 1, digit_bits=2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_selbin_all_rows_invalid():
    b, p, t, f = 2, 4, 128, 128
    planes = _random_planes(b, p, t, f, seed=3)
    valid = jnp.asarray([0, 5], jnp.int32)
    need = planes_mod._dual_ranks(valid, f, 0.9)
    flat, _ = select_binspread_pallas(
        planes, need, valid, 1, interpret=True
    )
    assert not np.asarray(flat[0]).any()


def test_fused_frontend_matches_layered_paths():
    """frontend_batch_flat: fused two-kernel path == layered Pallas
    path == pure-XLA path, bitwise, on a gate-qualifying shape."""
    cfg = FrontendConfig(nfft=256)      # F = 128: lane-aligned
    b, t_frames = 3, 100
    samples = (t_frames - 1) * cfg.hop_length + cfg.frame_length
    rng = np.random.default_rng(1)
    wavs = jnp.asarray(rng.standard_normal((b, samples)), jnp.float32)
    valid = jnp.asarray(
        [samples, samples - 3 * cfg.hop_length, cfg.frame_length + 5],
        jnp.int32,
    )
    assert planes_mod._selbin_ok(cfg, 128)
    fused = planes_mod.frontend_batch_flat(wavs, valid, cfg, use_pallas=True)

    orig = planes_mod._selbin_ok
    planes_mod._selbin_ok = lambda *a: False
    planes_mod.frontend_batch_flat._clear_cache()
    try:
        layered = planes_mod.frontend_batch_flat(
            wavs, valid, cfg, use_pallas=True
        )
    finally:
        planes_mod._selbin_ok = orig
        planes_mod.frontend_batch_flat._clear_cache()

    np.testing.assert_array_equal(
        np.asarray(fused.binary), np.asarray(layered.binary)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.valid_frames), np.asarray(layered.valid_frames)
    )
