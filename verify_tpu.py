"""On-TPU compiled parity gate for every Pallas kernel.

VERDICT.md r1 Missing #1: the test suite runs all Pallas kernels in
interpret mode on CPU (tests/conftest.py forces JAX_PLATFORMS=cpu), so
a Mosaic miscompile on the real chip would ship silently.  This script
runs every kernel *compiled* on the default (TPU) backend against the
NumPy oracle / XLA twins and writes per-kernel verdicts to
PARITY_TPU.json.  Non-zero exit on any failure.

Checks (kernel -> reference -> gate):
  frontend_fused      frontend(use_pallas=True)  vs oracle.frontend      binary agreement > 0.999
  edge_responses      ops.frontend_pallas        vs XLA twin on-device   scaled atol 1e-3
  correlation         ops.correlation_pallas     vs oracle.sliding_score scaled atol 2e-3
  dtw                 ops.dtw_pallas             vs oracle.banded_dtw    rtol 1e-4
  fft_fused_4d        dft+binmm(4D)+idft fused   vs oracle + XLA path    scaled 2e-2 / 5e-3
  fft_binmm_3d        padded 3-D binmm path      vs oracle + XLA path    scaled 2e-2 / 5e-3
  int32_bit_parity    detect.sliding_scores_int  vs oracle int path      bit-identical

Tolerances mirror the interpret-mode tests (tests/test_*_pallas.py,
tests/test_fft_scorer.py); the fft path is bf16-class by design
(detect/fft_scorer.py module docstring).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _scaled_err(got: np.ndarray, ref: np.ndarray) -> float:
    scale = np.max(np.abs(ref)) + 1e-6
    return float(np.max(np.abs(got - ref)) / scale)


def check_frontend_fused() -> dict:
    import jax.numpy as jnp
    from oracle.frontend import FrontendParams, frontend as oracle_frontend
    from template_speech_recognition_tpu.config import FrontendConfig
    from template_speech_recognition_tpu.frontend import frontend

    rng = np.random.default_rng(0)
    t = np.arange(16384) / 16000.0
    wav = (
        np.sin(2 * np.pi * 700 * t)
        + 0.5 * np.sin(2 * np.pi * 2300 * t)
        + 0.1 * rng.standard_normal(t.size)
    ).astype(np.float32)
    cfg = FrontendConfig()  # nfft=512 -> pallas-eligible
    nv = 15000
    fused = frontend(jnp.asarray(wav), jnp.int32(nv), cfg, use_pallas=True)
    want = oracle_frontend(wav[:nv], FrontendParams())
    got = np.asarray(fused.binary)[: want.shape[0]]
    agree = float((got == want).mean())
    return {
        "kernel": "frontend_fused",
        "ok": bool(agree > 0.999 and int(fused.valid_frames) >= want.shape[0]),
        "binary_agreement": agree,
    }


def check_edge_responses() -> dict:
    import jax.numpy as jnp
    from template_speech_recognition_tpu.ops import edges
    from template_speech_recognition_tpu.ops.dft import log_magnitude_spectrogram
    from template_speech_recognition_tpu.ops.frontend_pallas import (
        edge_responses_pallas,
    )

    rng = np.random.default_rng(1)
    t, fl, nfft = 256, 64, 256
    frames = jnp.asarray(rng.standard_normal((t, fl)).astype(np.float32))
    got = np.asarray(edge_responses_pallas(frames, nfft))[: t - 1]
    want = np.asarray(
        edges.edge_responses(log_magnitude_spectrogram(frames, nfft))
    )
    err = _scaled_err(got, want)
    return {"kernel": "edge_responses_pallas", "ok": bool(err < 1e-3), "scaled_err": err}


def check_frontend_mel_fused() -> dict:
    """Compiled log-mel fused frontend vs the XLA path (the filterbank
    projects inside the kernel; round-1 verdict, missing item 3)."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.ops import edges
    from template_speech_recognition_tpu.ops.dft import log_mel_spectrogram
    from template_speech_recognition_tpu.ops.frontend_pallas import (
        edge_responses_pallas,
    )

    rng = np.random.default_rng(5)
    t, fl, nfft, sr, n_mels = 256, 400, 512, 16000, 64
    frames = jnp.asarray(rng.standard_normal((t, fl)).astype(np.float32))
    got = np.asarray(
        edge_responses_pallas(frames, nfft, sample_rate=sr, n_mels=n_mels)
    )[: t - 1]
    want = np.asarray(
        edges.edge_responses(log_mel_spectrogram(frames, nfft, sr, n_mels))
    )
    err = _scaled_err(got, want)
    return {
        "kernel": "frontend_mel_fused", "ok": bool(err < 1e-3),
        "scaled_err": err,
    }


def check_correlation() -> dict:
    import jax.numpy as jnp
    from oracle.score import sliding_score
    from template_speech_recognition_tpu.ops.correlation_pallas import (
        correlation_scores_pallas,
    )

    rng = np.random.default_rng(2)
    t, d, k, length = 256, 256, 128, 16
    f, e = 32, 8
    feats = (rng.random((t, f, e)) < 0.2).astype(np.float32)
    w = rng.standard_normal((k, length, f, e)).astype(np.float32)
    c = rng.standard_normal((k,)).astype(np.float32)
    out = correlation_scores_pallas(
        jnp.asarray(feats.reshape(t, d)),
        jnp.asarray(w.reshape(k, length, d)),
        jnp.asarray(c),
        block_k=128,
        block_t=128,
        block_d=128,
    )
    valid = t - length + 1
    ref = sliding_score(feats, w, c)
    err = _scaled_err(np.asarray(out)[:, :valid], ref)
    return {"kernel": "correlation_pallas", "ok": bool(err < 2e-3), "scaled_err": err}


def check_dtw() -> dict:
    import jax.numpy as jnp
    from oracle.dtw import banded_dtw as oracle_dtw
    from template_speech_recognition_tpu.ops.dtw_pallas import banded_dtw_pallas

    rng = np.random.default_rng(3)
    n, length, m, band = 16, 32, 64, 6
    cost = (rng.standard_normal((n, length, m)) + 2.0).astype(np.float32)
    lens = rng.integers(20, m + 1, size=n).astype(np.int32)
    got = np.asarray(banded_dtw_pallas(jnp.asarray(cost), jnp.asarray(lens), band))
    want = np.array(
        [oracle_dtw(cost[i, :, : lens[i]], band) for i in range(n)],
        dtype=np.float32,
    )
    finite = np.isfinite(want)
    ok = bool(
        np.allclose(got[finite], want[finite], rtol=1e-4, atol=1e-4)
        and np.all(got[~finite] > 1e38)
    )
    err = float(np.max(np.abs(got[finite] - want[finite]))) if finite.any() else 0.0
    # Long-segment chunked wavefront (M >> L): multiple streamed
    # diagonal chunks carrying DP state in scratch, compiled.
    n2, l2, m2, band2 = 8, 64, 512, 12
    cost2 = (rng.standard_normal((n2, l2, m2)) + 2.0).astype(np.float32)
    lens2 = rng.integers(440, m2 + 1, size=n2).astype(np.int32)
    got2 = np.asarray(
        banded_dtw_pallas(
            jnp.asarray(cost2), jnp.asarray(lens2), band2, chunk_diags=128
        )
    )
    want2 = np.array(
        [oracle_dtw(cost2[i, :, : lens2[i]], band2) for i in range(n2)],
        dtype=np.float32,
    )
    fin2 = np.isfinite(want2)
    ok = ok and bool(
        fin2.any()
        and np.allclose(got2[fin2], want2[fin2], rtol=1e-4, atol=1e-3)
        and np.all(got2[~fin2] > 1e38)
    )
    err2 = float(np.max(np.abs(got2[fin2] - want2[fin2]))) if fin2.any() else -1.0
    return {
        "kernel": "dtw_pallas", "ok": ok, "max_abs_err": err,
        "long_seg_max_abs_err": err2,
    }


def _fft_case(b, t, k, length, f, e, nfft, seed):
    import jax.numpy as jnp
    from oracle.score import sliding_score
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank,
        fft_sliding_scores,
    )

    rng = np.random.default_rng(seed)
    feats = (rng.random((b, t, f, e)) < 0.2).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=nfft)
    got_p = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=True))
    got_x = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=False))
    ref = np.stack([sliding_score(fm, w, c) for fm in feats])
    return got_p, got_x, ref, bank


def check_fft_fused_4d() -> dict:
    # b=1, t=1936 -> nblk=8, D=128, K=128: forces the fully-fused 4-D
    # dft -> binmm -> idft chain (fft_scorer gates, all aligned).
    got_p, got_x, ref, bank = _fft_case(
        b=1, t=1936, k=128, length=17, f=16, e=8, nfft=256, seed=4
    )
    err_x = _scaled_err(got_p, got_x)
    err_o = _scaled_err(got_p, ref)
    return {
        "kernel": "fft_dft+binmm4d+idft_fused",
        "ok": bool(err_x < 5e-3 and err_o < 2e-2),
        "scaled_err_vs_xla": err_x,
        "scaled_err_vs_oracle": err_o,
    }


def check_fft_binmm_3d() -> dict:
    # b=3, unaligned K=5/D=51: exercises the padded 3-D binmm path and
    # the XLA epilogue fallback (k % 128 != 0).
    got_p, got_x, ref, bank = _fft_case(
        b=3, t=260, k=5, length=12, f=17, e=3, nfft=127, seed=5
    )
    err_x = _scaled_err(got_p, got_x)
    err_o = _scaled_err(got_p, ref)
    return {
        "kernel": "fft_binmm_3d_padded",
        "ok": bool(err_x < 5e-3 and err_o < 2e-2),
        "scaled_err_vs_xla": err_x,
        "scaled_err_vs_oracle": err_o,
    }


def check_int32_bit_parity() -> dict:
    import jax.numpy as jnp
    from oracle.score import llr_filter, quantize_filter, sliding_score_int
    from template_speech_recognition_tpu.detect.scorer import sliding_scores_int

    rng = np.random.default_rng(6)
    t, k, length, f, e = 300, 16, 20, 24, 8
    feats = (rng.random((t, f, e)) < 0.2).astype(np.float32)
    p = np.clip(rng.random((k, length, f, e)), 0.05, 0.95).astype(np.float32)
    q = np.clip(rng.random((f, e)), 0.05, 0.95).astype(np.float32)
    w, c = llr_filter(p, q)
    w_int, c_int = quantize_filter(w, c)
    got = np.asarray(
        sliding_scores_int(jnp.asarray(feats), jnp.asarray(w_int), jnp.asarray(c_int))
    )
    want = sliding_score_int(feats, w_int, c_int)
    ok = bool(np.array_equal(got, want))
    return {
        "kernel": "int32_sliding_scores",
        "ok": ok,
        "bit_identical": ok,
        "mismatches": int(np.sum(got != want)),
    }


def check_radix_counts() -> dict:
    """Compiled radix_level_counts_pallas vs the XLA broadcast count
    (round-3 kernel; exact integer equality)."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.ops.radix_pallas import (
        radix_level_counts_pallas,
    )

    rng = np.random.default_rng(7)
    r, n, nc, shift = 8, 5000, 16, 21
    keys = jnp.asarray(rng.integers(0, 2**32, (r, n), dtype=np.uint32))
    cand = jnp.asarray(
        rng.integers(0, 2 ** (32 - shift), (r, nc), dtype=np.uint32)
    )
    got = np.asarray(radix_level_counts_pallas(keys, cand, shift))
    hi = np.asarray(keys) >> np.uint32(shift)
    want = (hi[:, None, :] <= np.asarray(cand)[:, :, None]).sum(-1)
    ok = bool((got == want).all())
    return {"kernel": "radix_level_counts", "ok": ok,
            "mismatches": int((got != want).sum())}


def check_binspread_kernel() -> dict:
    """Compiled binarize_freqspread_pallas vs the XLA epilogue
    (round-3 kernel; bit-identical binary map)."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.frontend import planes as pm
    from template_speech_recognition_tpu.ops.binspread_pallas import (
        binarize_freqspread_pallas,
    )

    rng = np.random.default_rng(8)
    b, p, t, f = 2, 4, 256, 128
    planes = jnp.asarray(rng.standard_normal((b, p, t, f)).astype(np.float32))
    valid = jnp.asarray([t, t // 2], jnp.int32)
    os_hi, os_lo = pm.plane_order_statistics(planes, valid, 0.9)
    got = np.asarray(
        binarize_freqspread_pallas(planes, os_hi, os_lo, valid, 1)
    ).astype(bool)
    want = np.asarray(
        pm.binarize_spread_flat(planes, os_hi, os_lo, valid, 0, 1)
    )
    ok = bool((got == want).all())
    return {"kernel": "binarize_freqspread", "ok": ok,
            "mismatches": int((got != want).sum())}


def check_selbin_fused() -> dict:
    """Compiled resident select+binspread kernel (ops.selbin_pallas)
    vs the layered XLA select + binarize (round-4 kernel; the
    production frontend's hot path; bit-identical)."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.frontend import planes as pm
    from template_speech_recognition_tpu.ops import edges
    from template_speech_recognition_tpu.ops.selbin_pallas import (
        select_binspread_pallas,
    )

    rng = np.random.default_rng(9)
    p, b, t, f = 4, 3, 256, 128
    x = rng.standard_normal((p, b, t, f)).astype(np.float32)
    x[:, :, : t // 3] = np.round(x[:, :, : t // 3] * 4) / 4  # ties
    planes = jnp.asarray(x)
    valid = jnp.asarray([t, t // 2, 9], jnp.int32)
    need = pm._dual_ranks(valid, f, 0.98)
    flat, keys = select_binspread_pallas(planes, need, valid, 1)
    planes_bptf = jnp.transpose(planes, (1, 0, 2, 3))
    os_hi, os_lo = pm.plane_order_statistics(planes_bptf, valid, 0.98)
    want = np.asarray(
        pm.binarize_spread_flat(planes_bptf, os_hi, os_lo, valid, 0, 1)
    )
    flat_ok = bool((np.asarray(flat).astype(bool) == want).all())
    keys_ok = bool(
        (np.asarray(edges.key_to_float(keys[..., 0])) == np.asarray(os_hi)).all()
        and (np.asarray(edges.key_to_float(keys[..., 1])) == np.asarray(os_lo)).all()
    )
    return {"kernel": "selbin_fused", "ok": flat_ok and keys_ok,
            "flat_bitwise": flat_ok, "keys_bitwise": keys_ok}


def check_frontend_flat_oracle() -> dict:
    """Production plane-major frontend (stacked response kernel +
    resident selbin kernel, both compiled) vs the NumPy oracle flat
    map (round-4; agreement gate mirrors check_frontend_fused -- the
    fused DFT is allclose-class, so threshold-adjacent cells may
    flip)."""
    import jax.numpy as jnp
    from oracle.frontend import FrontendParams, frontend as oracle_frontend
    from template_speech_recognition_tpu.config import FrontendConfig
    from template_speech_recognition_tpu.frontend.planes import (
        frontend_batch_flat,
    )
    from template_speech_recognition_tpu.ops.layout import channels_to_flat

    rng = np.random.default_rng(0)
    t = np.arange(16384) / 16000.0
    wav = (
        np.sin(2 * np.pi * 700 * t)
        + 0.5 * np.sin(2 * np.pi * 2300 * t)
        + 0.1 * rng.standard_normal(t.size)
    ).astype(np.float32)
    cfg = FrontendConfig()
    nv = 15000
    fm = frontend_batch_flat(
        jnp.asarray(wav)[None, :], jnp.asarray([nv], jnp.int32), cfg
    )
    want_ch = oracle_frontend(wav[:nv], FrontendParams())
    want = np.asarray(channels_to_flat(jnp.asarray(want_ch)))
    got = np.asarray(fm.binary[0])[: want.shape[0]]
    agree = float((got == want).mean())
    return {"kernel": "frontend_flat_fused", "ok": bool(agree > 0.999),
            "binary_agreement": agree}


def check_dtw_packed_layouts() -> dict:
    """Round-5 lane-packed DTW layout vs the unpacked full layout and
    the oracle, compiled, at the real-bank row length L=9 (pack=8) and
    an odd pair count (internal padding path)."""
    import jax.numpy as jnp
    from oracle.dtw import banded_dtw as oracle_dtw
    from template_speech_recognition_tpu.ops.dtw_pallas import (
        banded_dtw_pallas,
    )

    rng = np.random.default_rng(11)
    n, length, m, band = 13, 9, 20, 4
    cost = (rng.standard_normal((n, length, m)) + 2.0).astype(np.float32)
    lens = rng.integers(6, m + 1, size=n).astype(np.int32)
    got = np.asarray(
        banded_dtw_pallas(jnp.asarray(cost), jnp.asarray(lens), band,
                          layout="packed")
    )
    n_full = ((n + 7) // 8) * 8
    cost_f = np.concatenate(
        [cost, np.broadcast_to(cost[:1], (n_full - n,) + cost.shape[1:])]
    )
    lens_f = np.concatenate([lens, np.ones(n_full - n, np.int32)])
    full = np.asarray(
        banded_dtw_pallas(jnp.asarray(cost_f), jnp.asarray(lens_f), band,
                          layout="full")
    )[:n]
    want = np.array(
        [oracle_dtw(cost[i, :, : lens[i]], band) for i in range(n)],
        dtype=np.float32,
    )
    finite = np.isfinite(want)
    ok = bool(
        np.allclose(got[finite], full[finite], rtol=1e-6, atol=1e-6)
        and np.allclose(got[finite], want[finite], rtol=1e-4, atol=1e-4)
        and np.all(got[~finite] > 1e38)
    )
    err = (
        float(np.max(np.abs(got[finite] - want[finite])))
        if finite.any() else 0.0
    )
    return {"kernel": "dtw_packed_layout", "ok": ok, "max_abs_err": err,
            "pack": 128 // 16}


def check_int8_binmm() -> dict:
    """int8-spectra scoring (round 5): quantized path within
    quantization tolerance of the f32 reference, winning template
    agreement high."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank,
        fft_sliding_scores,
    )

    rng = np.random.default_rng(12)
    b, t, k, length, f, e = 2, 200, 128, 16, 16, 8
    feats = (rng.random((b, t, f, e)) < 0.2).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    bank8 = build_fft_bank(jnp.asarray(w), jnp.asarray(c),
                           mm_dtype=jnp.int8)
    bank32 = build_fft_bank(jnp.asarray(w), jnp.asarray(c),
                            mm_dtype=jnp.float32)
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank8))
    ref = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank32, use_pallas=False)
    )
    err = _scaled_err(got, ref)
    agree = float((got.argmax(axis=1) == ref.argmax(axis=1)).mean())
    return {
        "kernel": "fft_binmm_int8", "ok": bool(err < 4e-2 and agree > 0.9),
        "scaled_err_vs_f32": err, "argmax_agreement": agree,
    }


def check_pair_llr_fused() -> dict:
    """Round-5 fused DMA-gather rescore: scores straight from the
    feature map == pairwise scores over explicitly gathered
    segments/filters (bf16 operands both sides), compiled."""
    import jax.numpy as jnp
    from template_speech_recognition_tpu.align.dtw import (
        dtw_pairwise_scores,
        dtw_pairwise_scores_from_map,
    )

    rng = np.random.default_rng(13)
    b, t, k, length, d = 2, 96, 7, 8, 256
    m_seg, band, p = 12, 3, 5
    binary = jnp.asarray((rng.random((b, t, d)) < 0.3).astype(np.float32))
    times = jnp.asarray(rng.integers(0, t - 1, (b, p)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, k, (b, p)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(k, length, d)).astype(np.float32))
    c_rows = jnp.asarray(rng.normal(size=(k, length)).astype(np.float32))
    vf = jnp.asarray([t, t - 9], jnp.int32)
    got = np.asarray(
        dtw_pairwise_scores_from_map(
            binary, times, ids, w, c_rows, vf, m_seg, band
        )
    )
    idx = np.clip(
        np.asarray(times)[:, :, None] + np.arange(m_seg)[None, None],
        0, t - 1,
    )
    segs = np.stack([np.asarray(binary)[i][idx[i]] for i in range(b)])
    lens = np.clip(np.asarray(vf)[:, None] - np.asarray(times), 1, m_seg)
    wk = np.asarray(w)[np.asarray(ids).reshape(-1)]
    ck = np.asarray(c_rows)[np.asarray(ids).reshape(-1)]
    want = np.asarray(
        dtw_pairwise_scores(
            jnp.asarray(segs.reshape(b * p, m_seg, d), jnp.bfloat16),
            jnp.asarray(lens.reshape(-1), jnp.int32),
            jnp.asarray(wk, jnp.bfloat16),
            jnp.asarray(ck), band, use_pallas=True,
        )
    ).reshape(b, p)
    finite = np.isfinite(want)
    err = (
        float(np.max(np.abs(got[finite] - want[finite])))
        if finite.any() else 0.0
    )
    ok = bool(
        np.allclose(got[finite], want[finite], rtol=1e-3, atol=1e-3)
        and (np.isfinite(got) == finite).all()
    )
    return {"kernel": "pair_llr_fused", "ok": ok, "max_abs_err": err}


CHECKS = [
    check_frontend_fused,
    check_frontend_mel_fused,
    check_edge_responses,
    check_correlation,
    check_dtw,
    check_dtw_packed_layouts,
    check_pair_llr_fused,
    check_fft_fused_4d,
    check_fft_binmm_3d,
    check_int8_binmm,
    check_int32_bit_parity,
    check_radix_counts,
    check_binspread_kernel,
    check_selbin_fused,
    check_frontend_flat_oracle,
]


def main() -> None:
    _enable_compile_cache()
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print(
            "[verify_tpu] WARNING: no TPU visible -- kernels run in "
            "interpret mode; this is NOT the compiled parity gate.",
            file=sys.stderr,
        )
    results = []
    for fn in CHECKS:
        t0 = time.perf_counter()
        try:
            r = fn()
        except Exception as exc:  # a compile failure is a parity failure
            r = {"kernel": fn.__name__, "ok": False, "error": repr(exc)[:500]}
        r["seconds"] = round(time.perf_counter() - t0, 1)
        results.append(r)
        print(f"[verify_tpu] {r['kernel']}: {'PASS' if r['ok'] else 'FAIL'} {r}",
              file=sys.stderr)
    out = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "compiled": backend != "cpu",
        "all_ok": all(r["ok"] for r in results),
        "kernels": results,
    }
    with open(os.path.join(os.path.dirname(__file__) or ".", "PARITY_TPU.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"parity_tpu_all_ok": out["all_ok"], "n_kernels": len(results)}))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0 if out["all_ok"] else 1)  # axon PJRT teardown hangs at exit


if __name__ == "__main__":
    main()
