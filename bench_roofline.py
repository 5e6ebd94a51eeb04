"""Per-kernel-class roofline artifact (round-2 verdict, missing item
5: "Commit roofline artifacts for every kernel class").

Measures device seconds-per-call for each hot kernel class with the
slope method (see bench.py docstring) and compares against the
compute/HBM rooflines from ``utils.profiling.CostModel`` /
``roofline_report`` (BASELINE.md "speed-of-light per chip" row).

Kernel classes covered:
  fft_scorer   overlap-save frequency-domain bank scoring (the
               production hot kernel; 3 fused Pallas stages)
  frontend     fused waveform -> binary edge map (plane-major path)
  dtw          band-compressed wavefront DTW (ops.dtw_pallas)

Writes ``ROOFLINE_r04.json``: one row per kernel with {measured_s,
compute_s, memory_s, roofline_s, bound, roofline_frac} plus the
workload shape, and an ``explanations`` entry for any kernel below
~50% of its binding roofline.

Run on the real chip: ``python bench_roofline.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import _enable_compile_cache, _slope_time


def _measure_fft(b, t, k, length, f, e):
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank,
        fft_sliding_scores,
    )

    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        feats = jax.random.bernoulli(k0, 0.15, (b, t, f * e)).astype(
            jnp.bfloat16
        )
        w = jax.random.normal(k1, (k, length, f, e), jnp.bfloat16)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return feats, w, c

    fj, wj, cj = make_data()
    fj.block_until_ready()
    bank = build_fft_bank(wj, cj)
    jax.block_until_ready(bank.w2)

    def score_batch(fb, bk):
        return jnp.sum(fft_sliding_scores(fb, bk, time_major=True, trim=False))

    dt = _slope_time(score_batch, fj, bank)
    return dt, bank.nfft


def _measure_frontend_dt(b, t, fcfg):
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.frontend.planes import (
        frontend_batch_flat,
    )
    from template_speech_recognition_tpu.pipeline import bucket_length

    samples = t * fcfg.hop_length + fcfg.frame_length
    pad = bucket_length(samples)

    @jax.jit
    def make_wavs():
        return jax.random.normal(jax.random.PRNGKey(1), (b, pad), jnp.float32)

    wavs = make_wavs()
    wavs.block_until_ready()
    valid = jnp.full((b,), samples, jnp.int32)

    def run(wv, vs):
        # frontend_batch_flat, not the frontend_batch wrapper: the flat
        # plane-major map is what every hot path (bench.py e2e, the
        # streaming scans) consumes; the channels-minor relayout in the
        # wrapper is off the hot path (advisor round-3, low #3).
        fm = frontend_batch_flat(wv, vs, fcfg)
        return jnp.sum(fm.binary.astype(jnp.float32))

    return _slope_time(run, wavs, valid, reps=(2, 8)), samples


def _measure_dtw(n, length, m, band):
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.ops.dtw_pallas import (
        banded_dtw_pallas,
    )

    @jax.jit
    def make():
        cost = jax.random.normal(
            jax.random.PRNGKey(0), (n, length, m), jnp.float32
        ) + 2.0
        lens = jnp.full((n,), m, jnp.int32)
        return cost, lens

    cost, lens = make()
    cost.block_until_ready()

    t_at = {}
    for r in (2, 8):
        @jax.jit
        def run(c0, ln, r=r):
            acc = jnp.float32(0.0)
            for i in range(r):
                acc = acc + jnp.sum(
                    banded_dtw_pallas(c0 + (i + 1) * 1e-6, ln, band)
                )
            return acc

        t0 = time.perf_counter()
        float(run(cost, lens))
        print(
            f"[roofline] dtw compile r={r}: {time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(run(cost, lens))
            times.append(time.perf_counter() - t0)
        t_at[r] = float(np.min(times))
    return (t_at[8] - t_at[2]) / 6


def main() -> None:
    _enable_compile_cache()
    import jax

    from template_speech_recognition_tpu.config import FrontendConfig
    from template_speech_recognition_tpu.utils.profiling import (
        CostModel,
        PEAK_F32_FLOPS,
        roofline_report,
    )

    b = int(os.environ.get("BENCH_B", 8))
    t = int(os.environ.get("BENCH_T", 3000))
    k = int(os.environ.get("BENCH_K", 1024))
    length = int(os.environ.get("BENCH_L", 32))
    f, e = 256, 8
    fcfg = FrontendConfig()

    rows = {}

    # -- fft scorer (production hot kernel) ---------------------------
    dt_fft, nfft = _measure_fft(b, t, k, length, f, e)
    cost = CostModel.fft_scores(b, t, k, length, f * e, nfft)
    rows["fft_scorer"] = {
        "shape": {"B": b, "T": t, "K": k, "L": length, "D": f * e,
                  "nfft": nfft},
        **roofline_report(cost, dt_fft),
    }

    # -- frontend (fused waveform -> binary edges) --------------------
    dt_fe, samples = _measure_frontend_dt(b, t, fcfg)
    fr = CostModel.frontend_fused_roofline(
        b, samples, fcfg.frame_length, fcfg.hop_length, fcfg.nfft,
        spread_time=fcfg.spread_time, spread_freq=fcfg.spread_freq,
    )
    rows["frontend"] = {
        "shape": {"B": b, "samples": samples, "nfft": fcfg.nfft},
        "audio_s_per_s": round(b * samples / fcfg.sample_rate / dt_fe, 1),
        **fr,
        "roofline_frac": fr["roofline_s"] / dt_fe,
        "measured_s": dt_fe,
    }

    # -- dtw wavefront kernel -----------------------------------------
    n_dtw, m_dtw, band = 2048, 64, 6
    dt_dtw = _measure_dtw(n_dtw, length, m_dtw, band)
    # DP arithmetic runs on the VPU in f32; the binding resource is the
    # skband HBM stream (see bench_dtw.py), which CostModel.dtw models
    cost = CostModel.dtw(n_dtw, length, m_dtw, band)
    rows["dtw"] = {
        "shape": {"pairs": n_dtw, "L": length, "M": m_dtw, "band": band},
        "pairs_per_s": round(n_dtw / dt_dtw, 1),
        **roofline_report(cost, dt_dtw, peak_flops=PEAK_F32_FLOPS),
    }

    explanations = {
        "fft_scorer": (
            "compute-bound on the MXU; measured fraction counts only "
            "compulsory FLOPs -- the overlap-save formulation already "
            "cut MXU work ~14x vs the direct conv (docs/PERFORMANCE.md)"
        ),
        "frontend": (
            "three-resource roofline (CostModel.frontend_fused_"
            "roofline): the VMEM-resident select kernel removed every "
            "HBM re-read (planes round-trip once, the compulsory "
            "minimum), so the binding resource is now the VPU compute "
            "of the exact dual-rank 32-level bisection itself plus "
            "the exact-f32 DFT GEMM -- not HBM traffic"
        ),
        "dtw": (
            "HBM-stream-bound on the skewed band tensor; sequential "
            "anti-diagonal DP leaves the VPU idle between grid steps "
            "at small band widths"
        ),
    }
    out = {
        "round": 4,
        "device": str(jax.devices()[0]),
        "timing": "slope method (see bench.py docstring)",
        "note": (
            "roofline_frac = binding-roofline seconds / measured "
            "seconds (1.0 = speed of light); cost model counts "
            "compulsory FLOPs/bytes only (ideal fusion)"
        ),
        "kernels": rows,
        "explanations": {
            name: explanations[name]
            for name, row in rows.items()
            if row["roofline_frac"] < 0.5
        },
    }
    with open("ROOFLINE_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k2: round(v["roofline_frac"], 3)
                      for k2, v in rows.items()}))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon PJRT teardown hangs the interpreter at exit


if __name__ == "__main__":
    main()
