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

Writes ``ROOFLINE_r05.json``: one row per kernel with {measured_s,
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

    # the lane-packed kernel is now tens of microseconds at this
    # shape, so the slope needs many in-jit iterations to rise above
    # the tunnel's multi-ms noise floor
    t_at = {}
    for r in (8, 64):
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
        for _ in range(10):
            t0 = time.perf_counter()
            float(run(cost, lens))
            times.append(time.perf_counter() - t0)
        t_at[r] = float(np.min(times))
    return max((t_at[64] - t_at[8]) / 56, 1e-9)


def _measure_e2e_dtw_share(b, t, k, length, fcfg):
    """DTW's share of the production e2e step at realistic peak counts
    (round-3 verdict, next item 5: a number, not an adjective).
    Measures the full scan step with and without --dtw-rescore at the
    bench shape and DetectConfig defaults; returns both times and the
    share."""
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.config import DetectConfig, DTWConfig
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank,
    )
    from template_speech_recognition_tpu.pipeline import bucket_length
    from template_speech_recognition_tpu.scan import scan_step

    dcfg = DetectConfig()
    band = DTWConfig().band
    f = fcfg.feature_freqs
    e = fcfg.num_edge_channels
    samples = t * fcfg.hop_length + fcfg.frame_length
    pad = bucket_length(samples)
    top_k = dcfg.effective_top_k(pad, fcfg.sample_rate)

    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(2), 3)
        wavs = jax.random.normal(k0, (b, pad), jnp.float32)
        w = jax.random.normal(k1, (k, length, f, e), jnp.float32)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return wavs, w, c

    wavs, w, c = make_data()
    jax.block_until_ready(wavs)
    bank = build_fft_bank(w, c)
    # per-row filters for the DTW rescoring (same layout the corpus
    # scan builds via bank.llr_rows + filters_to_flat)
    from template_speech_recognition_tpu.ops.layout import filters_to_flat

    w_rows = filters_to_flat(w)
    # production stream-level bf16 copy (scan.detect_corpus_stream
    # does this once per scan for top_r=1)
    w_rows16 = w_rows.astype(jnp.bfloat16)
    c_rows = jnp.zeros((k, length), jnp.float32)
    jax.block_until_ready(bank.w2)
    valid = jnp.full((b,), samples, jnp.int32)
    m_seg = length + band

    out = {}
    for mode in ("off", "exhaustive", "top_r1"):
        use_dtw = mode != "off"
        top_r = 1 if mode == "top_r1" else 0

        wr_arg = w_rows16 if top_r == 1 else w_rows

        def run(wv, vs, bk, wr, cr, use_dtw=use_dtw, top_r=top_r):
            s, tt, kk = scan_step.__wrapped__(
                wv, vs, bk, None, None,
                wr if use_dtw else None, cr if use_dtw else None,
                fcfg=fcfg, backend="fft", template_length=length,
                nms_radius=dcfg.nms_radius, top_k=top_k,
                dtw=use_dtw, m_seg=m_seg if use_dtw else 1,
                band=band if use_dtw else 0, dtw_top_r=top_r,
            )
            return (
                jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0))
                + jnp.sum(tt).astype(jnp.float32)
            )

        out[mode] = _slope_time(
            run, wavs, valid, bank, wr_arg, c_rows, reps=(2, 8)
        )
    share_ex = (out["exhaustive"] - out["off"]) / out["exhaustive"]
    share_r1 = (out["top_r1"] - out["off"]) / out["top_r1"]
    return {
        "e2e_step_s": out["off"],
        "e2e_step_dtw_exhaustive_s": out["exhaustive"],
        "e2e_step_dtw_top_r1_s": out["top_r1"],
        "dtw_share_of_e2e_exhaustive": round(float(max(share_ex, 0.0)), 4),
        "dtw_share_of_e2e_top_r1": round(float(max(share_r1, 0.0)), 4),
        "top_k": top_k,
        "m_seg": m_seg,
        "band": band,
    }


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

    # -- DTW's share of the e2e step (quantified waiver or todo) -------
    rows["dtw_e2e_share"] = _measure_e2e_dtw_share(b, t, k, length, fcfg)

    explanations = {
        "fft_scorer": (
            "compute-bound on the MXU; measured fraction counts only "
            "compulsory FLOPs -- the overlap-save formulation already "
            "cut MXU work ~14x vs the direct conv (docs/PERFORMANCE.md)"
        ),
        "frontend": (
            "four-resource roofline (CostModel.frontend_fused_"
            "roofline): the binding resource is the VMEM load "
            "stream of the exact dual-rank select -- every one of "
            "the 32 bisection levels re-reads the resident u32 "
            "keys, and the measured VMEM bandwidth (2.6 TB/s, "
            "bench_selbin_levels.py) puts that floor at ~1.3 ms at "
            "the bench shape.  The 16-bit key split that would "
            "halve it crashes this toolchain Mosaic compiler "
            "(bench_selbin_levels int16/int8 rows), so this is the "
            "measured stopping point for an exact select"
        ),
        "dtw": (
            "lane-packed wavefront (round 5): 128//lp pairs per VPU "
            "register quadruple DP cells per op at L=32 vs the round-4 "
            "full layout.  Its weight in production is the "
            "dtw_e2e_share row: the measured fraction of the full "
            "scan step that enabling --dtw-rescore adds at the bench "
            "shape and default peak budget: exhaustive rescoring "
            "(every peak x every template) is O(peaks*K) in its cost "
            "GEMM and dwarfs the step at K=1024; DTWConfig.top_r=1 "
            "(verify-the-winner) is the production setting"
        ),
    }
    out = {
        "round": 5,
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
            if name in explanations and row.get("roofline_frac", 0) < 0.5
        },
    }
    with open("ROOFLINE_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k2: round(v["roofline_frac"], 3)
                      for k2, v in rows.items()
                      if "roofline_frac" in v}
                     | {"dtw_share_exhaustive":
                        rows["dtw_e2e_share"][
                            "dtw_share_of_e2e_exhaustive"],
                        "dtw_share_top_r1":
                        rows["dtw_e2e_share"]["dtw_share_of_e2e_top_r1"]}))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon PJRT teardown hangs the interpreter at exit


if __name__ == "__main__":
    main()
