"""Benchmark: audio-seconds/s per chip for template-bank scoring.

Primary metric (BASELINE.json:2): how many seconds of audio one chip
scores per wall-clock second against a K-template bank, vs the CPU
NumPy oracle on the same workload ("vs_baseline"; target >= 100x,
BASELINE.json:5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_seconds_per_second",
   "vs_baseline": N, ...extras}

Workload: B utterances x T frames of binary edge features
([T, F=256, E=8] -> D=2048 channels), K templates of length L.
Default backend is the frequency-domain scorer
(``detect.fft_scorer``): ~14x less MXU work than the direct conv;
BENCH_BACKEND=conv|pallas|fft selects others.  The per-bank spectra
build is one-time setup (like the LLR filter build) and is excluded,
exactly as the filter build is excluded from the conv path.

Timing methodology: the tunneled PJRT on this machine adds a ~23 ms
round trip to every host readback AND returns early from
block_until_ready, so single-call timing is wrong in both directions.
We therefore run the scorer R times inside one jit (inputs perturbed
per step so XLA cannot hoist the work) for R in {4, 16} and take the
slope (t16 - t4) / 12 of the per-R minima -- the constant round trip
cancels and tunnel stalls (which only ever add time) drop out.

The CPU oracle runs ``oracle.score.sliding_score`` (float32 BLAS) on a
scaled-down slice, extrapolated linearly in (K * T * B) -- both are
dense GEMM-shaped workloads, so linear extrapolation favors the CPU if
anything.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent on-disk compilation cache: repeat bench runs (fresh
    processes) skip the remote TPU compile."""
    from template_speech_recognition_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()


def _slope_time(score_batch, feats, *operands, iters=8, reps=(4, 16)):
    """Per-call seconds of ``score_batch(feats, *operands)`` by the
    slope method (see module docstring).  Large arrays (bank spectra,
    filters) MUST be passed as ``operands``, never closed over --
    closure arrays become jit constants and a ~1 GB HLO literal stalls
    the compiler indefinitely."""
    import jax
    import jax.numpy as jnp

    def make(r):
        @jax.jit
        def run(x0, *rest):
            eps = (jnp.arange(1, r + 1, dtype=jnp.float32) * 1e-6).astype(
                x0.dtype
            )

            def body(acc, e):
                return acc + score_batch(x0 + e, *rest), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), eps)
            return acc

        return run

    t_at = {}
    for r in reps:
        fn = make(r)
        t0 = time.perf_counter()
        float(fn(feats, *operands))  # compile + warmup (host read forces completion)
        print(
            f"[bench] compile+warmup r={r}: {time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(feats, *operands))
            times.append(time.perf_counter() - t0)
        # min, not median: host/tunnel stalls only ever ADD time, so the
        # fastest observation is the cleanest one at each R.
        t_at[r] = float(np.min(times))
    return (t_at[reps[1]] - t_at[reps[0]]) / (reps[1] - reps[0])


def _measure_tpu(shape, backend="fft"):
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.detect.scorer import (
        sliding_scores_backend,
    )

    b, t, k, length, f, e = shape

    # Generate the workload ON DEVICE: host->device staging of ~1 GB of
    # random tensors dominates wall time on the tunneled PJRT.
    @jax.jit
    def make_data():
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        feats = jax.random.bernoulli(k0, 0.15, (b, t, f, e)).astype(jnp.bfloat16)
        w = jax.random.normal(k1, (k, length, f, e), jnp.bfloat16)
        c = jax.random.normal(k2, (k,), jnp.float32)
        return feats, w, c

    t0 = time.perf_counter()
    fj, wj, cj = make_data()
    fj.block_until_ready()
    print(f"[bench] make_data {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    if backend == "fft":
        from template_speech_recognition_tpu.detect.fft_scorer import (
            build_fft_bank,
            fft_sliding_scores,
        )

        bank = build_fft_bank(wj, cj)  # one-time per-bank setup
        jax.block_until_ready(bank.w2)

        # canonical [B, T, D] feature layout (what the frontend emits
        # batched); avoids a parameter relayout inside the timed step
        fj = jax.jit(lambda a: a.reshape(b, t, f * e))(fj)
        fj.block_until_ready()

        def score_batch(fb, bk):
            # time_major + trim=False: the fused epilogue's native
            # layout (NMS and masking consume it directly in
            # production -- no transpose or tail-trim round trip
            # exists anywhere in the scoring path)
            return jnp.sum(
                fft_sliding_scores(fb, bk, time_major=True, trim=False)
            )

        return _slope_time(score_batch, fj, bank)

    def score_batch(fb, w, c):
        out = jax.vmap(
            lambda x: sliding_scores_backend(x, w, c, backend=backend)
        )(fb)
        return jnp.sum(out)

    return _slope_time(score_batch, fj, wj, cj)


def _measure_frontend(b, t, fcfg):
    """Frontend-only audio-s/s: padded waveforms -> flat binary edge
    maps (the shared prefix of every flow, SURVEY.md section 3.4).
    Measures ``frontend_batch_flat`` -- the exact call the streaming
    scans make (``scan.scan_step``); the classic-layout wrapper's
    relayout is not part of any hot path.  Slope timing; waveforms
    generated on device."""
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.frontend import frontend_batch_flat

    samples = t * fcfg.hop_length + fcfg.frame_length
    from template_speech_recognition_tpu.pipeline import bucket_length

    pad = bucket_length(samples)

    @jax.jit
    def make_wavs():
        return jax.random.normal(jax.random.PRNGKey(1), (b, pad), jnp.float32)

    wavs = make_wavs()
    wavs.block_until_ready()
    valid = jnp.full((b,), samples, jnp.int32)

    def run(wv, vs):
        fm = frontend_batch_flat(wv, vs, fcfg)
        return jnp.sum(fm.binary.astype(jnp.float32))

    dt = _slope_time(run, wavs, valid, reps=(2, 8))
    return (b * samples / fcfg.sample_rate) / dt


def _measure_e2e(b, t, k, length, fcfg, dcfg):
    """End-to-end waveform -> detections audio-s/s: the full production
    scan step (``scan.scan_step`` body: frontend_batch -> fused FFT
    scoring -> masking -> batched NMS/top-K) slope-timed as one jit.
    This is the number that bounds real corpus-scan throughput
    (round-1 verdict, missing item 3)."""
    import jax
    import jax.numpy as jnp
    from template_speech_recognition_tpu.detect.fft_scorer import (
        build_fft_bank,
    )
    from template_speech_recognition_tpu.pipeline import bucket_length
    from template_speech_recognition_tpu.scan import (
        batched_top_detections,
        scan_step,
    )
    from template_speech_recognition_tpu.frontend import frontend_batch

    f = fcfg.feature_freqs
    e = fcfg.num_edge_channels
    samples = t * fcfg.hop_length + fcfg.frame_length
    pad = bucket_length(samples)

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
    jax.block_until_ready(bank.w2)
    valid = jnp.full((b,), samples, jnp.int32)

    def run(wv, vs, bk):
        s, tt, kk = scan_step.__wrapped__(
            wv, vs, bk, None, None, None, None,
            fcfg=fcfg, backend="fft", template_length=length,
            nms_radius=dcfg.nms_radius, top_k=dcfg.top_k,
            dtw=False, m_seg=1, band=0,
        )
        return (
            jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0))
            + jnp.sum(tt).astype(jnp.float32)
            + jnp.sum(kk).astype(jnp.float32)
        )

    dt = _slope_time(run, wavs, valid, bank, reps=(2, 8))
    return (b * samples / fcfg.sample_rate) / dt


def _measure_cpu_oracle(feats, w, c, k_small=8, t_small=400, b_small=1):
    from oracle.score import sliding_score

    f_slice = feats[:b_small, :t_small].astype(np.float32)
    w_slice = w[:k_small]
    c_slice = c[:k_small]
    # warmup
    sliding_score(f_slice[0], w_slice, c_slice)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        for b in range(b_small):
            sliding_score(f_slice[b], w_slice, c_slice)
    dt_small = (time.perf_counter() - t0) / reps
    scale = (
        (feats.shape[0] / b_small)
        * (feats.shape[1] / t_small)
        * (w.shape[0] / k_small)
    )
    return dt_small * scale


def main() -> None:
    _enable_compile_cache()
    b = int(os.environ.get("BENCH_B", 8))
    t = int(os.environ.get("BENCH_T", 3000))          # 30 s of audio each
    k = int(os.environ.get("BENCH_K", 1024))
    length = int(os.environ.get("BENCH_L", 32))
    f, e = 256, 8
    hop_seconds = 0.010                               # 10 ms hop
    audio_seconds = b * t * hop_seconds

    backend = os.environ.get("BENCH_BACKEND", "fft")
    dt_tpu = _measure_tpu((b, t, k, length, f, e), backend=backend)
    tpu_throughput = audio_seconds / dt_tpu

    # Frontend-only and end-to-end (waveform -> detections) numbers at
    # the same shape: the e2e figure bounds real corpus-scan throughput
    # (round-1 verdict items 2-3).  BENCH_E2E=0 skips them.
    frontend_tput = e2e_tput = None
    if os.environ.get("BENCH_E2E", "1") != "0":
        from template_speech_recognition_tpu.config import (
            DetectConfig,
            FrontendConfig,
        )

        fcfg = FrontendConfig()  # nfft=512 -> F=256: same D as above
        dcfg = DetectConfig()
        frontend_tput = _measure_frontend(b, t, fcfg)
        e2e_tput = _measure_e2e(b, t, k, length, fcfg, dcfg)

    # CPU oracle gets its own (distribution-identical) host-side data;
    # it measures throughput, not numerical parity.
    rng = np.random.default_rng(0)
    feats = (rng.random((b, t, f, e)) < 0.15).astype(np.float32)
    w = rng.standard_normal((k, length, f, e)).astype(np.float32)
    c = rng.standard_normal((k,)).astype(np.float32)
    dt_cpu = _measure_cpu_oracle(feats, w, c)
    cpu_throughput = audio_seconds / dt_cpu

    flops = 2.0 * b * t * k * length * f * e
    result = {
        "metric": "audio_seconds_per_s_per_chip_template_scoring",
        "value": round(tpu_throughput, 1),
        "unit": "audio_seconds_per_second",
        "vs_baseline": round(tpu_throughput / cpu_throughput, 1),
        "bank_k": k,
        "template_len": length,
        "batch_utts": b,
        "frames_per_utt": t,
        "tpu_step_ms": round(dt_tpu * 1e3, 2),
        "tpu_effective_tflops": round(flops / dt_tpu / 1e12, 1),
        "cpu_oracle_audio_s_per_s": round(cpu_throughput, 2),
        "backend": backend,
        "timing": "slope(r4,r16,min)",
    }
    if e2e_tput is not None:
        result["e2e_audio_s_per_s"] = round(e2e_tput, 1)
        result["e2e_frac_of_kernel"] = round(e2e_tput / tpu_throughput, 3)
        result["frontend_audio_s_per_s"] = round(frontend_tput, 1)
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon PJRT teardown hangs the interpreter at exit


if __name__ == "__main__":
    main()
