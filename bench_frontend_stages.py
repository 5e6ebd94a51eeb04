"""Stage-by-stage frontend profile on the real chip (round-2 verdict,
missing item 1: "No stage-level frontend profile exists to confirm the
split").  Times each frontend stage in isolation with the slope method
(see bench.py docstring) and prints one JSON line with per-stage
seconds for the standard bench batch (B=8 utterances x 30 s).

Stages:
  frame     preemphasis + framing + window      [B,S] -> [B,T,400]
  edges     fused Pallas DFT+log+diff           frames -> resp [B,T-1,256,8]
  quantile  per-channel threshold               resp -> tau [B,8]
  binarize  resp > tau + row mask               resp -> bool
  spread    3x3 max reduce-window + mask        bool -> bool
  full      frontend_batch end to end
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from bench import _enable_compile_cache, _slope_time


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from template_speech_recognition_tpu.config import FrontendConfig
    from template_speech_recognition_tpu.frontend import frontend_batch
    from template_speech_recognition_tpu.ops import edges, framing
    from template_speech_recognition_tpu.ops.frontend_pallas import (
        edge_responses_pallas,
    )
    from template_speech_recognition_tpu.pipeline import bucket_length

    b = int(os.environ.get("BENCH_B", 8))
    t = int(os.environ.get("BENCH_T", 3000))
    fcfg = FrontendConfig()
    samples = t * fcfg.hop_length + fcfg.frame_length
    pad = bucket_length(samples)
    audio_s = b * samples / fcfg.sample_rate

    @jax.jit
    def make_wavs():
        return jax.random.normal(jax.random.PRNGKey(1), (b, pad), jnp.float32)

    wavs = make_wavs()
    wavs.block_until_ready()
    valid = jnp.full((b,), samples, jnp.int32)

    n_frames = 1 + (pad - fcfg.frame_length) // fcfg.hop_length
    t_pad = ((n_frames + 127) // 128) * 128

    def stage_frame(wv):
        y = jax.vmap(lambda w: framing.preemphasize(w, fcfg.preemphasis))(wv)
        fr = jax.vmap(
            lambda s: framing.frame_signal(s, fcfg.frame_length, fcfg.hop_length)
        )(y)
        fr = fr * framing.hamming_window(fcfg.frame_length)[None, None, :]
        return jnp.sum(fr)

    def make_frames():
        @jax.jit
        def go(wv):
            y = jax.vmap(lambda w: framing.preemphasize(w, fcfg.preemphasis))(wv)
            fr = jax.vmap(
                lambda s: framing.frame_signal(s, fcfg.frame_length, fcfg.hop_length)
            )(y)
            fr = fr * framing.hamming_window(fcfg.frame_length)[None, None, :]
            out = jnp.zeros((b, t_pad, fcfg.frame_length), jnp.float32)
            return out.at[:, :n_frames].set(fr).reshape(b * t_pad, fcfg.frame_length)

        return go(wavs)

    frames_p = make_frames()
    frames_p.block_until_ready()

    def stage_edges(fp):
        resp = edge_responses_pallas(fp, fcfg.nfft)
        return jnp.sum(resp)

    @jax.jit
    def make_resp(fp):
        r = edge_responses_pallas(fp, fcfg.nfft)
        return r.reshape(b, t_pad, fcfg.feature_freqs, 8)[:, : n_frames - 1]

    resp = make_resp(frames_p)
    resp.block_until_ready()
    vf = jnp.full((b,), t - 1, jnp.int32)

    def stage_quantile(r, v):
        tau = jax.vmap(
            lambda rr, vv: edges.quantile_threshold(rr, fcfg.edge_quantile, vv)
        )(r, v)
        return jnp.sum(tau)

    def stage_binarize(r, v):
        bb = jax.vmap(lambda rr, vv: edges.binarize(rr, fcfg.edge_quantile, vv))(
            r, v
        )
        return jnp.sum(bb.astype(jnp.float32))

    @jax.jit
    def make_binary(r, v):
        return jax.vmap(lambda rr, vv: edges.binarize(rr, fcfg.edge_quantile, vv))(
            r, v
        )

    binary = make_binary(resp, vf)
    binary.block_until_ready()

    def stage_spread(bb, v):
        out = jax.vmap(
            lambda x, vv: edges.mask_rows(
                edges.spread_binary(x, fcfg.spread_time, fcfg.spread_freq), vv
            )
        )(bb, v)
        return jnp.sum(out.astype(jnp.float32))

    def stage_full(wv, vs):
        fm = frontend_batch(wv, vs, fcfg)
        return jnp.sum(fm.binary.astype(jnp.float32))

    results = {}
    for name, fn, args in [
        ("frame", stage_frame, (wavs,)),
        ("edges", stage_edges, (frames_p,)),
        ("quantile", stage_quantile, (resp, vf)),
        ("binarize", stage_binarize, (resp, vf)),
        ("spread", stage_spread, (binary.astype(jnp.float32), vf)),
        ("full", stage_full, (wavs, valid)),
    ]:
        # spread takes a float input so the +eps perturbation in
        # _slope_time type-checks; cast back inside.
        if name == "spread":
            f0 = fn

            def fn(x, v):
                return f0(x > 0.5, v)

        t0 = time.perf_counter()
        dt = _slope_time(fn, *args, reps=(2, 8))
        print(
            f"[stage] {name}: {dt*1e3:.2f} ms "
            f"({audio_s/dt:.0f} audio-s/s) "
            f"[wall {time.perf_counter()-t0:.0f}s]",
            file=sys.stderr,
        )
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "audio_s_per_s": round(audio_s / dt, 1),
        }

    print(json.dumps({
        "metric": "frontend_stage_profile",
        "batch_utts": b,
        "frames_per_utt": t,
        "audio_seconds": round(audio_s, 1),
        "stages": results,
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
