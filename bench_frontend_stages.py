"""Stage-by-stage frontend profile on the real chip.

Profiles the PRODUCTION plane-major frontend (frontend.planes
.frontend_batch_flat -- the two-kernel hot path) with the slope method
(see bench.py docstring) and prints one JSON line with per-stage
seconds for the standard bench batch (B=8 utterances x 30 s).

Stages:
  frames        preemphasis + framing + window   [B,S] -> [B,T,400]
  resp_stacked  fused DFT+log+diff kernel        frames -> [4, B*T, F]
  selbin        resident select+binarize+spread  planes -> flat u8 map
  full          frontend_batch_flat end to end (the production entry)

History: the round-3 version of this harness profiled the classic
channels-minor path (edges/quantile/binarize/spread as separate XLA
stages); that layout is no longer on any hot path -- see
docs/PERFORMANCE.md for the redesign.
"""

from __future__ import annotations

import json
import os
import sys

from bench import _enable_compile_cache, _slope_time


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from template_speech_recognition_tpu.config import FrontendConfig
    from template_speech_recognition_tpu.frontend import planes as P
    from template_speech_recognition_tpu.ops.frontend_pallas import (
        edge_response_planes_stacked_pallas,
    )
    from template_speech_recognition_tpu.ops.selbin_pallas import (
        select_binspread_pallas,
    )
    from template_speech_recognition_tpu.pipeline import bucket_length

    b = int(os.environ.get("BENCH_B", 8))
    t = int(os.environ.get("BENCH_T", 3000))
    fcfg = FrontendConfig()
    samples = t * fcfg.hop_length + fcfg.frame_length
    pad = bucket_length(samples)
    audio_s = b * samples / fcfg.sample_rate
    f = fcfg.feature_freqs

    @jax.jit
    def make_wavs():
        return jax.random.normal(jax.random.PRNGKey(1), (b, pad), jnp.float32)

    wavs = make_wavs()
    wavs.block_until_ready()
    valid = jnp.full((b,), samples, jnp.int32)
    valid_frames = jnp.where(
        valid >= fcfg.frame_length,
        (valid - fcfg.frame_length) // fcfg.hop_length, 0,
    ).astype(jnp.int32)

    def stage_frames(wv):
        return jnp.sum(P._windowed_frames(wv, fcfg))

    dt_frames = _slope_time(stage_frames, wavs, reps=(2, 8))

    frames = jax.jit(lambda wv: P._windowed_frames(wv, fcfg))(wavs)
    frames.block_until_ready()
    bb, tt = frames.shape[0], frames.shape[1]
    t_pad = ((tt + 127) // 128) * 128
    fp = (
        jnp.zeros((bb, t_pad, fcfg.frame_length), jnp.float32)
        .at[:, :tt].set(frames)
        .reshape(bb * t_pad, fcfg.frame_length)
    )

    def stage_resp(x):
        return jnp.sum(edge_response_planes_stacked_pallas(
            x, fcfg.nfft, sample_rate=fcfg.sample_rate, n_mels=0
        ))

    dt_resp = _slope_time(stage_resp, fp, reps=(2, 8))

    stacked = jax.jit(
        lambda x: edge_response_planes_stacked_pallas(
            x, fcfg.nfft, sample_rate=fcfg.sample_rate, n_mels=0
        )
    )(fp)
    stacked.block_until_ready()
    planes4 = stacked.reshape(4, bb, t_pad, f)
    need = P._dual_ranks(valid_frames, f, fcfg.edge_quantile)

    def stage_selbin(p4):
        fl, keys = select_binspread_pallas(
            p4, need, valid_frames, fcfg.spread_freq, fcfg.spread_time
        )
        return jnp.sum(fl.astype(jnp.int32)) + jnp.sum(
            keys.astype(jnp.int32)
        )

    dt_selbin = _slope_time(stage_selbin, planes4, reps=(2, 8))

    def stage_full(wv):
        fm = P.frontend_batch_flat(wv, valid, fcfg)
        return jnp.sum(fm.binary.astype(jnp.int32))

    dt_full = _slope_time(stage_full, wavs, reps=(2, 8))

    print(json.dumps({
        "frames_s": dt_frames,
        "resp_stacked_s": dt_resp,
        "selbin_s": dt_selbin,
        "full_s": dt_full,
        "audio_s_per_call": audio_s,
        "frontend_audio_s_per_s": round(audio_s / dt_full, 1),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
