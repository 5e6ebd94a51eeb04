"""Corpus-scale soak of the streaming sharded scan (round-2 verdict,
missing item 8; BASELINE.json:11 "100 h corpus" scaled to a ~1 h
synthetic soak).

Builds a ~1 hour synthetic corpus (hundreds of utterances, four
mixed-length groups), trains a small bank, then runs
``detect_corpus_sharded`` end to end three times on the real chip:

  1. fault run   -- manifest on; an injected fault kills the scan
                    mid-corpus (after ~half the dispatched batches);
  2. resume run  -- same manifest; completed shards load from disk,
                    the rest recompute;
  3. clean run   -- no manifest, warm compile cache: the corpus-level
                    throughput number (counters["audio_s_per_s"]).

Asserts resumed detections == clean detections (bitwise), then writes
``SOAK_r04.json`` with the corpus stats, the kill/resume accounting,
and corpus audio-s/s next to the bench e2e figure for comparison.

Knobs: SOAK_UTTS_PER_GROUP (default 75), SOAK_MESH "d,b,t"
(default "1,1,1": the one real chip; any product matching the
device count works -- a fake-device CPU mesh writes
``SOAK_SHARDED_r05.json``), SOAK_BATCH (utterances per step, default
32: fewer dispatches against the tunnel's fixed per-batch round
trip), SOAK_DTW=1 (config 4 at corpus scale: DTW rescoring with
DTWConfig.top_r=1 verify-the-winner).

Round-4 KNOWN ISSUE resolution (round 5): the SOAK_DTW "TPU worker
crash" was isolated by per-batch scan logging (SCAN_DEBUG=1) +
``debug_dtw_crash.py`` to the straggler tail buckets (pads
327680/344064) that only ever execute as partial tail batches -- the
round-4 exoneration sweeps covered only the four FULL-batch bucket
shapes, so the faulting shapes were never exercised in isolation.
See debug_dtw_crash.py for the stage-by-stage isolation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

from bench import _enable_compile_cache


def build_corpus(utts_per_group: int):
    """Four groups of increasing utterance length (~5/10/14/19 s),
    distinct seeds; interleaved so every batch bucket mixes groups."""
    from oracle.fixtures import make_synthetic_corpus
    from template_speech_recognition_tpu.pipeline import SyntheticAdapter

    groups = []
    for gi, ppu in enumerate((25, 50, 75, 100)):
        groups.append(
            make_synthetic_corpus(
                num_utterances=utts_per_group,
                phones_per_utterance=ppu,
                seed=100 + gi,
            )
        )
    base = groups[0]
    utts = []
    for i in range(utts_per_group):
        for g in groups:
            utts.append(g.utterances[i])
    merged = type(base)(utts, base.sample_rate, base.phone_names)
    return SyntheticAdapter(merged)


def main() -> None:
    _enable_compile_cache()
    from template_speech_recognition_tpu.checkpoint import ScanManifest
    from template_speech_recognition_tpu.config import (
        DetectConfig,
        MeshConfig,
        PipelineConfig,
    )
    from template_speech_recognition_tpu.parallel import build_mesh
    from template_speech_recognition_tpu.parallel import detect_sharded as ds
    from template_speech_recognition_tpu.pipeline import train_bank

    upg = int(os.environ.get("SOAK_UTTS_PER_GROUP", 75))
    mesh_shape = tuple(
        int(x) for x in os.environ.get("SOAK_MESH", "1,1,1").split(",")
    )

    t0 = time.perf_counter()
    corpus = build_corpus(upg)
    n_utts = len(corpus.corpus.utterances)
    audio_s = sum(len(u.waveform) for u in corpus.corpus.utterances) / 16000.0
    print(
        f"[soak] corpus: {n_utts} utts, {audio_s/60:.1f} min audio "
        f"({time.perf_counter()-t0:.1f}s to build)",
        file=sys.stderr,
    )

    use_dtw = os.environ.get("SOAK_DTW", "0") == "1"
    use_int8 = os.environ.get("SOAK_INT8", "0") == "1"
    batch = int(os.environ.get("SOAK_BATCH", 32))
    if use_dtw:
        from template_speech_recognition_tpu.config import DTWConfig

        cfg = PipelineConfig(
            detect=DetectConfig(batch_size=batch, dtw_rescore=True,
                                int8_spectra=use_int8),
            dtw=DTWConfig(top_r=1),
        )
    else:
        cfg = PipelineConfig(
            detect=DetectConfig(batch_size=batch, int8_spectra=use_int8)
        )
    mesh = build_mesh(MeshConfig(*mesh_shape))
    t0 = time.perf_counter()
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    print(f"[soak] bank trained {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    n_clean = int(os.environ.get("SOAK_CLEAN", "0"))
    if n_clean:
        # profiling mode: N clean scans, timed separately -- the first
        # pays any per-shape compiles, the last is the steady state
        walls = []
        for _ in range(n_clean):
            t0 = time.perf_counter()
            ds.detect_corpus_sharded(corpus, bank, cfg, mesh,
                                     target_phone="aa")
            walls.append(round(time.perf_counter() - t0, 1))
        print(json.dumps({
            "clean_walls_s": walls,
            "steady_audio_s_per_s": round(audio_s / walls[-1], 1),
        }))
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    mdir = "/tmp/soak_r03_manifest"
    shutil.rmtree(mdir, ignore_errors=True)

    # -- pass 1: fault mid-corpus -------------------------------------
    calls = {"n": 0}
    real = ds.sharded_scan_step
    # the 1-deep pipeline drains batch i when batch i+1 dispatches, so
    # a fault at batch F leaves F-2 shards recorded
    fault_at = max(n_utts // cfg.detect.batch_size // 2, 3)

    def faulty(*a, **k):
        calls["n"] += 1
        if calls["n"] > fault_at:
            raise RuntimeError("soak: injected fault")
        return real(*a, **k)

    ds.sharded_scan_step = faulty
    t0 = time.perf_counter()
    try:
        ds.detect_corpus_sharded(
            corpus, bank, cfg, mesh, target_phone="aa",
            manifest=ScanManifest(mdir),
        )
        raise SystemExit("fault was never injected")
    except RuntimeError as err:
        if "injected fault" not in str(err):
            raise
    finally:
        ds.sharded_scan_step = real
    t_fault = time.perf_counter() - t0
    shards_done = len(ScanManifest(mdir).completed())
    print(
        f"[soak] killed after batch {fault_at} ({t_fault:.1f}s); "
        f"{shards_done} shards recorded",
        file=sys.stderr,
    )
    assert shards_done >= 1

    # -- pass 2: resume from the manifest -----------------------------
    t0 = time.perf_counter()
    resumed = ds.detect_corpus_sharded(
        corpus, bank, cfg, mesh, target_phone="aa",
        manifest=ScanManifest(mdir),
    )
    t_resume = time.perf_counter() - t0
    print(f"[soak] resume: {t_resume:.1f}s", file=sys.stderr)

    # -- pass 3: clean timed run (warm cache) -------------------------
    t0 = time.perf_counter()
    clean = ds.detect_corpus_sharded(corpus, bank, cfg, mesh,
                                     target_phone="aa")
    t_clean = time.perf_counter() - t0

    r, c = resumed.detections, clean.detections
    np.testing.assert_array_equal(r.scores, c.scores)
    np.testing.assert_array_equal(r.times, c.times)
    np.testing.assert_array_equal(r.template_ids, c.template_ids)
    np.testing.assert_array_equal(r.utterance_ids, c.utterance_ids)

    metrics = None
    from template_speech_recognition_tpu.pipeline import evaluate_detections

    metrics = evaluate_detections(clean, cfg.detect.match_tolerance)

    out = {
        "round": 5,
        "batch_size": batch,
        "fetch_group": int(os.environ.get("SCAN_FETCH_GROUP", "8")),
        "upload_int16": os.environ.get("SCAN_UPLOAD_INT16", "0") == "1",
        "int8_spectra": use_int8,
        "corpus": {
            "utterances": n_utts,
            "audio_seconds": round(audio_s, 1),
            "length_groups_s": "~5/10/14/19",
        },
        "mesh": dict(zip(("data", "bank", "time"), mesh_shape)),
        "dtw_rescore_top_r1": use_dtw,
        "fault_run": {
            "killed_after_batches": fault_at,
            "shards_recorded": shards_done,
            "wall_s": round(t_fault, 1),
        },
        "resume_run": {
            "wall_s": round(t_resume, 1),
            "resume_matches_clean": True,
        },
        "clean_run": {
            "wall_s": round(t_clean, 1),
            "audio_s_per_s": round(clean.counters["audio_s_per_s"], 1),
            "detections": int(len(c.scores)),
            "eer": round(float(metrics["eer"]), 4),
            "best_tpr": round(float(metrics["best_tpr"]), 4),
        },
        "counters": {
            k2: round(float(v), 1) for k2, v in clean.counters.items()
        },
        "note": (
            "clean_run.audio_s_per_s is corpus-level wall-clock "
            "throughput on the single real chip behind the axon "
            "tunnel.  Round-5 tunnel amortization: SOAK_BATCH=32 "
            "quarters the dispatch count and SCAN_FETCH_GROUP=8 "
            "packs 8 batches' (s,t,k) triples into ONE fetched "
            "device array, dividing the fixed per-fetch round trip "
            "by 8 (bitwise-identical results) -- compare BENCH "
            "e2e_audio_s_per_s for the tunnel-free device step rate"
        ),
    }
    if mesh_shape != (1, 1, 1):
        out_name = "SOAK_SHARDED_r05.json"
    else:
        out_name = "SOAK_DTW_r05.json" if use_dtw else "SOAK_r05.json"
        if use_int8:
            out_name = out_name.replace("SOAK_", "SOAK_KITCHEN_")
        elif out["upload_int16"]:
            # PCM16 feeding is lossless only for PCM-sourced audio;
            # on the synthetic FLOAT corpus it perturbs near-threshold
            # edge cells and shifts EER, so its run records separately
            # and never overwrites the canonical f32 artifact
            out_name = out_name.replace("SOAK_", "SOAK_I16_")
    with open(out_name, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"soak_audio_s_per_s": out["clean_run"]["audio_s_per_s"],
                      "audio_min": round(audio_s / 60, 1)}))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon PJRT teardown hangs the interpreter at exit


if __name__ == "__main__":
    main()
