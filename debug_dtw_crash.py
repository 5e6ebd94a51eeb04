"""SOAK_DTW crash isolation (round-4 verdict, missing item 1).

The round-5 repro pinned the TPU-worker "kernel fault" to the LAST
fetch group of the scan -- shards 42 (pad=327680, 3 valid rows) and
43 (pad=344064, 1 valid row: corpus utterance 35, the one utterance
in the longest straggler bucket).  Every earlier group -- including
pad=327680 with a FULL batch -- drained clean, so the fault is either
(a) the pad=344064 step shape, which only ever executes in a tail
batch, or (b) tail-batch data at pad=327680.

This script replays the suspects in one process, cheapest first,
printing a stage marker before each; the last marker before a crash
names the culprit.  STAGE env var (comma list) selects stages.

Run: timeout 3600 python debug_dtw_crash.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from bench import _enable_compile_cache
from soak import build_corpus


def main() -> None:
    _enable_compile_cache()
    from template_speech_recognition_tpu.config import (
        DetectConfig,
        DTWConfig,
        MeshConfig,
        PipelineConfig,
    )
    from template_speech_recognition_tpu.parallel import build_mesh
    from template_speech_recognition_tpu.parallel import detect_sharded as ds
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        train_bank,
    )

    stages = os.environ.get("STAGE", "utt35,tail327,full344").split(",")

    corpus = build_corpus(int(os.environ.get("SOAK_UTTS_PER_GROUP", 75)))
    utts = corpus.corpus.utterances
    base = corpus.corpus

    cfg = PipelineConfig(
        detect=DetectConfig(batch_size=8, dtw_rescore=True),
        dtw=DTWConfig(top_r=1),
    )
    mesh = build_mesh(MeshConfig(1, 1, 1))
    t0 = time.perf_counter()
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    print(f"[dbg] bank trained {time.perf_counter()-t0:.1f}s "
          f"(L={bank.template_length})", file=sys.stderr, flush=True)

    def subset(idxs):
        return SyntheticAdapter(
            type(base)([utts[i] for i in idxs], base.sample_rate,
                       base.phone_names)
        )

    def run(name, idxs):
        print(f"[dbg] STAGE {name}: gidx={idxs} "
              f"lens={[len(utts[i].waveform) for i in idxs]}",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = ds.detect_corpus_sharded(subset(idxs), bank, cfg, mesh,
                                       target_phone="aa")
        print(f"[dbg] STAGE {name} OK: {len(out.detections.scores)} "
              f"detections in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

    if "utt35" in stages:
        # the 344064 straggler alone (1 valid row, 7 zero rows)
        run("utt35", [35])
    if "tail327" in stages:
        # the 3-row 327680 tail batch exactly as the soak built it
        run("tail327", [275, 279, 283])
    if "full344" in stages:
        # 8 copies of utterance 35: same shape as utt35 but full batch
        # (distinguishes shape-fault from partial-batch fault)
        run("full344", [35] * 8)
    print("[dbg] all stages survived", file=sys.stderr, flush=True)
    print('{"dtw_crash_isolated": false}')
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
