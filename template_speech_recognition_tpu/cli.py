"""CLI entry points: train / detect / evaluate / classify / bench.

The reference had no CLI -- every experiment was a hardcoded script
(SURVEY.md section 5 "Config / flag system").  Here one binary drives
the pipelines of ``pipeline.py`` from a JSON config plus flag
overrides:

    python -m template_speech_recognition_tpu train \
        --corpus synthetic --phones aa,iy --bank /tmp/bank
    python -m template_speech_recognition_tpu detect \
        --corpus synthetic --bank /tmp/bank --phone aa --out /tmp/dets
    python -m template_speech_recognition_tpu evaluate \
        --corpus synthetic --bank /tmp/bank --phone aa
    python -m template_speech_recognition_tpu classify \
        --corpus synthetic --bank /tmp/bank --phone aa [--dtw]
    python -m template_speech_recognition_tpu bench

``--corpus synthetic`` builds the deterministic in-memory fixture
corpus; ``--corpus timit:<root>`` reads a TIMIT tree.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _build_corpus(spec: str, seed: int):
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        TimitAdapter,
    )

    if spec == "synthetic":
        from oracle.fixtures import make_synthetic_corpus

        return SyntheticAdapter(
            make_synthetic_corpus(
                num_utterances=6, phones_per_utterance=5, seed=seed
            )
        )
    if spec.startswith("timit:"):
        from template_speech_recognition_tpu.io.corpus import TimitCorpus

        return TimitAdapter(TimitCorpus(spec.split(":", 1)[1]))
    raise SystemExit(f"unknown corpus spec {spec!r} (synthetic | timit:<root>)")


def _load_config(args):
    from template_speech_recognition_tpu import config as C

    if args.config:
        with open(args.config) as f:
            cfg = C.from_json(f.read())
    else:
        cfg = C.PipelineConfig()
    if getattr(args, "components", None):
        cfg = C.override(
            cfg, template=C.override(cfg.template, num_components=args.components)
        )
    if getattr(args, "dtw_rescore", False):
        cfg = C.override(
            cfg, detect=C.override(cfg.detect, dtw_rescore=True)
        )
    if getattr(args, "dtw_top_r", None) is not None:
        cfg = C.override(
            cfg, dtw=C.override(cfg.dtw, top_r=args.dtw_top_r)
        )
    if getattr(args, "exact", False):
        cfg = C.override(
            cfg, detect=C.override(cfg.detect, exact_scores=True)
        )
    if getattr(args, "score_backend", None):
        cfg = C.override(
            cfg, detect=C.override(cfg.detect, score_backend=args.score_backend)
        )
    if getattr(args, "int8_spectra", False):
        cfg = C.override(
            cfg, detect=C.override(cfg.detect, int8_spectra=True)
        )
    if getattr(args, "parts", 0):
        cfg = C.override(
            cfg, parts=C.override(cfg.parts, enabled=True,
                                  num_parts=args.parts)
        )
    return cfg


def _save_bank(path: str, bank) -> None:
    from template_speech_recognition_tpu.checkpoint import save_bank

    save_bank(path, bank)


def _load_bank(path: str):
    from template_speech_recognition_tpu.checkpoint import restore_bank

    return restore_bank(path)


def cmd_train(args) -> int:
    from template_speech_recognition_tpu.pipeline import train_bank

    cfg = _load_config(args)
    corpus = _build_corpus(args.corpus, args.seed)
    phones = args.phones.split(",")
    bank = train_bank(corpus, phones, cfg)
    _save_bank(args.bank, bank)
    print(
        json.dumps(
            {
                "trained": phones,
                "num_templates": bank.num_templates,
                "template_length": bank.template_length,
                "bank": args.bank,
            }
        )
    )
    return 0


def cmd_detect(args) -> int:
    from template_speech_recognition_tpu.pipeline import detect_corpus

    cfg = _load_config(args)
    corpus = _build_corpus(args.corpus, args.seed)
    bank = _load_bank(args.bank)
    manifest = None
    if getattr(args, "manifest", None):
        from template_speech_recognition_tpu.checkpoint import ScanManifest

        manifest = ScanManifest(args.manifest)
    result = detect_corpus(
        corpus, bank, cfg, target_phone=args.phone, manifest=manifest
    )
    d = result.detections
    if args.out:
        np.savez(
            args.out,
            scores=d.scores,
            times=d.times,
            template_ids=d.template_ids,
            utterance_ids=d.utterance_ids,
        )
    print(
        json.dumps(
            {
                "num_detections": int(len(d.scores)),
                "audio_seconds": round(result.audio_seconds, 2),
                "audio_s_per_s": round(result.counters.get("audio_s_per_s", 0.0), 2),
                "out": args.out,
            }
        )
    )
    return 0


def cmd_evaluate(args) -> int:
    import os

    from template_speech_recognition_tpu.pipeline import (
        detect_corpus,
        evaluate_detections,
    )

    cfg = _load_config(args)
    corpus = _build_corpus(args.corpus, args.seed)
    bank = _load_bank(args.bank)
    manifest = None
    if getattr(args, "manifest", None):
        from template_speech_recognition_tpu.checkpoint import ScanManifest

        manifest = ScanManifest(args.manifest)
    result = detect_corpus(
        corpus, bank, cfg, target_phone=args.phone, manifest=manifest
    )
    metrics = evaluate_detections(result, cfg.detect.match_tolerance)
    summary = {
        "phone": args.phone,
        "eer": round(float(metrics["eer"]), 4),
        "best_tpr": round(float(metrics["best_tpr"]), 4),
        "num_labels": int(metrics["num_labels"]),
        "num_detections": int(metrics["num_detections"]),
    }
    if getattr(args, "artifacts", None):
        # ROC/EER emitted as artifacts (SURVEY.md section 5 metrics
        # row): full curve arrays as npz + the summary/counters as JSON.
        os.makedirs(args.artifacts, exist_ok=True)
        np.savez(
            os.path.join(args.artifacts, "roc.npz"),
            thresholds=metrics["thresholds"],
            tpr=metrics["tpr"],
            fp_per_sec=metrics["fp_per_sec"],
            eer=np.float64(metrics["eer"]),
        )
        d = result.detections
        np.savez(
            os.path.join(args.artifacts, "detections.npz"),
            scores=d.scores, times=d.times,
            template_ids=d.template_ids, utterance_ids=d.utterance_ids,
        )
        with open(os.path.join(args.artifacts, "metrics.json"), "w") as f:
            json.dump({**summary, "counters": result.counters}, f, indent=2)
        summary["artifacts"] = args.artifacts
    if getattr(args, "tensorboard", None):
        # Optional tensorboard scalars (torch's SummaryWriter; torch is
        # a baked-in dependency of this image, but stay soft anyway).
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as exc:  # pragma: no cover - env without torch
            print(f"tensorboard unavailable: {exc}", file=sys.stderr)
        else:
            tw = SummaryWriter(args.tensorboard)
            tw.add_scalar("eval/eer", float(metrics["eer"]))
            tw.add_scalar("eval/best_tpr", float(metrics["best_tpr"]))
            tw.add_scalar(
                "eval/audio_s_per_s",
                float(result.counters.get("audio_s_per_s", 0.0)),
            )
            for i in range(len(metrics["tpr"])):
                tw.add_scalar("roc/tpr", float(metrics["tpr"][i]), i)
                tw.add_scalar(
                    "roc/fp_per_sec", float(metrics["fp_per_sec"][i]), i
                )
            tw.close()
            summary["tensorboard"] = args.tensorboard
    print(json.dumps(summary))
    return 0


def cmd_classify(args) -> int:
    """Isolated-segment classification over labeled spans of the corpus."""
    import jax.numpy as jnp

    from template_speech_recognition_tpu.detect.classify import (
        classify_segments,
        pad_segments,
    )
    from template_speech_recognition_tpu.frontend import frontend as run_frontend
    from template_speech_recognition_tpu.pipeline import bucket_length

    cfg = _load_config(args)
    corpus = _build_corpus(args.corpus, args.seed)
    bank = _load_bank(args.bank)
    classes = sorted(set(bank.labels))
    min_samples = cfg.frontend.frame_length + 3 * cfg.frontend.hop_length
    clips = []
    for _utt_id, wav, phones in corpus.iter_utterances():
        for phone, s0, e0 in phones:
            if phone in classes and (e0 - s0) >= min_samples:
                clips.append((phone, wav[s0:e0]))
    if not clips:
        raise SystemExit("no scoreable segments found")
    # Shared padded shape -> one frontend compile for all segments.
    pad = bucket_length(max(len(c) for _, c in clips), quantum=4096)
    segs, truth = [], []
    for phone, clip in clips:
        buf = np.zeros(pad, np.float32)
        buf[: len(clip)] = clip
        fm = run_frontend(jnp.asarray(buf), jnp.int32(len(clip)), cfg.frontend)
        vf = int(fm.valid_frames)
        feat_map = fm.binary
        if bank.parts is not None:
            from template_speech_recognition_tpu.models.parts import code_parts

            pcfg = cfg.parts
            feat_map = code_parts(
                feat_map.astype(jnp.float32), bank.parts,
                pcfg.loglik_threshold, pcfg.stride_time, pcfg.stride_freq,
            )
            vf = max((vf - pcfg.patch_time) // pcfg.stride_time + 1, 0)
        if vf < 1:
            continue
        segs.append(np.asarray(feat_map)[:vf].astype(np.float32))
        truth.append(phone)
    if not segs:
        raise SystemExit("no scoreable segments found")
    batch, lens = pad_segments(segs)
    preds, _ = classify_segments(
        batch, lens, bank, use_dtw=args.dtw, band=cfg.dtw.band
    )
    acc = float(np.mean([p == t for p, t in zip(preds, truth)]))
    print(
        json.dumps(
            {
                "num_segments": len(segs),
                "accuracy": round(acc, 4),
                "classes": classes,
                "dtw": bool(args.dtw),
            }
        )
    )
    return 0


def cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(args.bench_script, run_name="__main__")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="template_speech_recognition_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--corpus", default="synthetic",
                        help="synthetic | timit:<root>")
        sp.add_argument("--config", default=None, help="JSON PipelineConfig")
        sp.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("train", help="train a template bank (config 3)")
    common(t)
    t.add_argument("--phones", required=True, help="comma-separated classes")
    t.add_argument("--bank", required=True, help="output bank directory")
    t.add_argument("--components", type=int, default=None,
                   help="mixture components per class")
    t.add_argument("--parts", type=int, default=0,
                   help="build the bank over N-part coded features")
    t.set_defaults(fn=cmd_train)

    d = sub.add_parser("detect", help="scan a corpus (configs 1-2)")
    common(d)
    d.add_argument("--bank", required=True)
    d.add_argument("--phone", required=True, help="target phone for labels")
    d.add_argument("--out", default=None, help="detections .npz path")
    d.add_argument("--dtw-top-r", type=int, default=None,
                   help="DTW rescore scope: 0 exhaustive (default), 1 "
                        "verify-the-winner (constant in bank size)")
    d.add_argument("--dtw-rescore", action="store_true",
                   help="config 4: DTW-rescore the top-K peaks")
    d.add_argument("--int8-spectra", action="store_true",
                   help="int8-quantized template spectra (config-5 "
                        "bank scale; half the HBM stream)")
    d.add_argument("--exact", action="store_true",
                   help="int32 fixed-point scoring (bit-parity path)")
    d.add_argument("--score-backend", default=None,
                   choices=["conv", "fft", "pallas"],
                   help="scoring kernel (fft = frequency-domain fast path)")
    d.add_argument("--manifest", default=None,
                   help="scan-manifest directory: crash-tolerant "
                        "resumable corpus scan")
    d.set_defaults(fn=cmd_detect)

    e = sub.add_parser("evaluate", help="ROC / EER over a corpus scan")
    common(e)
    e.add_argument("--bank", required=True)
    e.add_argument("--phone", required=True)
    e.add_argument("--dtw-rescore", action="store_true",
                   help="config 4: DTW-rescore the top-K peaks")
    e.add_argument("--score-backend", default=None,
                   choices=["conv", "fft", "pallas"],
                   help="scoring kernel (fft = frequency-domain fast path)")
    e.add_argument("--exact", action="store_true",
                   help="int32 fixed-point scoring (bit-parity path)")
    e.add_argument("--artifacts", default=None,
                   help="directory for roc.npz / detections.npz / "
                        "metrics.json artifacts")
    e.add_argument("--tensorboard", default=None,
                   help="directory for tensorboard scalars (ROC, EER)")
    e.add_argument("--manifest", default=None,
                   help="scan-manifest directory: crash-tolerant "
                        "resumable corpus scan")
    e.set_defaults(fn=cmd_evaluate)

    c = sub.add_parser("classify", help="isolated-segment classification")
    common(c)
    c.add_argument("--bank", required=True)
    c.add_argument("--phone", default=None, help="unused; kept for symmetry")
    c.add_argument("--dtw", action="store_true", help="DTW-aligned scoring")
    c.set_defaults(fn=cmd_classify)

    b = sub.add_parser("bench", help="run the scoring benchmark")
    b.add_argument("--bench-script", default="bench.py")
    b.set_defaults(fn=cmd_bench)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # Persistent compile cache: on the tunneled axon stack a fresh
    # process otherwise pays 20-65 s per jitted shape (several minutes
    # for the fused frontend) on every real evaluate/detect run.
    from template_speech_recognition_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
