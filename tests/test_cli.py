"""End-to-end CLI tests on the synthetic corpus (CPU backend)."""

import json

import numpy as np

from template_speech_recognition_tpu.cli import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


def test_train_detect_evaluate_classify_roundtrip(tmp_path, capsys):
    bank = str(tmp_path / "bank")
    res = _run(capsys, [
        "train", "--corpus", "synthetic", "--phones", "aa,iy", "--bank", bank,
    ])
    assert res["num_templates"] >= 2 and res["template_length"] > 0

    dets = str(tmp_path / "dets.npz")
    res = _run(capsys, [
        "detect", "--corpus", "synthetic", "--bank", bank,
        "--phone", "aa", "--out", dets,
    ])
    assert res["num_detections"] > 0
    z = np.load(dets)
    assert set(z.files) >= {"scores", "times", "template_ids", "utterance_ids"}
    assert len(z["scores"]) == res["num_detections"]

    res = _run(capsys, [
        "evaluate", "--corpus", "synthetic", "--bank", bank, "--phone", "aa",
    ])
    assert res["num_labels"] > 0
    assert 0.0 <= res["eer"] <= 1.0
    # The synthetic phones are strongly separable; detection must work.
    assert res["best_tpr"] > 0.5

    res = _run(capsys, [
        "classify", "--corpus", "synthetic", "--bank", bank,
    ])
    assert res["num_segments"] > 0
    assert res["classes"] == ["aa", "iy"]
    assert res["accuracy"] > 0.6


def test_exact_int_scoring_path(tmp_path, capsys):
    """--exact routes detection through int32 fixed-point scoring:
    deterministic, bit-reproducible, and detections still land."""
    bank = str(tmp_path / "bank")
    _run(capsys, [
        "train", "--corpus", "synthetic", "--phones", "aa,iy", "--bank", bank,
    ])
    r1 = _run(capsys, [
        "evaluate", "--corpus", "synthetic", "--bank", bank,
        "--phone", "aa", "--exact",
    ])
    r2 = _run(capsys, [
        "evaluate", "--corpus", "synthetic", "--bank", bank,
        "--phone", "aa", "--exact",
    ])
    assert r1 == r2                       # bit-reproducible end to end
    assert r1["num_detections"] > 0
    assert r1["best_tpr"] > 0.5


def test_cli_unknown_corpus_fails_cleanly(tmp_path, capsys):
    import pytest

    with pytest.raises(SystemExit):
        main(["train", "--corpus", "nope", "--phones", "aa", "--bank",
              str(tmp_path / "b")])


def test_parts_bank_train_detect_evaluate(tmp_path, capsys):
    """L5 end-to-end: bank over part-coded features detects the phone."""
    bank = str(tmp_path / "pbank")
    res = _run(capsys, [
        "train", "--corpus", "synthetic", "--phones", "aa,iy",
        "--bank", bank, "--parts", "8",
    ])
    assert res["num_templates"] >= 2
    res = _run(capsys, [
        "evaluate", "--corpus", "synthetic", "--bank", bank, "--phone", "aa",
    ])
    assert res["num_detections"] > 0
    assert res["best_tpr"] > 0.5


def test_classify_with_parts_bank(tmp_path, capsys):
    bank = str(tmp_path / "pbank2")
    _run(capsys, [
        "train", "--corpus", "synthetic", "--phones", "aa,iy",
        "--bank", bank, "--parts", "8",
    ])
    res = _run(capsys, ["classify", "--corpus", "synthetic", "--bank", bank])
    assert res["num_segments"] > 0
    assert res["accuracy"] > 0.5


def test_evaluate_artifacts(tmp_path, capsys):
    """--artifacts writes roc.npz / detections.npz / metrics.json
    (SURVEY.md section 5 metrics row)."""
    import json as _json

    import numpy as _np

    from template_speech_recognition_tpu.cli import main

    bank_dir = str(tmp_path / "bank")
    art_dir = str(tmp_path / "artifacts")
    assert main(["train", "--corpus", "synthetic", "--phones", "aa",
                 "--bank", bank_dir]) == 0
    capsys.readouterr()
    assert main(["evaluate", "--corpus", "synthetic", "--bank", bank_dir,
                 "--phone", "aa", "--artifacts", art_dir,
                 "--manifest", str(tmp_path / "scanman")]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["artifacts"] == art_dir
    z = _np.load(art_dir + "/roc.npz")
    assert {"thresholds", "tpr", "fp_per_sec", "eer"} <= set(z.files)
    assert len(z["tpr"]) == len(z["fp_per_sec"]) > 0
    m = _json.loads(open(art_dir + "/metrics.json").read())
    assert m["eer"] == out["eer"]
    assert "counters" in m
    d = _np.load(art_dir + "/detections.npz")
    assert len(d["scores"]) == out["num_detections"]
    # the manifest recorded the scan
    from template_speech_recognition_tpu.checkpoint import ScanManifest

    assert len(ScanManifest(str(tmp_path / "scanman")).completed()) >= 1
