"""Config 5 e2e: sharded corpus scan == single-device scan."""

import numpy as np
import pytest

from oracle.fixtures import make_synthetic_corpus
from template_speech_recognition_tpu.config import MeshConfig, PipelineConfig
from template_speech_recognition_tpu.parallel import build_mesh
from template_speech_recognition_tpu.parallel.detect_sharded import (
    detect_corpus_sharded,
)
from template_speech_recognition_tpu.pipeline import (
    SyntheticAdapter,
    detect_corpus,
    evaluate_detections,
    train_bank,
)


@pytest.fixture(scope="module")
def setup():
    corpus = SyntheticAdapter(
        make_synthetic_corpus(num_utterances=4, phones_per_utterance=4, seed=0)
    )
    cfg = PipelineConfig()
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    ref = detect_corpus(corpus, bank, cfg, target_phone="aa")
    return corpus, cfg, bank, ref


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (2, 2, 2), (4, 2, 1)])
def test_sharded_scan_matches_reference(setup, mesh_shape, tmp_path):
    corpus, cfg, bank, ref = setup
    mesh = build_mesh(MeshConfig(*mesh_shape))
    got = detect_corpus_sharded(corpus, bank, cfg, mesh, target_phone="aa")
    assert got.utt_ids == ref.utt_ids
    assert got.audio_seconds == ref.audio_seconds
    # Same detections (scores allclose; sharding may reorder conv sums).
    r, g = ref.detections, got.detections
    assert len(g.scores) == len(r.scores)
    order_r = np.lexsort((r.times, r.utterance_ids))
    order_g = np.lexsort((g.times, g.utterance_ids))
    np.testing.assert_array_equal(
        g.times[order_g], r.times[order_r]
    )
    np.testing.assert_allclose(
        g.scores[order_g], r.scores[order_r], rtol=1e-4, atol=1e-3
    )
    # Identical evaluation metrics.
    m_ref = evaluate_detections(ref, cfg.detect.match_tolerance)
    m_got = evaluate_detections(got, cfg.detect.match_tolerance)
    assert m_got["num_labels"] == m_ref["num_labels"]
    np.testing.assert_allclose(m_got["eer"], m_ref["eer"], atol=1e-6)
