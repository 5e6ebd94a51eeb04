"""Config 4 end-to-end: DTW rescoring of detection peaks."""

import json

import numpy as np
import jax.numpy as jnp

from template_speech_recognition_tpu.align.dtw import dtw_keyword_scores_batch
from template_speech_recognition_tpu.cli import main
from template_speech_recognition_tpu.models.bank import TemplateBank
from template_speech_recognition_tpu.pipeline import dtw_rescore_detections


def _bank(seed=0, k=3, length=6, f=8, e=8):
    rng = np.random.default_rng(seed)
    tpl = np.clip(rng.random((k, length, f, e)).astype(np.float32), 0.05, 0.95)
    bg = np.full((f, e), 0.2, np.float32)
    return TemplateBank(jnp.asarray(tpl), jnp.asarray(bg),
                        [f"c{i}" for i in range(k)])


def test_pallas_batch_scorer_matches_scan():
    bank = _bank()
    w, c_rows = bank.llr_rows()
    rng = np.random.default_rng(1)
    segs = jnp.asarray((rng.random((5, 12, 8, 8)) < 0.3).astype(np.float32))
    lens = jnp.asarray([12, 9, 6, 3, 12], jnp.int32)
    scan = np.asarray(dtw_keyword_scores_batch(segs, lens, w, c_rows, 4))
    pal = np.asarray(
        dtw_keyword_scores_batch(segs, lens, w, c_rows, 4, use_pallas=True)
    )
    finite = np.isfinite(scan)
    np.testing.assert_allclose(pal[finite], scan[finite], rtol=1e-5, atol=1e-5)
    assert (np.isfinite(pal) == finite).all()


def test_rescore_shapes_and_empty_slots():
    bank = _bank()
    w_rows, c_rows = bank.llr_rows()
    rng = np.random.default_rng(2)
    fmap = jnp.asarray((rng.random((40, 8, 8)) < 0.3).astype(np.float32))
    scores = jnp.asarray([5.0, 3.0, -jnp.inf, 1.0])
    times = jnp.asarray([2, 10, 0, 30], jnp.int32)
    new_s, new_k = dtw_rescore_detections(
        fmap, jnp.int32(36), scores, times, w_rows, c_rows,
        m_seg=10, band=4,
    )
    new_s, new_k = np.asarray(new_s), np.asarray(new_k)
    assert new_s.shape == (4,)
    assert np.isneginf(new_s[2]) and new_k[2] == 0     # empty slot stays empty
    assert np.isfinite(new_s[[0, 1, 3]]).all()
    assert set(new_k[[0, 1, 3]]) <= {0, 1, 2}


def test_rescore_prefers_matching_template():
    # Build a feature map that IS template 1's high-probability pattern:
    # DTW rescoring must pick template 1.
    bank = _bank(seed=3)
    w_rows, c_rows = bank.llr_rows()
    tpl = np.asarray(bank.templates)[1]                # [L, F, E]
    fmap_np = (np.random.default_rng(4).random((20, 8, 8)) < 0.1).astype(np.float32)
    fmap_np[5:11] = (tpl > 0.5).astype(np.float32)
    fmap = jnp.asarray(fmap_np)
    scores = jnp.asarray([1.0])
    times = jnp.asarray([5], jnp.int32)
    new_s, new_k = dtw_rescore_detections(
        fmap, jnp.int32(20), scores, times, w_rows, c_rows,
        m_seg=9, band=3,
    )
    assert int(new_k[0]) == 1
    assert np.isfinite(float(new_s[0]))


def test_cli_evaluate_with_dtw_rescore(tmp_path, capsys):
    bank = str(tmp_path / "bank")
    assert main(["train", "--corpus", "synthetic", "--phones", "aa,iy",
                 "--bank", bank]) == 0
    capsys.readouterr()
    assert main(["evaluate", "--corpus", "synthetic", "--bank", bank,
                 "--phone", "aa", "--dtw-rescore"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["num_detections"] > 0
    # DTW-aligned matching must still find the target phone.
    assert res["best_tpr"] > 0.5


def test_pairwise_scores_match_exhaustive_column():
    """dtw_pairwise_scores(seg_i, w[ids_i]) == exhaustive batch scores
    gathered at ids_i -- the top_r=1 verify-the-winner identity."""
    from template_speech_recognition_tpu.align.dtw import (
        dtw_pairwise_scores,
    )

    bank = _bank()
    w, c_rows = bank.llr_rows()
    rng = np.random.default_rng(3)
    segs = jnp.asarray((rng.random((6, 12, 8, 8)) < 0.3).astype(np.float32))
    lens = jnp.asarray([12, 9, 6, 3, 12, 7], jnp.int32)
    ids = jnp.asarray([0, 2, 1, 0, 1, 2], jnp.int32)
    full = np.asarray(dtw_keyword_scores_batch(segs, lens, w, c_rows, 4))
    got = np.asarray(
        dtw_pairwise_scores(
            segs, lens, jnp.take(w, ids, axis=0),
            jnp.take(c_rows, ids, axis=0), 4,
        )
    )
    want = full[np.arange(6), np.asarray(ids)]
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-5,
                               atol=1e-5)
    assert (np.isfinite(got) == finite).all()


def test_scan_top_r1_keeps_winner_and_matches_pair_score():
    """scan_step with dtw_top_r=1: template ids and times unchanged
    from the sliding winners; every score equals the exhaustive DTW
    pair matrix (``dtw_keyword_scores_batch``) gathered at the winner's
    id -- the verify-the-winner contract."""
    from template_speech_recognition_tpu.config import (
        DetectConfig,
        DTWConfig,
        PipelineConfig,
    )
    from template_speech_recognition_tpu.frontend import frontend_batch_flat
    from template_speech_recognition_tpu.ops.layout import filters_to_flat
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        bucket_length,
        train_bank,
    )
    from template_speech_recognition_tpu.scan import detect_corpus_stream
    import oracle as O

    corpus = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=4, phones_per_utterance=4,
                                seed=8)
    )
    slide_cfg = PipelineConfig(detect=DetectConfig(batch_size=2))
    bank = train_bank(corpus, ["aa", "iy"], slide_cfg)
    slide = detect_corpus_stream(corpus, bank, slide_cfg, target_phone="aa")
    cfg1 = PipelineConfig(
        detect=DetectConfig(dtw_rescore=True, batch_size=2),
        dtw=DTWConfig(top_r=1),
    )
    got = detect_corpus_stream(corpus, bank, cfg1, target_phone="aa")
    s, g = slide.detections, got.detections
    # rescoring never moves peaks or changes the winner in top_r=1 mode
    assert len(g.scores) == len(s.scores)
    order_s = np.lexsort((s.times, s.utterance_ids))
    order_g = np.lexsort((g.times, g.utterance_ids))
    np.testing.assert_array_equal(
        g.utterance_ids[order_g], s.utterance_ids[order_s]
    )
    np.testing.assert_array_equal(g.times[order_g], s.times[order_s])
    np.testing.assert_array_equal(
        g.template_ids[order_g], s.template_ids[order_s]
    )
    # scores == exhaustive pair matrix at the winner ids, recomputed
    # through the exhaustive scorer with the scan's own padding
    utts = corpus.corpus.utterances
    pads = {bucket_length(len(u.waveform)) for u in utts}
    assert len(pads) == 1, "fixture must land in one length bucket"
    pad = pads.pop()
    wavs = np.zeros((len(utts), pad), np.float32)
    valid = np.zeros((len(utts),), np.int32)
    for i, u in enumerate(utts):
        wavs[i, : len(u.waveform)] = u.waveform
        valid[i] = len(u.waveform)
    fm = frontend_batch_flat(jnp.asarray(wavs), jnp.asarray(valid),
                             cfg1.frontend)
    binary = np.asarray(fm.binary, np.float32)          # [B, T, D]
    vframes = np.asarray(fm.valid_frames)
    w_rows, c_rows = bank.llr_rows()
    w_flat = filters_to_flat(w_rows)
    m_seg = bank.template_length + cfg1.dtw.band
    tdim = binary.shape[1]
    for j in order_g:
        u, t, k = int(g.utterance_ids[j]), int(g.times[j]), int(g.template_ids[j])
        idx = np.clip(t + np.arange(m_seg), 0, tdim - 1)
        seg = jnp.asarray(binary[u][idx])[None]         # [1, m_seg, D]
        seg_len = jnp.asarray(
            [np.clip(int(vframes[u]) - t, 1, m_seg)], jnp.int32
        )
        pair = np.asarray(
            dtw_keyword_scores_batch(seg, seg_len, w_flat, c_rows,
                                     cfg1.dtw.band)
        )[0]                                            # [K]
        np.testing.assert_allclose(
            float(g.scores[j]), pair[k], rtol=1e-4, atol=1e-4
        )


def test_sharded_top_r1_matches_single_chip():
    from template_speech_recognition_tpu.config import (
        DetectConfig,
        DTWConfig,
        MeshConfig,
        PipelineConfig,
    )
    from template_speech_recognition_tpu.parallel import build_mesh
    from template_speech_recognition_tpu.parallel.detect_sharded import (
        detect_corpus_sharded,
    )
    from template_speech_recognition_tpu.pipeline import (
        SyntheticAdapter,
        train_bank,
    )
    from template_speech_recognition_tpu.scan import detect_corpus_stream
    import oracle as O

    corpus = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=4, phones_per_utterance=4,
                                seed=8)
    )
    cfg = PipelineConfig(
        detect=DetectConfig(dtw_rescore=True, batch_size=4),
        dtw=DTWConfig(top_r=1),
    )
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    ref = detect_corpus_stream(corpus, bank, cfg, target_phone="aa")
    for mesh_shape in [(2, 2, 1), (1, 2, 2)]:
        mesh = build_mesh(MeshConfig(*mesh_shape))
        got = detect_corpus_sharded(corpus, bank, cfg, mesh,
                                    target_phone="aa")
        r, g = ref.detections, got.detections
        assert len(g.scores) == len(r.scores)
        order_r = np.lexsort((r.times, r.utterance_ids))
        order_g = np.lexsort((g.times, g.utterance_ids))
        np.testing.assert_array_equal(g.times[order_g], r.times[order_r])
        np.testing.assert_array_equal(
            g.template_ids[order_g], r.template_ids[order_r]
        )
        np.testing.assert_allclose(
            g.scores[order_g], r.scores[order_r], rtol=1e-4, atol=1e-3
        )


def test_fused_from_map_matches_gathered_pairwise():
    """pair_llr_pallas fused gathers (interpret): scores from the
    feature map == dtw_pairwise_scores over explicitly gathered
    segments/filters."""
    from template_speech_recognition_tpu.align.dtw import (
        dtw_pairwise_scores,
        dtw_pairwise_scores_from_map,
    )

    rng = np.random.default_rng(9)
    b, t, k, length, d = 2, 40, 5, 6, 16
    m_seg, band = 10, 3
    p = 4
    binary = jnp.asarray((rng.random((b, t, d)) < 0.3).astype(np.float32))
    times = jnp.asarray(rng.integers(0, t - 1, (b, p)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, k, (b, p)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(k, length, d)).astype(np.float32))
    c_rows = jnp.asarray(rng.normal(size=(k, length)).astype(np.float32))
    vf = jnp.asarray([t, t - 6], jnp.int32)
    got = np.asarray(
        dtw_pairwise_scores_from_map(
            binary, times, ids, w, c_rows, vf, m_seg, band,
            use_pallas=False,
        )
    )
    # reference: explicit gathers (bf16 operands to match)
    idx = np.clip(
        np.asarray(times)[:, :, None] + np.arange(m_seg)[None, None],
        0, t - 1,
    )
    segs = np.stack([np.asarray(binary)[i][idx[i]] for i in range(b)])
    lens = np.clip(np.asarray(vf)[:, None] - np.asarray(times), 1, m_seg)
    wk = np.asarray(w)[np.asarray(ids).reshape(-1)]
    ck = np.asarray(c_rows)[np.asarray(ids).reshape(-1)]
    want = np.asarray(
        dtw_pairwise_scores(
            jnp.asarray(segs.reshape(b * p, m_seg, d), jnp.bfloat16),
            jnp.asarray(lens.reshape(-1), jnp.int32),
            jnp.asarray(wk, jnp.bfloat16),
            jnp.asarray(ck), band, use_pallas=True,
        )
    ).reshape(b, p)
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-3,
                               atol=1e-3)
    assert (np.isfinite(got) == finite).all()
