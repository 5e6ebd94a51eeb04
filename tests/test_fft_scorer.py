"""FFT-domain scorer parity vs the direct f32 conv path.

The fft path is a bf16 throughput backend: tolerance is bf16-class
(rel ~3e-3 at the bench shape), checked against oracle/conv f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle as O
from template_speech_recognition_tpu.detect import sliding_scores
from template_speech_recognition_tpu.detect.scorer import sliding_scores_backend
from template_speech_recognition_tpu.detect.fft_scorer import (
    FFTBank,
    build_fft_bank,
    fft_sliding_scores,
    pick_nfft,
)


def _rand_problem(rng, b=2, t=137, k=5, length=12, f=17, e=3):
    feats = (rng.random((b, t, f, e)) < 0.2).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    return feats, w, c


def _ref_scores(feats, w, c):
    return np.stack(
        [
            np.asarray(
                sliding_scores(jnp.asarray(fm), jnp.asarray(w), jnp.asarray(c))
            )
            for fm in feats
        ]
    )


def _assert_close(got, ref):
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)


def test_fft_scores_match_conv_odd_shapes():
    rng = np.random.default_rng(0)
    feats, w, c = _rand_problem(rng)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c))
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank))
    ref = _ref_scores(feats, w, c)
    assert got.shape == ref.shape
    _assert_close(got, ref)


def test_fft_scores_match_oracle():
    rng = np.random.default_rng(1)
    feats, w, c = _rand_problem(rng, b=1, t=90, k=3, length=9, f=11, e=2)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c))
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank))[0]
    ref = O.sliding_score(feats[0].astype(bool), w, c)
    _assert_close(got, ref)


@pytest.mark.parametrize("nfft", [64, 128, 256])
def test_fft_scores_nfft_sweep(nfft):
    rng = np.random.default_rng(2)
    feats, w, c = _rand_problem(rng, b=1, t=300, k=4, length=20)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=nfft)
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank))
    ref = _ref_scores(feats, w, c)
    _assert_close(got, ref)


def test_fft_t_not_multiple_of_hop():
    # exercise tail-block padding: T chosen so tout % hop != 0 and the
    # last block is mostly padding
    rng = np.random.default_rng(3)
    feats, w, c = _rand_problem(rng, b=1, t=71, k=2, length=16)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=64)
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank))
    ref = _ref_scores(feats, w, c)
    _assert_close(got, ref)


def test_fft_backend_selectable():
    rng = np.random.default_rng(4)
    feats, w, c = _rand_problem(rng, b=1, t=100, k=3, length=8)
    got = np.asarray(
        sliding_scores_backend(
            jnp.asarray(feats[0]), jnp.asarray(w), jnp.asarray(c), backend="fft"
        )
    )
    ref = _ref_scores(feats, w, c)[0]
    _assert_close(got, ref)


def test_fft_bank_is_jit_stable_pytree():
    rng = np.random.default_rng(5)
    _, w, c = _rand_problem(rng)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c))
    leaves, treedef = jax.tree_util.tree_flatten(bank)
    bank2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(bank2, FFTBank)
    assert bank2.nfft == bank.nfft and bank2.length == bank.length


def test_pick_nfft():
    # hop = 16-aligned ~4L (fused-path alignment), nfft = hop + L - 1
    assert pick_nfft(32) == 159
    for length in (1, 4, 30, 32, 100, 2000):
        n = pick_nfft(length)
        hop = n - length + 1
        assert hop > 0
        assert hop % 16 == 0  # forward-DFT kernel alignment contract
        assert hop >= min(16, 4 * length)


def test_fft_pallas_binmm_matches_xla():
    """Fused pallas pack+bin-GEMM kernel == XLA path (interpret on CPU),
    exercising (m, D, K) padding with deliberately unaligned shapes."""
    rng = np.random.default_rng(6)
    feats, w, c = _rand_problem(rng, b=3, t=260, k=5, length=12, f=17, e=3)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=127)
    got_p = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=True)
    )
    got_x = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=False)
    )
    scale = np.max(np.abs(got_x)) + 1e-6
    np.testing.assert_allclose(got_p / scale, got_x / scale, atol=2e-3)
    ref = _ref_scores(feats, w, c)
    _assert_close(got_p, ref)


def test_fft_pallas_binmm_aligned_shapes():
    rng = np.random.default_rng(7)
    bins, m, d, k = 8, 16, 256, 128
    xr = jnp.asarray(rng.normal(size=(bins, m, d)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(bins, m, d)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(bins, 2 * d, k)).astype(np.float32))
    from template_speech_recognition_tpu.ops.fft_binmm_pallas import (
        fft_binmm_pallas,
    )

    y = np.asarray(fft_binmm_pallas(xr, xi, w2, dc=128))
    wr, wi = np.asarray(w2[:, :d]), np.asarray(w2[:, d:])
    xr_n, xi_n = np.asarray(xr), np.asarray(xi)
    yr = np.einsum("fmd,fdk->fmk", xr_n, wr) + np.einsum("fmd,fdk->fmk", xi_n, wi)
    yi = np.einsum("fmd,fdk->fmk", xi_n, wr) - np.einsum("fmd,fdk->fmk", xr_n, wi)
    scale = np.max(np.abs(yr)) + 1e-6
    np.testing.assert_allclose(y[0] / scale, yr / scale, atol=2e-2)
    np.testing.assert_allclose(y[1] / scale, yi / scale, atol=2e-2)


def test_fft_pallas_idft_epilogue_matches_xla():
    """Fused iDFT+transpose+bias kernel == XLA epilogue (default nfft
    has lane-aligned hop, so the pallas path takes the fused branch)."""
    rng = np.random.default_rng(8)
    feats, w, c = _rand_problem(rng, b=2, t=300, k=6, length=12)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=139)
    assert (bank.nfft - bank.length + 1) % 128 == 0
    got_p = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=True)
    )
    got_x = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=False)
    )
    scale = np.max(np.abs(got_x)) + 1e-6
    np.testing.assert_allclose(got_p / scale, got_x / scale, atol=2e-3)
    _assert_close(got_p, _ref_scores(feats, w, c))


def test_fft_pallas_block_dft_matches_xla():
    """Fused block-extract+DFT kernel path == XLA path.  length=17 ->
    default nfft 255, hop 239 (hop % 16 != 0 -> XLA); explicit nfft 256
    -> hop 240 (16-aligned -> kernel engages)."""
    rng = np.random.default_rng(9)
    feats, w, c = _rand_problem(rng, b=2, t=500, k=4, length=17, f=16, e=8)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=256)
    assert (bank.nfft - bank.length + 1) % 16 == 0 and bank.d % 128 == 0
    got_p = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=True)
    )
    got_x = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=False)
    )
    scale = np.max(np.abs(got_x)) + 1e-6
    np.testing.assert_allclose(got_p / scale, got_x / scale, atol=2e-3)
    _assert_close(got_p, _ref_scores(feats, w, c))


def test_fft_fully_fused_4d_path_matches_xla():
    """Force the fully-fused 4-D binmm branch (m % 8 == 0, K % 128 == 0,
    D % 128 == 0, B == 1) in interpret mode and compare against the XLA
    path; also checks the b > 1 nblk-unaligned gate falls back cleanly."""
    rng = np.random.default_rng(11)
    f, e = 16, 8                                    # D = 128
    k, length = 128, 17
    # nfft=256 -> hop=240 (16-aligned so the DFT kernel engages);
    # t=1937 -> tout=1921 -> nblk=9, b=1 -> m=9... need m%8==0: pick
    # t so nblk=8: tout <= 8*240=1920, > 7*240 -> t=1936 gives tout=1920.
    t = 1936
    feats = (rng.random((1, t, f, e)) < 0.2).astype(np.float32)
    w = rng.normal(size=(k, length, f, e)).astype(np.float32)
    c = rng.normal(size=(k,)).astype(np.float32)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c), nfft=256)
    hop = bank.nfft - bank.length + 1
    nblk = -(-(t - length + 1) // hop)
    assert nblk % 8 == 0 and hop % 16 == 0 and bank.d % 128 == 0
    got_p = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=True)
    )
    got_x = np.asarray(
        fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=False)
    )
    scale = np.max(np.abs(got_x)) + 1e-6
    np.testing.assert_allclose(got_p / scale, got_x / scale, atol=2e-3)

    # b=2, nblk=9: m=18 % 8 != 0 -> must take the 3-D reshape path and
    # still match (ADVICE r1: the 4-D collapse is only layout-trivial
    # for b == 1 or nblk % 8 == 0).
    t2 = 2000
    feats2 = (rng.random((2, t2, f, e)) < 0.2).astype(np.float32)
    got_p2 = np.asarray(
        fft_sliding_scores(jnp.asarray(feats2), bank, use_pallas=True)
    )
    got_x2 = np.asarray(
        fft_sliding_scores(jnp.asarray(feats2), bank, use_pallas=False)
    )
    scale2 = np.max(np.abs(got_x2)) + 1e-6
    np.testing.assert_allclose(got_p2 / scale2, got_x2 / scale2, atol=2e-3)


def test_fft_trim_false_contract():
    """fft_sliding_scores(trim=False)[:, :tout] == trimmed output, and
    rows >= tout are exactly the window starts masked_scores drops."""
    from template_speech_recognition_tpu.detect import masked_scores

    rng = np.random.default_rng(12)
    feats, w, c = _rand_problem(rng, b=2, t=300, k=6, length=12)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c))
    tout = feats.shape[1] - bank.length + 1
    for up in (True, False):
        full = fft_sliding_scores(
            jnp.asarray(feats), bank, use_pallas=up,
            time_major=True, trim=False,
        )
        trimmed = fft_sliding_scores(
            jnp.asarray(feats), bank, use_pallas=up, time_major=True
        )
        np.testing.assert_allclose(
            np.asarray(full[:, :tout]), np.asarray(trimmed), atol=1e-5
        )
        valid = jnp.int32(feats.shape[1])
        m_full = masked_scores(full[0], valid, bank.length, time_major=True)
        assert bool(jnp.all(jnp.isneginf(m_full[tout:])))
    with pytest.raises(ValueError):
        fft_sliding_scores(jnp.asarray(feats), bank, trim=False)


def test_fft_vmem_shrink_floor():
    """The 4-D VMEM-shrink loop terminates at the 128 floor and falls
    back to the XLA bin-matmul when the accumulator alone cannot fit
    (ADVICE r1: previously an infinite loop at huge m*k)."""
    from template_speech_recognition_tpu.detect import fft_scorer as fs

    # huge m*k: 12*m*k > 80 MB with m = b*nblk
    m, k = 8192, 1024
    assert not (128 * k * 4 + 8 * m * 128 + 12 * m * k <= 80 * 1024 * 1024)
    # the loop body in fft_sliding_scores floors at 128; emulate it
    d = 2048
    bin_dc = next(c2 for c2 in (2048, 1024, 512, 256, 128) if d % c2 == 0)
    steps = 0
    while bin_dc > 128 and not (
        bin_dc * k * 4 + 8 * m * bin_dc + 12 * m * k <= 80 * 1024 * 1024
    ):
        bin_dc //= 2
        steps += 1
        assert steps < 64
    assert bin_dc == 128


def test_fft_time_major_consistent():
    """time_major output == transpose of default, through both the
    pallas and XLA epilogues; NMS/masking accept it directly."""
    from template_speech_recognition_tpu.detect import masked_scores, top_detections

    rng = np.random.default_rng(10)
    feats, w, c = _rand_problem(rng, b=2, t=300, k=6, length=12)
    bank = build_fft_bank(jnp.asarray(w), jnp.asarray(c))
    for up in (True, False):
        kt = np.asarray(
            fft_sliding_scores(jnp.asarray(feats), bank, use_pallas=up)
        )
        tm = np.asarray(
            fft_sliding_scores(
                jnp.asarray(feats), bank, use_pallas=up, time_major=True
            )
        )
        np.testing.assert_allclose(np.swapaxes(tm, 1, 2), kt, atol=1e-5)

    sc = fft_sliding_scores(jnp.asarray(feats), bank)
    sc_t = fft_sliding_scores(jnp.asarray(feats), bank, time_major=True)
    valid = jnp.int32(feats.shape[1] - 30)
    m0 = masked_scores(sc[0], valid, bank.length)
    m1 = masked_scores(sc_t[0], valid, bank.length, time_major=True)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1).T, atol=1e-5)
    d0 = top_detections(m0, 5, 8)
    d1 = top_detections(m1, 5, 8, time_major=True)
    for a, b in zip(d0, d1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_spectra_scores_close_to_f32():
    """build_fft_bank(mm_dtype=int8): int8 x int8 -> int32 bin-matmul
    with per-(bin, template) dequant scales stays within quantization
    tolerance of the f32 path (round-4 verdict, weak item 4 -- the
    config-5 spectra-stream cut)."""
    rng = np.random.default_rng(7)
    feats, w, c = _rand_problem(rng, b=2, t=120, k=6, length=12, f=15, e=3)
    ref = _ref_scores(feats, w, c)
    bank8 = build_fft_bank(jnp.asarray(w), jnp.asarray(c),
                           mm_dtype=jnp.int8)
    assert bank8.w2.dtype == jnp.int8 and bank8.w2_scale is not None
    got = np.asarray(fft_sliding_scores(jnp.asarray(feats), bank8))
    assert got.shape == ref.shape
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=4e-2)
    # detection decisions: the per-frame winning template matches the
    # f32 path nearly everywhere (quantization cannot reorder clear
    # winners)
    agree = (got.argmax(axis=1) == ref.argmax(axis=1)).mean()
    assert agree > 0.9, agree


def test_int8_spectra_pallas_kernel_matches_xla():
    """The int8 fft_binmm_pallas kernel (interpret mode) agrees with
    the XLA int8 fallback bitwise-close (same int32 accumulation, same
    scales)."""
    from template_speech_recognition_tpu.ops.fft_binmm_pallas import (
        fft_binmm_pallas,
    )

    rng = np.random.default_rng(8)
    bins, m, d, k = 5, 8, 128, 128
    xr = jnp.asarray(rng.integers(-127, 128, (bins, m, d)), jnp.int8)
    xi = jnp.asarray(rng.integers(-127, 128, (bins, m, d)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (bins, 2 * d, k)), jnp.int8)
    sc = jnp.asarray(rng.random((bins, k)) + 0.5, jnp.float32)
    got = np.asarray(
        fft_binmm_pallas(xr, xi, w2, sc=sc, dc=128, interpret=True)
    ).astype(np.float32)
    x2 = jnp.concatenate(
        [jnp.concatenate([xr, xi], 2), jnp.concatenate([xi, -xr], 2)], 1
    )
    y = jax.lax.dot_general(
        x2, w2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sc[:, None, :]
    want = np.stack([np.asarray(y[:, :m]), np.asarray(y[:, m:])])
    np.testing.assert_allclose(
        got, want.astype(np.float32), rtol=1e-2, atol=1e-2
    )


def test_int8_spectra_corpus_scan_and_sharded():
    """DetectConfig.int8_spectra: the streaming scan runs on int8
    banks and the sharded scan matches it (times/ids identical,
    scores allclose)."""
    import oracle as O
    from template_speech_recognition_tpu.config import (
        DetectConfig,
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

    corpus = SyntheticAdapter(
        O.make_synthetic_corpus(num_utterances=4, phones_per_utterance=4,
                                seed=3)
    )
    cfg = PipelineConfig(
        detect=DetectConfig(batch_size=2, int8_spectra=True)
    )
    bank = train_bank(corpus, ["aa", "iy"], cfg)
    ref = detect_corpus_stream(corpus, bank, cfg, target_phone="aa")
    assert len(ref.detections.scores) > 0
    mesh = build_mesh(MeshConfig(2, 2, 1))
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
    # both sides re-quantize their block spectra over different
    # overlap-save extents (halo-extended vs plain), so scores agree
    # at the int8 quantization scale, not bitwise
    scale = np.max(np.abs(r.scores)) + 1e-6
    np.testing.assert_allclose(
        g.scores[order_g] / scale, r.scores[order_r] / scale, atol=2e-2
    )
