from template_speech_recognition_tpu.parallel.mesh import build_mesh, local_mesh
from template_speech_recognition_tpu.parallel.score_sharded import (
    sharded_bank_scores,
    padded_scores_reference,
)
from template_speech_recognition_tpu.parallel.em_sharded import (
    sharded_bernoulli_mixture_em,
)
from template_speech_recognition_tpu.parallel.topk_merge import merge_topk
from template_speech_recognition_tpu.parallel.detect_sharded import (
    detect_corpus_sharded,
)
from template_speech_recognition_tpu.parallel.ring import (
    ring_bank_scores,
    channel_parallel_scores,
)
from template_speech_recognition_tpu.parallel.fft_sharded import (
    sharded_fft_bank_scores,
)

__all__ = [
    "detect_corpus_sharded",
    "ring_bank_scores",
    "sharded_fft_bank_scores",
    "channel_parallel_scores",
    "build_mesh",
    "local_mesh",
    "sharded_bank_scores",
    "padded_scores_reference",
    "sharded_bernoulli_mixture_em",
    "merge_topk",
]
