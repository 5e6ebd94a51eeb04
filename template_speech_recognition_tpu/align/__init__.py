from template_speech_recognition_tpu.align.dtw import (
    banded_dtw,
    frame_llr_matrix,
    dtw_keyword_score,
    dtw_keyword_scores_batch,
)

__all__ = [
    "banded_dtw",
    "frame_llr_matrix",
    "dtw_keyword_score",
    "dtw_keyword_scores_batch",
]
