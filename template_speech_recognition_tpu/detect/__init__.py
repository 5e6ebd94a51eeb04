from template_speech_recognition_tpu.detect.scorer import (
    sliding_scores,
    sliding_scores_int,
    masked_scores,
)
from template_speech_recognition_tpu.detect.nms import nms_mask, top_detections
from template_speech_recognition_tpu.detect.evaluate import (
    match_detections,
    roc_curve,
    eer,
)

__all__ = [
    "sliding_scores",
    "sliding_scores_int",
    "masked_scores",
    "nms_mask",
    "top_detections",
    "match_detections",
    "roc_curve",
    "eer",
]
