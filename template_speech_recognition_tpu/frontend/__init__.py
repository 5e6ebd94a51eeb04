from template_speech_recognition_tpu.frontend.features import (
    frontend,
    frontend_batch,
    spectrogram,
)

__all__ = ["frontend", "frontend_batch", "spectrogram"]
