from template_speech_recognition_tpu.io.audio import (
    read_audio,
    read_wav,
    write_wav,
    read_sphere,
    write_sphere,
)
from template_speech_recognition_tpu.io.corpus import TimitCorpus, PhoneSpan
from template_speech_recognition_tpu.io.fixtures import write_synthetic_timit

__all__ = [
    "read_audio",
    "read_wav",
    "write_wav",
    "read_sphere",
    "write_sphere",
    "TimitCorpus",
    "PhoneSpan",
    "write_synthetic_timit",
]
