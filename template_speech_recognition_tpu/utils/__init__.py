from template_speech_recognition_tpu.utils.compile_cache import enable_compile_cache
from template_speech_recognition_tpu.utils.metrics import StageCounters
from template_speech_recognition_tpu.utils.profiling import profile_trace, named_scope

__all__ = ["StageCounters", "profile_trace", "named_scope", "enable_compile_cache"]
