from template_speech_recognition_tpu.models.template import (
    register_exemplars,
    estimate_template,
    estimate_background,
)
from template_speech_recognition_tpu.models.mixture import (
    bernoulli_mixture_em,
    bernoulli_mixture_em_restarts,
    em_step,
    EMState,
)
from template_speech_recognition_tpu.models.bank import TemplateBank

__all__ = [
    "register_exemplars",
    "estimate_template",
    "estimate_background",
    "bernoulli_mixture_em",
    "bernoulli_mixture_em_restarts",
    "em_step",
    "EMState",
    "TemplateBank",
]
