"""TPU-native template-based speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
markstoehr/Template-Speech-Recognition (SURVEY.md; the reference mount
was empty, so the parity target is the CPU NumPy oracle in
``/root/repo/oracle`` -- see SURVEY.md section 0 and BASELINE.json:5).

Layers (SURVEY.md section 7):

* ``io``        -- WAV/NIST-SPHERE audio, TIMIT-style corpora, fixtures
* ``frontend``  -- waveform -> binary oriented-edge feature maps (jit)
* ``ops``       -- the compute kernels (GEMM DFT, edges, sliding LLR
                   correlation, banded DTW) in jnp + Pallas forms
* ``models``    -- Bernoulli templates, mixture EM, background, banks,
                   parts dictionaries
* ``detect``    -- LLR filter construction, scoring, NMS, ROC/EER
* ``align``     -- banded DTW keyword matching
* ``parallel``  -- mesh construction, sharded scoring with time-halo
                   exchange, sharded EM, cross-host top-K merge
* ``utils``     -- logging, profiling, checkpointing
"""

__version__ = "0.1.0"

from template_speech_recognition_tpu.config import (
    FrontendConfig,
    TemplateConfig,
    DetectConfig,
    DTWConfig,
    MeshConfig,
    PipelineConfig,
)

__all__ = [
    "FrontendConfig",
    "TemplateConfig",
    "DetectConfig",
    "DTWConfig",
    "MeshConfig",
    "PipelineConfig",
]
