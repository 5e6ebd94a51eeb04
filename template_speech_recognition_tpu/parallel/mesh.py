"""Device mesh construction (SURVEY.md section 2c).

Axes: ``data`` (utterance batches, DP), ``bank`` (template bank /
mixture components, TP/EP), ``time`` (long-audio frame axis, SP/CP).
Multi-host runs get their device list from jax's global view after
``jax.distributed.initialize`` (``parallel.bootstrap``); single-host
tests use 8 fake CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (SURVEY.md
section 4 item 4).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from template_speech_recognition_tpu.config import MeshConfig


def build_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """Reshape the first data*bank*time devices into a named mesh."""
    devices = list(jax.devices()) if devices is None else list(devices)
    need = cfg.num_devices
    if len(devices) < need:
        raise ValueError(f"need {need} devices for mesh {cfg}, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(cfg.data, cfg.bank, cfg.time)
    return Mesh(arr, cfg.axis_names)


def local_mesh() -> Mesh:
    """Trivial 1x1x1 mesh on the first device (single-chip paths)."""
    return build_mesh(MeshConfig(1, 1, 1))
