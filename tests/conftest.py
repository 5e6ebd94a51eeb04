"""Test harness config.

* Forces the CPU backend with 8 fake devices
  (``--xla_force_host_platform_device_count=8``) so mesh/sharding/
  collective logic runs without a pod (SURVEY.md section 4 item 4).
  Env vars are set here, before any test module imports jax.
* This machine's sitecustomize loads the axon TPU PJRT plugin into
  every process; its teardown blocks interpreter exit for minutes
  after any jit has run.  ``pytest_sessionfinish`` therefore arranges
  a hard (but flushed) ``os._exit`` with the correct status code.
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup — BEFORE this
# conftest runs — so jax's config has already snapshotted
# JAX_PLATFORMS=axon from the outer env and ignores the os.environ writes
# above.  Without the explicit config.update the whole suite silently
# runs on the tunneled 1-chip TPU backend (bf16 convs broke f32 parity
# tests by ~7e-4 rel).  XLA_FLAGS is read lazily at first backend init,
# so the environ write is still in time for the 8 fake CPU devices.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def pytest_sessionfinish(session, exitstatus):
    import atexit

    def _hard_exit():
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(int(exitstatus))

    atexit.register(_hard_exit)
