"""Tracing / profiling helpers (SURVEY.md section 5).

Thin wrappers over ``jax.profiler`` and ``jax.named_scope`` so
pipeline stages show up named in xprof traces; roofline accounting
helpers for the bench harness live in ``bench.py``.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture an xprof trace into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def named_scope(name: str):
    """Name a region for xprof (usable as decorator or context)."""
    return jax.named_scope(name)
