"""Profiling hooks.

The reference's only instrumentation is wall-clock tic/toc (SURVEY.md §5
"Tracing / profiling"); the TPU equivalent is a jax.profiler trace viewable
in TensorBoard/Perfetto plus the per-stage timers already in the harness.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace for the enclosed block when `logdir`
    is set; no-op otherwise.  Open the result with TensorBoard's profile
    plugin or ui.perfetto.dev."""
    if not logdir:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield
    print(f'[profiler] trace written to {logdir}')


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
