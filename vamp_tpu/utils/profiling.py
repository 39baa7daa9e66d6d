"""Device-trace profiling hooks (SURVEY §5.1: the reference instruments
per-query nanoseconds and checks/s; the TPU equivalent is an XLA device
trace viewable in TensorBoard/Perfetto/XProf).

Usage — wrap any region whose device work you want attributed:

    from vamp_tpu.utils.profiling import trace, annotate

    with trace("/tmp/vamp_trace"):            # writes a TensorBoard trace
        with annotate("wave0"):               # named span inside the trace
            res = solve(*args)
            jax.block_until_ready(res)

or ambiently via env var — any `trace()` block becomes a no-op unless
`VAMP_TRACE_DIR` is set, so production callers can leave the hooks in:

    VAMP_TRACE_DIR=/tmp/vamp_trace python bench.py

`benchmarks/evaluate_mbm.py` wraps each wave in `annotate("wave{i}.{rep}")`
under `trace()`, so a single env var produces a per-wave device timeline.

Reference parity note: the reference reports host-clocked per-call
nanoseconds (planning/plan.hh:171-179); here the same numbers come from the
API layer (api.py compile-free timing), and this module adds the deeper
device-side attribution the survey calls for.
"""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext

import jax


@contextmanager
def trace(log_dir: str | None = None):
    """Capture a device trace into `log_dir` (or $VAMP_TRACE_DIR; no-op when
    neither is set). Nesting is a no-op: only the outermost trace captures."""
    d = log_dir or os.environ.get("VAMP_TRACE_DIR")
    if not d or getattr(trace, "_active", False):
        yield None
        return
    trace._active = True
    try:
        with jax.profiler.trace(str(d)):
            yield d
    finally:
        trace._active = False


def annotate(name: str):
    """Named span in the device trace (TraceAnnotation in the viewer).
    Cheap enough to leave on unconditionally."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - profiler unavailable
        return nullcontext()
