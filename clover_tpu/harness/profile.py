"""Profiling / observability (SURVEY §5 tracing equivalent).

The reference's only introspection is the fenced RDTSC counter; the TPU
framework exposes the real thing: ``jax.profiler`` traces (viewable in
TensorBoard/Perfetto) plus a roofline accountant that pairs measured op
times with the bytes each container op must touch.
"""

from __future__ import annotations

import contextlib
import os

import jax

from .timing import gbs, pct_roofline


@contextlib.contextmanager
def trace(logdir: str = "/tmp/clover_tpu_trace"):
    """Capture a device trace around a block:

        with profile.trace("/tmp/t"):
            run_step()
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def roofline_report(entries):
    """entries: [(name, nbytes, seconds)] -> formatted roofline table."""
    lines = [f"{'op':32s} {'time(ms)':>10} {'GB/s':>9} {'%HBM roof':>10}"]
    for (name, nbytes, dt) in entries:
        lines.append(f"{name:32s} {dt * 1e3:>10.4f} {gbs(nbytes, dt):>9.1f} "
                     f"{pct_roofline(nbytes, dt):>9.1f}%")
    return "\n".join(lines)
