"""Measurement protocol (the TPU analog of lib/perf.cpp's fenced RDTSC).

The reference times with CPUID-fenced RDTSC, calibrated repetitions, and a
median of 15 (lib/perf.cpp:183-200, test/performance/01_measure.h:39-85).
On this TPU the tunnel does not block on ``block_until_ready``, so the
protocol is: jit a dependent chain of K applications of the op, force one
scalar fetch, and difference two chain lengths to cancel the round trip;
median over reps.  Bandwidth = bytes_touched / median_time, vs the chip's
HBM roofline (the analog of the Xeon's 25.6 GB/s DRAM bound).
"""

from __future__ import annotations

import time

import numpy as np

# TPU v5e spec numbers (per chip).
HBM_BYTES_PER_S = 819e9
BF16_FLOPS = 197e12

MEASURE_REPETITIONS = 7


def median_time(fetch, reps: int = MEASURE_REPETITIONS) -> float:
    """Median wall time of ``fetch()`` (must force device completion)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _paired_diff(f2, f1, dk: int, reps: int) -> float:
    """Median of PAIRED (long - short) chain diffs.

    The chip drifts 5-10% between runs and transiently glitches slower;
    differencing two independently-taken medians lets a glitch land on
    only one side and fabricate impossible rates (observed >100% of
    roofline).  Pairing keeps both chain lengths in the same
    chip/tunnel state."""
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
        ds.append((t2 - t1) / dk)
    return float(np.median(ds))


def chain_time(make_chain, k1: int = 1, k2: int | None = None,
               reps: int = MEASURE_REPETITIONS,
               target_s: float = 0.04) -> float:
    """Per-op time from two dependent-chain lengths.

    ``make_chain(k)`` returns a zero-arg callable that runs a k-long
    dependent chain of the op and blocks on a scalar fetch.

    When ``k2`` is None the chain length is CALIBRATED so the measured
    batch spans ~``target_s`` seconds — the reference's calibrated-
    repetition protocol (test/performance/01_measure.h:62-70), needed
    because microsecond ops are invisible next to the ~30 ms tunnel
    round trip.
    """
    f1 = make_chain(k1)
    f1()                            # compile + warm
    t1 = median_time(f1, 3)
    if k2 is None:
        probe_k = 257
        fp = make_chain(probe_k)
        fp()
        est = max((median_time(fp, 3) - t1) / (probe_k - k1), 2e-8)
        k2 = min(max(probe_k, int(target_s / est)), 200_000)
        if k2 == probe_k:
            return _paired_diff(fp, f1, probe_k - k1, reps)
    f2 = make_chain(k2)
    f2()
    return _paired_diff(f2, f1, k2 - k1, reps)


def gbs(nbytes: int, dt: float) -> float:
    return nbytes / dt / 1e9


def pct_roofline(nbytes: int, dt: float) -> float:
    return 100.0 * nbytes / dt / HBM_BYTES_PER_S
