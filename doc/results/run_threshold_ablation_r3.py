"""Threshold round-3 ablation (VERDICT r2 item 8).

Sweeps the bisection fan-out (ops.threshold.BISECT_FAN — fan-1 pivots
per level, depth = _bisect_levels(fan): 9->12, 27->9, 81->7, 243->6
levels) on both the XLA wide-view path (4-bit large-n, 8-bit dense) and
the fused Pallas kernels (small-n).  The r2 decomposition said the cost
is bisect depth x reduce latency plus the 14 indicator passes; a wider
fan trades (cheap) per-level compare throughput for (expensive)
sequential depth.  Target: >=30 GB/s at n=2^20 4-bit K=64 (~39 us), or
this log documents the floor.

Every variant is numerics-checked against the shipped fan=9 output
before timing; timing is interleaved round-robin paired diffs, median
of 7 (harness/timing.py rules).  Results -> threshold_ablation_r3.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from clover_tpu.utils.compcache import enable as _enable
_enable()

import jax
import jax.numpy as jnp

import clover_tpu as ct
# NB: `import clover_tpu.ops.threshold as thr` would bind the FUNCTION
# (ops/__init__ re-exports `threshold`, and `import a.b as c` resolves
# getattr(a, "b")); go through sys.modules to get the module.
import clover_tpu.ops.threshold  # noqa: F401
thr = sys.modules["clover_tpu.ops.threshold"]

REPS = 7
K1, K2 = 1, 257
FANS = (9, 27, 81, 243)


def build_chain(q, k, fan):
    thr.BISECT_FAN = fan

    def make(iters):
        @jax.jit
        def g(codes, scales):
            def body(i, carry):
                s = carry
                q2 = type(q)(codes=codes, scales=scales + s * 1e-30,
                             length=q.length)
                out = ct.threshold(q2, k)
                return s + jnp.sum(
                    out.codes[:1].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(q.codes, q.scales))
    f1, f2 = make(K1), make(K2)
    f1(); f2()                      # trace under this fan + warm
    out = ct.threshold(q, k)        # correctness snapshot under this fan
    thr.BISECT_FAN = 9
    return (f1, f2), np.asarray(out.codes)


def run_size(bits, n, k, fans=FANS):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n, dtype=np.float32) * 2 - 1)
    q = ct.quantize(x, bits, key=None)
    chains, ref_codes = {}, None
    for fan in fans:
        chains[fan], codes = build_chain(q, k, fan)
        if ref_codes is None:
            ref_codes = codes
        else:
            assert np.array_equal(codes, ref_codes), \
                f"fan={fan} changed the output at {bits}-bit n={n} k={k}"
    diffs = {fan: [] for fan in fans}
    for _ in range(REPS):
        for fan, (f1, f2) in chains.items():
            t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
            diffs[fan].append((t2 - t1) / (K2 - K1))
    nbytes = 2 * q.nbytes
    print(f"\n{bits}-bit n=2^{n.bit_length()-1} k={k}:", flush=True)
    for fan, d in diffs.items():
        dt = float(np.median(d))
        print(f"  fan={fan:<4d} ({thr._bisect_levels(fan):2d} levels) "
              f"{dt*1e6:8.1f} us  {nbytes/dt/1e9:6.1f} GB/s", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    # XLA wide-view path sizes (kernel caps: 4-bit <= 2^17, 8-bit <= 2^20)
    for n in (1 << 18, 1 << 20, 1 << 22):
        run_size(4, n, 64)
    run_size(4, 1 << 20, (1 << 20) // 4)      # solver regime K = n/4
    run_size(8, 1 << 21, 64)                  # 8-bit dense-bisect path
    # fused-kernel path sizes (fan=243 unrolls 242 in-kernel reduces per
    # level -- Mosaic compile blowup risk; sweep up to 81 there)
    for n in (1 << 16, 1 << 17):
        run_size(4, n, 64, fans=(9, 27, 81))
    run_size(8, 1 << 20, 64, fans=(9, 27, 81))  # 8-bit kernel at its cap


if __name__ == "__main__":
    main()
