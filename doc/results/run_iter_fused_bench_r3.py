"""Fused whole-iteration kernel vs the two-launch path (VERDICT r2 item 4).

Per-iteration IHT time with a scan driving (a) the fused whole-iteration
kernel (kernels/iteration.py) and (b) the two-launch mvm_axpy_pallas
path, interleaved in one chip state (paired-diff chains, median of 9).
Both scans mirror models/solvers._iteration (threshold in-loop,
deterministic seeds).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from clover_tpu.utils.compcache import enable as _enable
_enable()

import jax
import jax.numpy as jnp

import clover_tpu as ct
from clover_tpu.formats import zeros_vector
from clover_tpu.kernels.iteration import (iteration_pallas,
                                          iteration_pallas_eligible)
from clover_tpu.kernels.mvm import mvm_axpy_pallas
from clover_tpu.ops import threshold

REPS = 9
# Chain length via env: small sizes need ~8000 iters of signal against
# the tunnel's multi-ms jitter (a (2,1002) run measured NEGATIVE diffs
# at 512x1024 in a jittery window).
KP = (2, int(os.environ.get("ITER_BENCH_K2", "1002")))
HBM = 819e9


@partial(jax.jit, static_argnames=("iters", "k"))
def run_fused(qphi, qphit, qy, x0, mu, iters, k):
    def body(x, it):
        x = iteration_pallas(qphi, qphit, qy, x, mu)
        return threshold(x, k), jnp.float32(0)
    x, _ = jax.lax.scan(body, x0, jnp.arange(iters, dtype=jnp.int32))
    return x


@partial(jax.jit, static_argnames=("iters", "k"))
def run_two(qphi, qphit, qy, x0, mu, iters, k):
    def body(x, it):
        t2 = mvm_axpy_pallas(qphi, x, qy, -1.0)
        x = mvm_axpy_pallas(qphit, t2, x, mu)
        return threshold(x, k), jnp.float32(0)
    x, _ = jax.lax.scan(body, x0, jnp.arange(iters, dtype=jnp.int32))
    return x


def chain(fn, qphi, qphit, qy, k):
    def run(iters):
        x0 = zeros_vector(qy.bits, qphi.cols)
        res = fn(qphi, qphit, qy, x0, jnp.float32(1e-4), iters, k)
        return float(jnp.sum(res.scales[:1]))
    f1 = lambda: run(KP[0])
    f2 = lambda: run(KP[1])
    f1(); f2()
    return f1, f2


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)
    import ast
    combos = ast.literal_eval(os.environ.get(
        "ITER_BENCH_COMBOS",
        "[((512,1024),(4,4)),((512,1024),(4,8)),((512,1024),(8,8)),"
        "((1024,2048),(4,4)),((1024,2048),(4,8)),((1024,2048),(8,8)),"
        "((2048,4096),(4,4)),((2048,4096),(4,8)),((2048,4096),(8,8)),"
        "((4096,8192),(4,4)),((4096,8192),(4,8)),((4096,8192),(8,8))]"))
    for (m, n), (mb, vb) in combos:
        if True:
            Phi = rng.random((m, n), dtype=np.float32) * 2 - 1
            yv = Phi @ rng.random(n, dtype=np.float32)
            qphi = ct.quantize(jnp.asarray(Phi), mb)
            qphit = ct.transpose(qphi)
            qy = ct.quantize(jnp.asarray(yv / np.abs(yv).max()), vb)
            x0 = zeros_vector(vb, qphi.cols)
            if not iteration_pallas_eligible(qphi, qphit, qy, x0):
                print(f"\n=== {m}x{n} {mb}x{vb}: NOT eligible ===",
                      flush=True)
                continue

            # parity first (deterministic)
            xa = run_fused(qphi, qphit, qy, x0, jnp.float32(1e-4), 3, n // 4)
            xb = run_two(qphi, qphit, qy, x0, jnp.float32(1e-4), 3, n // 4)
            assert np.array_equal(np.asarray(xa.codes), np.asarray(xb.codes))
            assert np.array_equal(np.asarray(xa.scales),
                                  np.asarray(xb.scales))

            variants = {
                "two_launch": chain(run_two, qphi, qphit, qy, n // 4),
                "iter_fused": chain(run_fused, qphi, qphit, qy, n // 4),
            }
            diffs = {k: [] for k in variants}
            for _ in range(REPS):
                for k, (f1, f2) in variants.items():
                    t0 = time.perf_counter(); f2()
                    t2 = time.perf_counter() - t0
                    t0 = time.perf_counter(); f1()
                    t1 = time.perf_counter() - t0
                    diffs[k].append((t2 - t1) / (KP[1] - KP[0]))
            res = {k: float(np.median(v)) for k, v in diffs.items()}
            nbytes = 2 * qphi.nbytes
            print(f"\n=== {m}x{n} {mb}x{vb} (3-iter parity OK) ===",
                  flush=True)
            for k, dt in res.items():
                print(f"  {k:12s} {dt*1e6:7.1f} us  {nbytes/dt/1e9:6.1f} "
                      f"GB/s  {100*nbytes/dt/HBM:5.1f}% roof", flush=True)
            print(f"  speedup {res['two_launch']/res['iter_fused']:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
