"""Headline benchmark: 4-bit fused MVM bandwidth as % of HBM roofline at
n=16K, plus fp32-relative speedup and IHT iterations/sec.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline (reference, BASELINE.md): parallel 4-bit MVM sustains ~83% of the
Xeon's 25.6 GB/s DRAM roofline and 8.03-8.23x over fp32 at large n.
vs_baseline = (our % of HBM roofline) / 83.

Timing methodology: the axon TPU tunnel does not block on
block_until_ready, so every measurement forces a scalar device->host
fetch and differences two dependent-chain lengths (K2 - K1 iterations)
to cancel the ~30 ms round-trip (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import clover_tpu as ct

N = 16384
K1, K2 = 1, 9
REPS = 5

# TPU v5e (v5 lite) HBM bandwidth.
HBM_ROOFLINE = 819e9
REF_PCT_OF_ROOFLINE = 83.0
REF_SPEEDUP_VS_FP32 = 8.13  # midpoint of the reference's 8.03-8.23x


def _chain_time(fn, *args):
    """Median time of one op in a dependent chain, via K2-K1 differencing."""
    f1 = jax.jit(partial(fn, iters=K1), static_argnames=())
    f2 = jax.jit(partial(fn, iters=K2), static_argnames=())
    float(f1(*args))  # compile + warm
    float(f2(*args))

    def timed(f):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (timed(f2) - timed(f1)) / (K2 - K1)


def bench_mvm_4bit(qA, qx):
    def chain(qA, qx, iters):
        def body(i, x):
            return ct.mvm(qA, x)          # 4-bit in, 4-bit out
        x = jax.lax.fori_loop(0, iters, body, qx)
        return jnp.sum(x.scales)          # force full execution
    return _chain_time(chain, qA, qx)


def bench_mvm_fp32(A, x):
    def chain(A, x, iters):
        def body(i, v):
            y = A @ v
            return y / (jnp.max(jnp.abs(y)) + 1e-30)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
    return _chain_time(chain, A, x)


def bench_iht_iters_per_sec(qphi, qphit, qy, k, mu, key):
    from clover_tpu.models.solvers import _solve
    from clover_tpu.formats import zeros_vector

    def run(iters):
        x0 = zeros_vector(4, qphi.cols)
        res = _solve(qphi, qphit, qy, x0, None, iters, k,
                     jnp.float32(mu), key)
        return float(jnp.sum(res.x.scales))

    # wide iteration spread so the ~30ms tunnel round-trip noise cancels
    for it in (2, 102):
        run(it)  # compile
    def timed(it):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(it)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    per_iter = (timed(102) - timed(2)) / 100
    return 1.0 / max(per_iter, 1e-9)


def main():
    rng = np.random.default_rng(0)
    A = (rng.random((N, N), dtype=np.float32) * 2 - 1)
    x = (rng.random(N, dtype=np.float32) * 2 - 1)

    qA = ct.quantize(jnp.asarray(A), 4)
    qx = ct.quantize(jnp.asarray(x), 4)
    qA = jax.device_put(qA)

    t4 = bench_mvm_4bit(qA, qx)
    bytes_4 = qA.nbytes  # packed codes + tile scales (vector negligible)
    gbs_4 = bytes_4 / t4 / 1e9
    pct = 100.0 * gbs_4 * 1e9 / HBM_ROOFLINE

    t32 = bench_mvm_fp32(jnp.asarray(A), jnp.asarray(x))
    speedup = t32 / t4

    # IHT end-to-end on a solver-sized problem
    m_i, n_i = 4096, 8192
    Phi = (rng.random((m_i, n_i), dtype=np.float32) * 2 - 1)
    y = Phi @ (rng.random(n_i, dtype=np.float32))
    qphi = ct.quantize(jnp.asarray(Phi), 4)
    qphit = ct.transpose(qphi)
    qy = ct.quantize(jnp.asarray(y / np.abs(y).max()), 4)
    iht_ips = bench_iht_iters_per_sec(qphi, qphit, qy, n_i // 4, 1e-4,
                                      jax.random.PRNGKey(0))

    result = {
        "metric": "4bit_mvm_pct_hbm_roofline_n16k",
        "value": round(pct, 2),
        "unit": "% of 819 GB/s",
        "vs_baseline": round(pct / REF_PCT_OF_ROOFLINE, 3),
        "detail": {
            "mvm4_gbs": round(gbs_4, 1),
            "mvm4_ms": round(t4 * 1e3, 3),
            "fp32_mvm_ms": round(t32 * 1e3, 3),
            "speedup_vs_fp32": round(speedup, 2),
            "ref_speedup_vs_fp32": REF_SPEEDUP_VS_FP32,
            "iht_iters_per_sec_4bit_4096x8192": round(iht_ips, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
