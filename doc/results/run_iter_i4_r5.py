"""Round-5: int4 legs in the whole-iteration/chained solver kernels —
bit-parity + end-to-end solver timing vs the packed-int8 legs.
Produced the numbers in mvm_i4_ablation_r5.md §4 / ROUND5_NOTES.md §1.
"""
import sys
sys.path.insert(0, "/root/repo")
import os, time
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from clover_tpu.kernels import mat4_i4_stream
from clover_tpu.kernels.iteration import (iteration_chain_pallas,
                                          iteration_pallas)
from clover_tpu.formats import zeros_vector
from clover_tpu.models import solvers

assert jax.default_backend() == "tpu"
key = jax.random.PRNGKey(11)
rng = np.random.default_rng(5)

for (m, n) in ((2048, 4096), (4096, 8192)):
    Phi = jax.random.uniform(key, (m, n), jnp.float32, -1.0, 1.0)
    yv = np.asarray(Phi) @ (rng.random(n).astype(np.float32))
    xv = rng.random(n).astype(np.float32) - 0.5
    qphi = ct.quantize(Phi, 4); qphit = ct.transpose(qphi)
    qy = ct.quantize(jnp.asarray(yv / np.abs(yv).max()), 4)
    qx = ct.quantize(jnp.asarray(xv), 4)
    seeds4 = tuple(jnp.asarray([s], jnp.int32) for s in (11, 22, 33, 44))
    k = n // 4

    @jax.jit
    def run(qphi, qphit, qy, qx):
        a4s = (mat4_i4_stream(qphi), mat4_i4_stream(qphit))
        return (iteration_pallas(qphi, qphit, qy, qx, 1e-3),
                iteration_pallas(qphi, qphit, qy, qx, 1e-3, a_i4s=a4s),
                iteration_pallas(qphi, qphit, qy, qx, 1e-3, seeds4),
                iteration_pallas(qphi, qphit, qy, qx, 1e-3, seeds4,
                                 a_i4s=a4s),
                iteration_chain_pallas(qphi, qphit, qy, qx, 1e-3, k,
                                       seeds4 + seeds4),
                iteration_chain_pallas(qphi, qphit, qy, qx, 1e-3, k,
                                       seeds4 + seeds4, a_i4s=a4s))
    r1, r2, s1, s2, c1, c2 = jax.tree.map(np.asarray,
                                          run(qphi, qphit, qy, qx))

    def eq(a, b):
        return (np.array_equal(a.codes, b.codes)
                and np.array_equal(a.scales, b.scales))
    print(f"{m}x{n}: iter det {eq(r1, r2)}  iter SR {eq(s1, s2)}  "
          f"chain SR {eq(c1, c2)}", flush=True)

    def time_solver():
        def run(iters):
            res = solvers._solve(qphi, qphit, qy, zeros_vector(4, n),
                                 None, iters, k, jnp.float32(1e-4),
                                 jax.random.PRNGKey(0))
            return float(jnp.sum(res.x.scales))
        run(2); run(402)

        def timed(it):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter(); run(it)
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return sorted((timed(402) - timed(2)) / 400 for _ in range(3))[1]

    os.environ["CLOVER_MVM_I4"] = "1"; solvers._solve.clear_cache()
    t1 = time_solver()
    os.environ["CLOVER_MVM_I4"] = "0"; solvers._solve.clear_cache()
    t0 = time_solver()
    os.environ["CLOVER_MVM_I4"] = "1"; solvers._solve.clear_cache()
    print(f"{m}x{n}: i4 {t1*1e6:.1f} us/iter ({1/t1:.0f} it/s)   packed "
          f"{t0*1e6:.1f} us/iter ({1/t0:.0f} it/s)   speedup {t0/t1:.3f}",
          flush=True)
