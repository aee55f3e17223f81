import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from clover_tpu.kernels.iteration import (
    iteration_chain_pallas, iteration_chain_pallas_eligible, iteration_pallas)
from clover_tpu.harness.timing import chain_time
from clover_tpu.models import solvers
from clover_tpu.formats import zeros_vector
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)

def mk(m, n, mb, vb):
    Phi = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    yv = Phi @ (rng.random(n, dtype=np.float32) * 2 - 1)
    yv = yv / np.abs(yv).max()
    xv = rng.random(n, dtype=np.float32) * 2 - 1
    qPhi = ct.quantize(jnp.asarray(Phi), mb)
    return qPhi, ct.transpose(qPhi), ct.quantize(jnp.asarray(yv), vb), ct.quantize(jnp.asarray(xv), vb)

# 1. bit-identity on-chip: chained vs unchained sequence, det + SR
from clover_tpu.models.solvers import _op_seeds
for (m, n, mb, vb) in [(512, 1024, 4, 4), (2048, 4096, 4, 4), (2048, 4096, 4, 8), (1024, 2048, 4, 4)]:
    qPhi, qPhiT, qy, qx = mk(m, n, mb, vb)
    k = n // 4
    for tag, seeds8 in [("det", (None,)*8),
                        ("sr", tuple(1000 + 7*j for j in range(8)))]:
        got = iteration_chain_pallas(qPhi, qPhiT, qy, qx, 1e-3, k, seeds8)
        x = qx
        for itr in range(2):
            s4 = seeds8[4*itr:4*itr+4]
            x = iteration_pallas(qPhi, qPhiT, qy, x, 1e-3, s4)
            x = ct.threshold(x, k)
        same_c = np.array_equal(np.asarray(got.codes), np.asarray(x.codes))
        same_s = np.array_equal(np.asarray(got.scales), np.asarray(x.scales))
        print(f"{m}x{n} {mb}x{vb} {tag}: codes={same_c} scales={same_s}", flush=True)

# 2. solver-level speed: chained vs unchained, 2048x4096, 400-iter chains
m, n = 2048, 4096
qPhi, qPhiT, qy, _ = mk(m, n, 4, 4)
import os

def iht_time(chain_flag):
    os.environ["CLOVER_ITER_CHAIN"] = chain_flag
    solvers._solve.clear_cache()
    def run(iters):
        x0 = zeros_vector(4, n)
        res = solvers._solve(qPhi, qPhiT, qy, x0, None, iters, n // 4,
                             jnp.float32(1e-4), jnp.asarray([3], jnp.int32))
        return float(jnp.sum(res.x.scales[:1]))
    for it in (2, 402):
        run(it)
    def timed(it):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); run(it); ts.append(time.perf_counter()-t0)
        return float(np.median(ts))
    diffs = sorted((timed(402) - timed(2)) / 400 for _ in range(3))
    return diffs[1]

for rnd in range(2):
    t_un = iht_time("0")
    t_ch = iht_time("1")
    print(f"r{rnd} per-iter unchained {t_un*1e6:6.2f} us  chained {t_ch*1e6:6.2f} us  speedup {t_un/t_ch:.3f}x", flush=True)
