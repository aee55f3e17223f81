"""Small-problem MVM-kernel geometry sweep (VERDICT r2 item 4 follow-up).

The round-3 decomposition (run_iht_small_decomp_r3.py) showed the small-
size IHT iteration IS its two fused mvm_axpy launches (threshold ~1.7 us,
loop overhead ~0): at 2048x4096 each 4.2 MB leg takes ~13-14 us vs a
~5.6 us pure-stream bound — per-launch overhead and a 2x1 grid that
cannot pipeline.  This sweeps (TM, TK) via the CLOVER_MVM_TM/TK env
hooks on the full solver (both legs), per size, interleaved.

Results -> the _pick_geometry small-size rule + iht_small_r3.md.
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
import clover_tpu.kernels.mvm as kmvm
from clover_tpu.formats import zeros_vector
from clover_tpu.models import solvers

REPS = 7
KP = (2, 402)
HBM = 819e9


def build_solver_chain(qphi, qphit, qy, k):
    solvers._solve.clear_cache()

    def run(iters):
        x0 = zeros_vector(4, qphi.cols)
        res = solvers._solve(qphi, qphit, qy, x0, None, iters, k,
                             jnp.float32(1e-4), None)
        return float(jnp.sum(res.x.scales[:1]))
    run(KP[0]); run(KP[1])
    return (lambda: run(KP[0])), (lambda: run(KP[1]))


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)
    for (m, n) in ((1024, 2048), (2048, 4096), (4096, 8192)):
        Phi = rng.random((m, n), dtype=np.float32) * 2 - 1
        yv = Phi @ rng.random(n, dtype=np.float32)
        qphi = ct.quantize(jnp.asarray(Phi), 4)
        qphit = ct.transpose(qphi)
        qy = ct.quantize(jnp.asarray(yv / np.abs(yv).max()), 4)
        k = n // 4
        nbytes = 2 * qphi.nbytes

        geoms = [("default", None, None)]
        for tm in (512, 256, 128):
            geoms.append((f"tm{tm}", tm, None))
        for tm, tk in ((256, 1024), (128, 1024), (256, 2048), (512, 2048)):
            # both legs must divide: leg A is (m, n), leg B is (n, m)
            if m % tm == 0 and n % tm == 0 and n % tk == 0 and m % tk == 0:
                geoms.append((f"tm{tm}_tk{tk}", tm, tk))

        chains = {}
        for name, tm, tk in geoms:
            if tm is None:
                os.environ.pop("CLOVER_MVM_TM", None)
                os.environ.pop("CLOVER_MVM_TK", None)
            else:
                os.environ["CLOVER_MVM_TM"] = str(tm)
                if tk is None:
                    os.environ.pop("CLOVER_MVM_TK", None)
                else:
                    os.environ["CLOVER_MVM_TK"] = str(tk)
            kmvm._build_call.cache_clear()
            # the kernel must stay eligible for BOTH legs under this
            # geometry, or the chain silently times the XLA fallback
            if not (kmvm.mvm_pallas_eligible(qphi, qy)
                    and kmvm.mvm_pallas_eligible(qphit, qy)):
                print(f"  {name}: ineligible for a leg — skipped",
                      flush=True)
                continue
            try:
                chains[name] = build_solver_chain(qphi, qphit, qy, k)
            except Exception as e:
                print(f"  {name}: build failed: {type(e).__name__}",
                      flush=True)
        os.environ.pop("CLOVER_MVM_TM", None)
        os.environ.pop("CLOVER_MVM_TK", None)
        kmvm._build_call.cache_clear()

        diffs = {nm: [] for nm in chains}
        for _ in range(REPS):
            for nm, (f1, f2) in chains.items():
                t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
                t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
                diffs[nm].append((t2 - t1) / (KP[1] - KP[0]))
        print(f"\n=== IHT 4-bit {m}x{n} per-iteration ===", flush=True)
        for nm, d in diffs.items():
            dt = float(np.median(d))
            print(f"  {nm:14s} {dt*1e6:8.1f} us  {nbytes/dt/1e9:6.1f} GB/s"
                  f"  {100*nbytes/dt/HBM:5.1f}% roof", flush=True)


if __name__ == "__main__":
    main()
