"""Round-3 MVM evidence dossier runs (VERDICT r2 weak #1 b,c).

(b) dimension_semantics swept on the FULL fused 4x4 kernel (r2 swept it
    only on DMA-only probes): row grid "arbitrary" vs "parallel" via the
    CLOVER_MVM_ROW_SEMANTICS hook (kernels/mvm.py _build_call; the
    lru_cache is cleared between builds so both variants coexist).
(c) n=32768 probe (536 MB packed): if the ~740 GB/s grid-DMA ceiling
    were per-call overhead, 4x the bytes must push the measured rate
    toward spec; if it is a true stream ceiling, the rate stays flat.
    Both the DMA-only probe and the full kernel run at 16K and 32K.

Protocol: jitted dependent chains, two lengths paired-differenced,
variants interleaved round-robin in one process, median of 7
(harness/timing.py rules).  Results: mvm_dossier_r3.md.
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
from clover_tpu.kernels.probes import dma_probe_call

REPS = 7


def kernel_chain(qA, qx, k1, k2):
    """Paired-diff chain of y <- mvm_pallas(A, y) (deterministic)."""
    from clover_tpu.kernels.mvm import mvm_pallas

    def make(iters):
        @jax.jit
        def g(qA, qx):
            def body(i, x):
                return mvm_pallas(qA, x)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
        return lambda: float(g(qA, qx))
    f1, f2 = make(k1), make(k2)
    f1(); f2()
    return f1, f2


def probe_chain(qA, k1, k2):
    make, nbytes = dma_probe_call(qA)
    f1, f2 = make(k1), make(k2)
    f1(); f2()
    return (f1, f2), nbytes


def measure(variants, k1, k2, reps=REPS):
    """Round-robin paired diffs; variants: {name: (f1, f2)}."""
    diffs = {k: [] for k in variants}
    for _ in range(reps):
        for k, (f1, f2) in variants.items():
            t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
            diffs[k].append((t2 - t1) / (k2 - k1))
    return {k: float(np.median(v)) for k, v in diffs.items()}


def build_q(n, seed):
    key = jax.random.PRNGKey(seed)
    A = jax.random.uniform(key, (n, n), jnp.float32, -1.0, 1.0)
    qA = ct.quantize(A, 4, key=None)
    del A
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n,), jnp.float32,
                           -1.0, 1.0)
    qx = ct.quantize(x, 4, key=None)
    return qA, qx


def main():
    import clover_tpu.kernels.mvm as kmvm
    print(f"backend={jax.default_backend()}", flush=True)

    for n, (k1, k2) in ((16384, (1, 129)), (32768, (1, 33))):
        qA, qx = build_q(n, seed=n)
        nbytes = qA.codes.nbytes
        print(f"\n=== n={n} (packed {nbytes/1e6:.0f} MB) ===", flush=True)

        variants = {}
        # full kernel, row semantics "arbitrary" (shipped default)
        os.environ["CLOVER_MVM_ROW_SEMANTICS"] = "arbitrary"
        kmvm._build_call.cache_clear()
        variants["kernel_row_arbitrary"] = kernel_chain(qA, qx, k1, k2)
        # full kernel, row semantics "parallel"
        os.environ["CLOVER_MVM_ROW_SEMANTICS"] = "parallel"
        kmvm._build_call.cache_clear()
        variants["kernel_row_parallel"] = kernel_chain(qA, qx, k1, k2)
        os.environ.pop("CLOVER_MVM_ROW_SEMANTICS")
        kmvm._build_call.cache_clear()
        # same-grid DMA-only probe
        variants["dma_only"], _ = probe_chain(qA, k1, k2)

        for name, dt in measure(variants, k1, k2).items():
            print(f"{name:24s} {dt*1e6:9.1f} us  {nbytes/dt/1e9:6.1f} GB/s"
                  f"  {100*nbytes/dt/819e9:5.1f}% of spec", flush=True)
        del qA, qx, variants


if __name__ == "__main__":
    main()
