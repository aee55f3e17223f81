"""Small-problem IHT latency decomposition (VERDICT r2 item 4).

4-bit IHT at 2048x4096 ran at 29.4% of roofline (3.2x fp32) in round 2 vs
the reference's 8.85x at N=2048 — the latency-dominated regime never got
the per-leg decomposition the big ops did.  This run produces it:

  per-iteration total        iht(m,n) solver scan, diffed 2 vs 402 iters
  minus-threshold total      gd(m,n) — the identical iteration without
                             the top-K (the threshold's true IN-LOOP cost
                             is t_iht - t_gd, launch context included)
  mvm_axpy leg A / leg B     standalone dependent chains per launch
  threshold standalone       n-length 4-bit top-K chain
  scan overhead              a scan whose body only perturbs the carry

Sizes: 1024x2048, 2048x4096, 4096x8192.  Protocol: paired-diff chains,
variants interleaved, median of 7 (harness/timing.py).
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
from clover_tpu.formats import zeros_vector
from clover_tpu.models.solvers import _solve
from clover_tpu.ops.mvm import mvm_axpy

REPS = 7
HBM = 819e9


def solver_chain(qphi, qphit, qy, k_iters_pair, k):
    k1, k2 = k_iters_pair

    def run(iters):
        x0 = zeros_vector(4, qphi.cols)
        res = _solve(qphi, qphit, qy, x0, None, iters, k,
                     jnp.float32(1e-4), None)
        return float(jnp.sum(res.x.scales[:1]))
    run(k1); run(k2)
    return (lambda: run(k1)), (lambda: run(k2))


def op_chain(step, args0, k_pair):
    k1, k2 = k_pair

    def make(iters):
        @jax.jit
        def g(*args):
            def body(i, carry):
                return step(i, carry, *args[1:])
            out = jax.lax.fori_loop(0, iters, body, args[0])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf[:1].astype(jnp.float32))
        return lambda: float(g(*args0))
    f1, f2 = make(k1), make(k2)
    f1(); f2()
    return f1, f2


def measure(variants, dk, reps=REPS):
    diffs = {k: [] for k in variants}
    for _ in range(reps):
        for k, (f1, f2) in variants.items():
            t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
            diffs[k].append((t2 - t1) / dk)
    return {k: float(np.median(v)) for k, v in diffs.items()}


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)
    for (m, n) in ((1024, 2048), (2048, 4096), (4096, 8192)):
        Phi = rng.random((m, n), dtype=np.float32) * 2 - 1
        yv = Phi @ rng.random(n, dtype=np.float32)
        qphi = ct.quantize(jnp.asarray(Phi), 4)
        qphit = ct.transpose(qphi)
        qy = ct.quantize(jnp.asarray(yv / np.abs(yv).max()), 4)
        qx = ct.quantize(jnp.asarray(rng.random(n, np.float32) * 2 - 1), 4)
        k = n // 4
        KP = (2, 402)
        dk = KP[1] - KP[0]

        variants = {
            "iht_per_iter": solver_chain(qphi, qphit, qy, KP, k),
            "gd_per_iter": solver_chain(qphi, qphit, qy, KP, None),
        }

        # standalone legs, chained via a scales perturbation (data dep)
        def legA_step(i, carry, codes, scales, qphi, qy, qx):
            s = carry
            qx2 = type(qx)(codes=codes, scales=scales + s[0] * 1e-30,
                           length=qx.length)
            t2 = mvm_axpy(qphi, qx2, qy, -1.0)
            return s.at[0].set(jnp.sum(t2.scales[:1]))
        variants["mvm_axpy_A"] = op_chain(
            legA_step, (jnp.zeros(1, jnp.float32), qx.codes, qx.scales,
                        qphi, qy, qx), KP)

        def legB_step(i, carry, codes, scales, qphit, qy2, qy):
            s = carry
            qy_2 = type(qy)(codes=codes, scales=scales + s[0] * 1e-30,
                            length=qy.length)
            x = mvm_axpy(qphit, qy_2, qy2, 1e-4)
            return s.at[0].set(jnp.sum(x.scales[:1]))
        qxn = zeros_vector(4, n)
        variants["mvm_axpy_B"] = op_chain(
            legB_step, (jnp.zeros(1, jnp.float32), qy.codes, qy.scales,
                        qphit, qxn, qy), KP)

        def thr_step(i, carry, codes, scales):
            s = carry
            q2 = type(qx)(codes=codes, scales=scales + s[0] * 1e-30,
                          length=qx.length)
            out = ct.threshold(q2, k)
            return s.at[0].set(
                jnp.sum(out.codes[:1].astype(jnp.float32)))
        variants["threshold_alone"] = op_chain(
            thr_step, (jnp.zeros(1, jnp.float32), qx.codes, qx.scales), KP)

        def empty_step(i, carry):
            return carry * jnp.float32(1.0000001)
        variants["loop_overhead"] = op_chain(
            empty_step, (jnp.ones(1, jnp.float32),), KP)

        res = measure(variants, dk)
        nbytes = 2 * qphi.nbytes
        print(f"\n=== {m}x{n} (K={k}) ===", flush=True)
        for name, dt in res.items():
            extra = ""
            if name == "iht_per_iter":
                extra = (f"  -> {nbytes/dt/1e9:5.1f} GB/s "
                         f"{100*nbytes/dt/HBM:5.1f}% roof")
            print(f"{name:18s} {dt*1e6:8.1f} us{extra}", flush=True)
        print(f"{'thr_in_loop':18s} "
              f"{(res['iht_per_iter']-res['gd_per_iter'])*1e6:8.1f} us "
              f"(iht - gd)", flush=True)
        print(f"{'legs_sum':18s} "
              f"{(res['mvm_axpy_A']+res['mvm_axpy_B'])*1e6:8.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
