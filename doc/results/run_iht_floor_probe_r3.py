"""Small-size launch/stream floor probes (item 4 closing evidence).

Floor model per solver leg (an (m, n) fused MVM+AXPY launch):

    floor(leg) ~= leg_codes_bytes / stream_rate(same tile geometry)
                  + launch_overhead

- ``stream_rate`` comes from kernels/probes.dma_probe_stream: the leg's
  codes stacked to >= 512 MB and streamed through the SAME (TM, KA)
  BlockSpec pipeline (a small codes array carried directly gets pinned
  in the 128 MiB VMEM by XLA and measures NOTHING — both earlier
  floor-probe sessions produced pure-jitter negative diffs that way;
  the stacked form keeps the buffer loop-invariant in HBM and threads
  the chain dependency through a tiny salt input).
- ``launch_overhead`` comes from kernels/probes.launch_probe: a minimal
  grid-(1,1) VMEM-resident pallas launch.

If the measured leg sits near that sum, the residual vs the pure stream
bound is launch/pipeline latency the hardware cannot hide — VERDICT r2
item 4's alternative done-criterion.  Everything for one size runs
interleaved in one chip state (paired-diff chains, median of 9).
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
from clover_tpu.kernels.probes import dma_probe_stream, launch_probe
from clover_tpu.models import solvers
from clover_tpu.ops.mvm import mvm_axpy

REPS = 9
KP_SOLVER = (2, 1002)
KP_LEG = (2, 402)
# stream probe: ~0.7 ms/step (512 MB at ~740 GB/s)
KP_STREAM = (1, 65)
# launch probe: ~5 us/step expected
KP_LAUNCH = (2, 8002)


def chain(f_of_iters, pair):
    f1, f2 = f_of_iters(pair[0]), f_of_iters(pair[1])
    f1(); f2()
    return f1, f2, pair[1] - pair[0]


def solver_chain(qphi, qphit, qy, k):
    def run(iters):
        x0 = zeros_vector(4, qphi.cols)
        res = solvers._solve(qphi, qphit, qy, x0, None, iters, k,
                             jnp.float32(1e-4), None)
        return float(jnp.sum(res.x.scales[:1]))
    return chain(lambda it: (lambda: run(it)), KP_SOLVER)


def leg_chain(qmat, qvec, qout, alpha):
    """standalone fused MVM+AXPY launch, scales-perturbation dependency"""
    def make(iters):
        @jax.jit
        def g(codes, scales):
            def body(i, s):
                qv2 = type(qvec)(codes=codes, scales=scales + s * 1e-30,
                                 length=qvec.length)
                t2 = mvm_axpy(qmat, qv2, qout, alpha)
                return s + jnp.sum(t2.scales[:1])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(qvec.codes, qvec.scales))
    return chain(make, KP_LEG)


def measure(variants, reps=REPS):
    diffs = {k: [] for k in variants}
    for _ in range(reps):
        for k, (f1, f2, dk) in variants.items():
            t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
            diffs[k].append((t2 - t1) / dk)
    return {k: float(np.median(v)) for k, v in diffs.items()}


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)

    # launch overhead once (size-independent)
    lv = {"launch": chain(launch_probe(), KP_LAUNCH)}
    t_launch = measure(lv)["launch"]
    print(f"pallas launch overhead: {t_launch*1e6:.1f} us", flush=True)

    for (m, n) in ((1024, 2048), (2048, 4096), (4096, 8192)):
        Phi = rng.random((m, n), dtype=np.float32) * 2 - 1
        yv = Phi @ rng.random(n, dtype=np.float32)
        qphi = ct.quantize(jnp.asarray(Phi), 4)
        qphit = ct.transpose(qphi)
        qy = ct.quantize(jnp.asarray(yv / np.abs(yv).max()), 4)
        qx = ct.quantize(jnp.asarray(rng.random(n, np.float32) * 2 - 1), 4)
        qxn = zeros_vector(4, n)

        mkA, bA, pA = dma_probe_stream(qphi)
        mkB, bB, pB = dma_probe_stream(qphit)
        variants = {
            "iht_per_iter": solver_chain(qphi, qphit, qy, n // 4),
            "legA": leg_chain(qphi, qx, qy, -1.0),
            "legB": leg_chain(qphit, qy, qxn, 1e-4),
            "streamA": chain(mkA, KP_STREAM),
            "streamB": chain(mkB, KP_STREAM),
        }
        res = measure(variants)
        rA = bA / res["streamA"]          # bytes/s at leg-A geometry
        rB = bB / res["streamB"]
        floorA = qphi.codes.nbytes / rA + t_launch
        floorB = qphit.codes.nbytes / rB + t_launch
        nbytes = 2 * qphi.nbytes
        print(f"\n=== {m}x{n} ===", flush=True)
        print(f"  stream rate  A {rA/1e9:6.1f} GB/s   B {rB/1e9:6.1f} GB/s"
              f"  (stacked x{pA}/x{pB})", flush=True)
        print(f"  legA  {res['legA']*1e6:6.1f} us   floorA {floorA*1e6:6.1f} us"
              f"  ({res['legA']/floorA:4.2f}x)", flush=True)
        print(f"  legB  {res['legB']*1e6:6.1f} us   floorB {floorB*1e6:6.1f} us"
              f"  ({res['legB']/floorB:4.2f}x)", flush=True)
        it = res["iht_per_iter"]
        fl = floorA + floorB
        print(f"  iht/iter {it*1e6:6.1f} us   legs floor {fl*1e6:6.1f} us "
              f"({it/fl:4.2f}x); {nbytes/it/1e9:5.1f} GB/s "
              f"({100*nbytes/it/819e9:4.1f}% roof)", flush=True)


if __name__ == "__main__":
    main()
