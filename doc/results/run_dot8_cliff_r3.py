"""8-bit dot n=2^25 cliff investigation (VERDICT r2 item 7).

r2's table shows 8-bit dot dropping 377 -> 298 GB/s from n=2^24 to 2^25
with no explanation.  The kernel geometry is identical per grid step at
both sizes (rt=1024 row tiles of 1024 int8 lanes; only the grid count
doubles), so the suspects are (a) the row-tile size interacting with
VMEM/DMA at the larger grid, (b) the timing protocol's carried
.at[0].add on a 32 MB codes array, (c) a real bandwidth regime.  This
sweeps rt via RT_CAP x {256, 512, 1024, 2048} at 2^24 and 2^25 with the
same interleaved paired-diff protocol, plus a no-carry variant that
perturbs only the scales to separate protocol cost from kernel cost
(scales-only perturbation is hoistable for the XLA path but NOT for the
opaque pallas_call, which re-runs whole).
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
import clover_tpu.kernels.dot as kdot

REPS = 7
K1, K2 = 1, 129


def build_chain(qu, qv, carry_codes: bool):
    from clover_tpu.kernels.dot import dot_pallas

    def make(iters):
        if carry_codes:
            @jax.jit
            def g(codes, scales, qv):
                def body(i, carry):
                    c, s = carry
                    qu2 = type(qu)(codes=c, scales=scales, length=qu.length)
                    d = dot_pallas(qu2, qv)
                    delta = jax.lax.convert_element_type(d * 1e-37, jnp.int8)
                    return (c.at[0].add(delta), s + d)
                _, s = jax.lax.fori_loop(0, iters, body,
                                         (codes, jnp.float32(0)))
                return s
            return lambda: float(g(qu.codes, qu.scales, qv))
        @jax.jit
        def g(codes, scales, qv):
            def body(i, s):
                qu2 = type(qu)(codes=codes, scales=scales + s * 1e-37,
                               length=qu.length)
                return s + dot_pallas(qu2, qv)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(qu.codes, qu.scales, qv))
    f1, f2 = make(K1), make(K2)
    f1(); f2()
    return f1, f2


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for n in (1 << 24, 1 << 25):
        key = jax.random.PRNGKey(n)
        u = jax.random.uniform(key, (n,), jnp.float32, -1.0, 1.0)
        v = jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                               jnp.float32, -1.0, 1.0)
        qu, qv = ct.quantize(u, 8, key=None), ct.quantize(v, 8, key=None)
        del u, v
        chains = {}
        for cap in (256, 512, 1024, 2048):
            kdot.RT_CAP[8] = cap
            kdot._build.cache_clear()
            chains[f"rt{cap}_carry"] = build_chain(qu, qv, True)
            if cap == 1024:
                chains["rt1024_scalesonly"] = build_chain(qu, qv, False)
        kdot.RT_CAP[8] = 1024
        kdot._build.cache_clear()

        diffs = {k: [] for k in chains}
        for _ in range(REPS):
            for k, (f1, f2) in chains.items():
                t0 = time.perf_counter(); f2(); t2 = time.perf_counter() - t0
                t0 = time.perf_counter(); f1(); t1 = time.perf_counter() - t0
                diffs[k].append((t2 - t1) / (K2 - K1))
        nbytes = 2 * qu.nbytes
        print(f"\n=== 8-bit dot n=2^{n.bit_length()-1} ===", flush=True)
        for k, d in diffs.items():
            dt = float(np.median(d))
            print(f"  {k:22s} {dt*1e6:8.1f} us  {nbytes/dt/1e9:6.1f} GB/s",
                  flush=True)
        del qu, qv, chains


if __name__ == "__main__":
    main()
