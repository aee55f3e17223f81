import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from clover_tpu.harness.timing import chain_time, gbs
from clover_tpu.kernels import mvm_pallas_f32
from clover_tpu.ops.quantize import quantize_vec
from clover_tpu.formats import QVec32
assert jax.default_backend() == "tpu"

for N in (16384, 32768):
    key = jax.random.PRNGKey(0)
    A = jax.random.uniform(key, (N, N), jnp.float32, -1.0, 1.0)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (N,), jnp.float32, -1.0, 1.0)
    qA = ct.quantize(A, 4); qx = ct.quantize(x, 4)
    del A

    def make_fused(iters):
        @jax.jit
        def g(qA, qx):
            def body(i, x):
                return ct.mvm(qA, x)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
        return lambda: float(g(qA, qx))

    def make_decomp(iters):
        @jax.jit
        def g(qA, qx):
            def body(i, x):
                y32 = mvm_pallas_f32(qA, x)
                return quantize_vec(QVec32(values=y32, length=qA.rows), 4)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
        return lambda: float(g(qA, qx))

    for rnd in range(2):
        tf = chain_time(make_fused, k1=1, k2=65)
        td = chain_time(make_decomp, k1=1, k2=65)
        print(f"n={N} r{rnd}: fused {tf*1e3:.3f} ms ({gbs(qA.nbytes, tf):.0f} GB/s)   "
              f"decomp {td*1e3:.3f} ms ({gbs(qA.nbytes, td):.0f} GB/s)  ratio {tf/td:.3f}", flush=True)
