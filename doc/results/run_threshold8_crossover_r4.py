import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
import clover_tpu.kernels.threshold as KT
import clover_tpu.ops.threshold as _
OT = sys.modules['clover_tpu.ops.threshold']
from clover_tpu.harness.timing import chain_time, gbs
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
K = 64

def time_thr(q, k):
    def make(iters):
        @jax.jit
        def g(q):
            def body(i, s):
                q2 = type(q)(codes=q.codes, scales=q.scales + s*1e-37,
                             length=q.length)
                out = OT.threshold(q2, k)
                return s + out.codes[0].astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(q))
    return chain_time(make)

for lg in (17, 18, 19, 20):
    n = 1 << lg
    x = jnp.asarray(rng.random(n, dtype=np.float32)*2-1)
    q = ct.quantize(x, 8)
    nbytes = 2 * q.nbytes
    for cap, name in [(8192, "kernel"), (0, "dense-approx")]:
        KT.MAX_ROWS8 = cap
        jax.clear_caches()
        dt = time_thr(q, K)
        print(f"8-bit n=2^{lg} {name:12s} {dt*1e6:8.1f} us  {gbs(nbytes, dt):6.1f} GB/s", flush=True)
