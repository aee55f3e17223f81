import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
import clover_tpu.ops.threshold as OT_mod
OT = sys.modules['clover_tpu.ops.threshold']
from clover_tpu.harness.timing import chain_time, gbs
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
K = 64
n = 1 << 20

def time_thr(q, k, bits):
    def make(iters):
        @jax.jit
        def g(q):
            def body(i, s):
                if bits == 32:
                    q2 = type(q)(values=q.values + s*1e-37, length=q.length)
                else:
                    q2 = type(q)(codes=q.codes, scales=q.scales + s*1e-37,
                                 length=q.length)
                out = OT.threshold(q2, k)
                v = out.values[0] if bits == 32 else out.codes[0].astype(jnp.float32)
                return s + v * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(q))
    return chain_time(make)

x = jnp.asarray(rng.random(n, dtype=np.float32)*2-1)
for bits in (32, 8):
    q = ct.quantize(x, bits)
    nbytes = 2 * q.nbytes
    for cap, name in [(1024, "approx"), (0, "bisect")]:
        OT.TAU_HIER_MAX_K = cap
        # clear jit cache so the new cap retraces
        jax.clear_caches()
        dt = time_thr(q, K, bits)
        print(f"{bits:2d}-bit n=2^20 {name:6s} {dt*1e6:8.1f} us  {gbs(nbytes, dt):6.1f} GB/s", flush=True)
