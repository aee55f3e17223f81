import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
import clover_tpu.kernels.threshold as KT
import clover_tpu.ops.threshold as OT_mod
OT = sys.modules['clover_tpu.ops.threshold']
from clover_tpu.harness.timing import chain_time, gbs
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
K = 64
n = 1 << 20
q = ct.quantize(jnp.asarray(rng.random(n, dtype=np.float32)*2-1), 4)
nbytes = 2 * q.nbytes

def time_kernel():
    def make(iters):
        @jax.jit
        def g(q):
            def body(i, s):
                q2 = type(q)(codes=q.codes, scales=q.scales + s*1e-37,
                             length=q.length)
                out = KT.threshold4_pallas(q2, K)
                return s + out.codes[0].astype(jnp.float32)*1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(q))
    return chain_time(make)

for fan in (5, 9, 17, 33):
    OT.BISECT_FAN = fan
    KT._build4.cache_clear()
    dt = time_kernel()
    lv = OT._bisect_levels(fan)
    print(f"fan={fan:2d} levels={lv:2d}  {dt*1e6:8.1f} us  {gbs(nbytes, dt):6.1f} GB/s", flush=True)
