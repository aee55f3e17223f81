import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
from clover_tpu.harness.timing import chain_time
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)

def t(fn, *args):
    def make(iters):
        @jax.jit
        def g(*a):
            def body(i, s):
                return s + fn(*[x + s*1e-37 for x in a]) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(*args))
    return chain_time(make)

M = jnp.asarray(rng.random(16384, np.float32))
E = jnp.asarray(rng.random(1<<20, np.float32))
G = jnp.asarray(rng.random(4096, np.float32))

print(f"top_k(16384,64):      {t(lambda m: jax.lax.top_k(m,64)[0][63], M)*1e6:8.1f} us", flush=True)
print(f"top_k(4096,64):       {t(lambda m: jax.lax.top_k(m,64)[0][63], G)*1e6:8.1f} us", flush=True)
print(f"approx_max_k(2^20,64):{t(lambda m: jax.lax.approx_max_k(m,64)[0][63], E)*1e6:8.1f} us", flush=True)
print(f"approx_max_k(16k,64): {t(lambda m: jax.lax.approx_max_k(m,64)[0][63], M)*1e6:8.1f} us", flush=True)
print(f"sum(2^20):            {t(lambda m: jnp.sum(m), E)*1e6:8.1f} us", flush=True)
print(f"count2(2^20):         {t(lambda m: jnp.sum((m>0.5).astype(jnp.int32)).astype(jnp.float32) + jnp.sum((m==0.25).astype(jnp.int32)).astype(jnp.float32), E)*1e6:8.1f} us", flush=True)
