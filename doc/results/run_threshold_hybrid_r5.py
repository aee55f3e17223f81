"""Round-5: 4-bit threshold hybrid (top-k on compressed multiset +
integer-cutoff mask) vs the r4 fused bisection kernel, wide-view XLA
bisect, and the fp32 dense approx+verify path.  VERDICT r4 item 2.

Protocol: chain_time paired-diff, scales-only perturbation, codes
consumed (sum) so nothing dead-codes; variants interleaved per size.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from clover_tpu.formats import QVec4, QVec32
from clover_tpu.harness.timing import chain_time
from clover_tpu.ops.threshold import (_threshold4_hybrid, _threshold4_xla,
                                      _dense_keep_mask, _abs_restored)
from clover_tpu.kernels.threshold import (threshold4_pallas,
                                          threshold4_pallas_eligible)
assert jax.default_backend() == "tpu"

key = jax.random.PRNGKey(0)


def chain4(q, k, fn):
    def make(iters):
        @jax.jit
        def g(q):
            def body(i, s):
                q2 = QVec4(codes=q.codes, scales=q.scales + s * 1e-30,
                           length=q.length)
                r = fn(q2, k)
                return s + (jnp.sum(r.codes.astype(jnp.float32))
                            + jnp.sum(r.scales)) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(q))
    return make


def chain32(v, k):
    def make(iters):
        @jax.jit
        def g(v):
            def body(i, s):
                q2 = QVec32(values=v + s * 1e-30, length=v.shape[0])
                mask = _dense_keep_mask(_abs_restored(q2), k)
                r = jnp.where(mask, q2.values, 0.0)
                return s + jnp.sum(r) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(v))
    return make


for k in (64, 999):
    for lg in (16, 17, 18, 19, 20, 21):
        n = 1 << lg
        v = jax.random.uniform(key, (n,), jnp.float32, -1.0, 1.0)
        q = ct.quantize(v, 4)
        rows = []
        th = chain_time(chain4(q, k, _threshold4_hybrid))
        rows.append(("hybrid", th))
        if threshold4_pallas_eligible(q, k):
            rows.append(("kernel", chain_time(chain4(q, k,
                                                     threshold4_pallas))))
        rows.append(("wideview", chain_time(chain4(q, k,
                                                   _threshold4_xla))))
        rows.append(("fp32", chain_time(chain32(v, k))))
        nbytes = 2 * (q.codes.nbytes + q.scales.nbytes)
        msg = f"k={k} n=2^{lg}: " + "   ".join(
            f"{name} {t*1e6:7.1f} us" for name, t in rows)
        msg += f"   hybrid_gbs={nbytes / th / 1e9:.1f}"
        print(msg, flush=True)
