"""Round-5: chunked-psum cost measurement (VERDICT r4 item 5) —
unprepared vs prepared chunk containers on the 1x1 mesh at n=16K.
Produced the constants in parallel/ops.py (PSUM_CHUNK_OVERHEAD_S and
the prepare_psum_chunks rationale).
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from jax.sharding import PartitionSpec as P
from clover_tpu.harness.timing import chain_time
from clover_tpu.parallel import make_mesh, shard_matrix, shard_vector
from clover_tpu.parallel.mesh import COL, ROW
from clover_tpu.parallel.ops import (mvm_psum, mvm_psum_overlapped,
                                     prepare_psum_chunks)
from clover_tpu.parallel.solvers import _local_mat, _local_vec, _shard_map

assert jax.default_backend() == "tpu"
key = jax.random.PRNGKey(0)
N = 16384
A = jax.random.uniform(key, (N, N), jnp.float32, -1.0, 1.0)
x = jax.random.uniform(jax.random.fold_in(key, 1), (N,),
                       jnp.float32, -1.0, 1.0)
qA = ct.quantize(A, 4); qx = ct.quantize(x, 4)
mesh = make_mesh()
R, C = mesh.shape[ROW], mesh.shape[COL]
qAs = shard_matrix(qA, mesh); qxs = shard_vector(qx, mesh, COL)


def make(chunks, prepared):
    def mk(iters):
        def local(ac, asc, xc, xsc):
            A_l = _local_mat(qA, R, C, (ac, asc))
            prep = (prepare_psum_chunks(A_l, chunks)
                    if prepared and chunks > 1 else None)

            def body(i, s):
                x_l = _local_vec(qx, C, (xc, xsc + s * 1e-30))
                if chunks == 1:
                    y = mvm_psum(A_l, x_l, COL, None, 4, ROW)
                else:
                    y = mvm_psum_overlapped(A_l, x_l, COL, None, 4, ROW,
                                            chunks=chunks, prepared=prep)
                return s + jnp.sum(y.scales) * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        fn = jax.jit(_shard_map(
            local, mesh, (P(ROW, COL), P(ROW, COL), P(COL), P(COL)), P()))
        return lambda: float(fn(qAs.codes, qAs.scales,
                                qxs.codes, qxs.scales))
    return mk


for prepared in (False, True):
    for chunks in (1, 2, 4, 8):
        t = chain_time(make(chunks, prepared))
        print(f"prepared={prepared} chunks={chunks}: {t*1e6:.1f} us",
              flush=True)
