"""Worker for the 2-process multi-host smoke test (test_multihost.py).

Each process owns 4 simulated CPU devices; together they form the 2x4
("row", "col") pod mesh.  The worker drives a sharded 4-bit IHT solve
through clover_tpu.parallel.multihost.initialize — the BASELINE.md
">= 2 hosts" north star exercised end-to-end (psum partials cross the
process boundary through the gloo collectives that stand in for DCN).

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_cpu_enable_fast_math=false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from clover_tpu.formats import QVec32  # noqa: E402
from clover_tpu.models import make_iht_problem  # noqa: E402
from clover_tpu.ops import quantize_mat, quantize_vec, transpose  # noqa: E402
from clover_tpu.parallel import multihost, shard_matrix, shard_vector  # noqa: E402
from clover_tpu.parallel.solvers import iht as iht_sharded  # noqa: E402


def main():
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8

    mesh = multihost.pod_mesh(shape=(2, 4))

    # deterministic identical problem on both hosts
    phi, x_star, y = make_iht_problem(256, 512, 32)
    qphi = quantize_mat(phi, 4, key=None)
    qphit = transpose(qphi)
    qy = quantize_vec(y, 4, key=None)

    res = iht_sharded(shard_matrix(qphi, mesh),
                      shard_matrix(qphit, mesh, transposed=True),
                      shard_vector(qy, mesh, "row"),
                      8, 32, 0.0042, mesh,
                      x_star=QVec32(values=x_star, length=512))
    tr = np.asarray(res.trace)   # replicated -> addressable everywhere
    assert np.all(np.isfinite(tr)), tr
    assert tr[-1] < tr[0], tr
    if multihost.is_coordinator():
        print(f"MULTIHOST_OK trace0={tr[0]:.4f} traceN={tr[-1]:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
