"""Continuous-batching MVM server: concurrent requests match individual
fused MVMs."""

import numpy as np
import jax.numpy as jnp

import clover_tpu as ct
from clover_tpu.serving import MVMServer


def test_server_matches_individual_mvm(rng):
    m, n = 128, 256
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), 4)
    vecs = [ct.quantize(jnp.asarray(
        rng.random(n, dtype=np.float32) * 2 - 1), 4) for _ in range(10)]

    server = MVMServer(qA, max_batch=4, max_wait_s=0.01)
    try:
        futures = [server.submit(v) for v in vecs]
        results = [f.result(timeout=120) for f in futures]
    finally:
        server.close()

    for v, got in zip(vecs, results):
        ref = ct.mvm(qA, v)
        np.testing.assert_array_equal(np.asarray(got.codes),
                                      np.asarray(ref.codes))
        np.testing.assert_array_equal(np.asarray(got.scales),
                                      np.asarray(ref.scales))


def test_server_error_propagates(rng):
    qA = ct.quantize(jnp.asarray(rng.random((128, 128), np.float32)), 4)
    server = MVMServer(qA, max_batch=2)
    try:
        fut = server.submit("not a vector")
        try:
            fut.result(timeout=60)
            raised = False
        except Exception:
            raised = True
        assert raised
    finally:
        server.close()
