"""Sparse MVM, batched MVM / GEMM, element access, data-gen parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import clover_tpu as ct
from clover_tpu.formats import BLOCK, QVec4
from clover_tpu.ops import (
    gemm_f32, mat_get, mvm_batched, mvm_f32, mvm_sparse, random_floats,
    random_integers, vec_get, vec_get_code, vec_set_code,
)
from clover_tpu.ops.quantize import restore_mat


def _sparse_vec(rng, n, k, bits):
    x = np.zeros(n, np.float32)
    idx = rng.permutation(n)[:k]
    x[idx] = rng.random(k, dtype=np.float32) + 0.5
    return ct.quantize(jnp.asarray(x), bits)


@pytest.mark.parametrize("bits", [4, 8])
def test_mvm_sparse_matches_dense(rng, bits):
    m, n, k = 256, 512, 16
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), bits)
    qAT = ct.transpose(qA)
    qx = _sparse_vec(rng, n, k, bits)
    y_sparse = mvm_sparse(qAT, qx, k)
    y_dense = np.asarray(mvm_f32(qA, qx))
    got = np.asarray(ct.restore(y_sparse).values)
    lsb = np.repeat(np.asarray(y_sparse.scales), BLOCK) / (
        7.0 if y_sparse.bits == 4 else 127.0)
    # requant LSB + f32 ordering slack
    assert np.all(np.abs(got - y_dense) <= lsb + 1e-3 * np.abs(y_dense) + 1e-4)


def test_mvm_batched_matches_loop(rng):
    m, n, r = 128, 256, 4
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), 4)
    vecs = [ct.quantize(jnp.asarray(
        rng.random(n, dtype=np.float32) * 2 - 1), 4) for _ in range(r)]
    xs = jax.tree.map(lambda *a: jnp.stack(a), *vecs)
    ys = mvm_batched(qA, xs)
    for i, v in enumerate(vecs):
        ref = ct.mvm(qA, v)
        got_codes = np.asarray(ys.codes[i])
        np.testing.assert_array_equal(got_codes, np.asarray(ref.codes))
        np.testing.assert_array_equal(np.asarray(ys.scales[i]),
                                      np.asarray(ref.scales))


@pytest.mark.parametrize("bits", [4, 8])
def test_gemm_f32_matches_restore_matmul(rng, bits):
    m, n, r = 128, 256, 8
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    B = (rng.random((n, r), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), bits)
    got = np.asarray(gemm_f32(qA, jnp.asarray(B)))
    ref = np.asarray(restore_mat(qA).values) @ B
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_element_access_roundtrip(rng):
    x = (rng.random(200, dtype=np.float32) * 2 - 1)
    for bits in (4, 8):
        q = ct.quantize(jnp.asarray(x), bits)
        restored = np.asarray(ct.restore(q).values)
        for i in (0, 1, 31, 32, 63, 64, 100, 199):
            assert abs(vec_get(q, i) - restored[i]) < 1e-6
        q2 = vec_set_code(q, 5, 3)
        assert vec_get_code(q2, 5) == 3
        assert vec_get_code(q2, 4) == vec_get_code(q, 4)
        assert vec_get_code(q2, 5 + 32) == vec_get_code(q, 5 + 32)

    A = (rng.random((130, 130), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), 4)
    ra = np.asarray(restore_mat(qA).values)
    for (i, j) in ((0, 0), (1, 95), (65, 64), (129, 129)):
        assert abs(mat_get(qA, i, j) - ra[i, j]) < 1e-6


def test_vec_gather_matches_restore(rng):
    """Vectorized element gather (ops.access.vec_gather) equals the
    restored values at the gathered indices, every precision."""
    from clover_tpu.ops.access import vec_gather
    n = 512
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    idx = jnp.asarray(rng.integers(0, n, 64), jnp.int32)
    for bits in (4, 8, 16, 32):
        q = ct.quantize(jnp.asarray(x), bits)
        restored = np.asarray(ct.restore(q).values)
        got = np.asarray(jax.jit(vec_gather)(q, idx))
        np.testing.assert_allclose(got, restored[np.asarray(idx)],
                                   rtol=1e-6, atol=1e-7)


def test_random_generators_reproducible():
    a = np.asarray(random_floats(5, 7, 100))
    b = np.asarray(random_floats(5, 7, 100))
    np.testing.assert_array_equal(a, b)
    assert np.all((a >= 0) & (a < 1))
    ints = np.asarray(random_integers(5, 7, 1000, 7))
    assert ints.min() >= -7 and ints.max() <= 7
    assert np.all(ints == np.round(ints))


def test_threshold4_hybrid_exact(rng, monkeypatch):
    """r5 hybrid (compressed-multiset top-k selector + streaming mask
    kernels) must match the wide-view bisect path bit-for-bit, in both
    its pure-XLA and kernel (interpret) variants, across tie storms and
    degenerate inputs (doc/results/threshold4_r5.md)."""
    import jax
    import clover_tpu as ct
    from clover_tpu.ops.threshold import (_threshold4_hybrid,
                                          _threshold4_xla)

    cases = []
    for (n, k) in ((256, 3), (1024, 64), (4096, 257), (65536, 64)):
        v = (rng.random(n, dtype=np.float32) * 2 - 1)
        cases.append((v, k))
        cases.append((rng.integers(-3, 4, n).astype(np.float32), k))
        z = np.zeros(n, np.float32)
        z[rng.permutation(n)[:max(1, k // 2)]] = 1.0
        cases.append((z, k))                     # k > nnz: tau == 0
    for use_kernels in (False, True):
        if use_kernels:
            monkeypatch.setenv("CLOVER_PALLAS", "1")
        else:
            monkeypatch.delenv("CLOVER_PALLAS", raising=False)
        for v, k in cases:
            q = ct.quantize(jnp.asarray(v), 4)
            a = jax.jit(_threshold4_xla, static_argnums=1)(q, k)
            b = jax.jit(_threshold4_hybrid, static_argnums=1)(q, k)
            assert np.array_equal(np.asarray(a.codes),
                                  np.asarray(b.codes)), (len(v), k,
                                                         use_kernels)
            assert np.array_equal(np.asarray(a.scales),
                                  np.asarray(b.scales))
