"""dot / scaleAndAdd / threshold / transpose validation vs the golden
oracle, mirroring the reference's tolerances
(test/validate/02_vector.cpp:259-554, 03_matrix.cpp:153-245)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clover_tpu import golden
from clover_tpu.formats import pad_to, unpack_nibbles
from clover_tpu.ops import (
    dot, quantize_vec, quantize_mat, restore_vec, scale_and_add, threshold,
    transpose,
)

SIZES = [128, 191, 256, 500, 1024]


def _int_data(rng, n, mag=10):
    return rng.integers(-mag, mag + 1, size=n).astype(np.float32)


def _codes_of(q):
    return (np.asarray(unpack_nibbles(q.codes)) if q.bits == 4
            else np.asarray(q.codes))


# ---------------------------------------------------------------------------
# dot
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", SIZES)
def test_dot_vs_golden(rng, bits, n):
    # Reference tolerance: |delta| <= 0.02 on integer data in [-10, 10]
    # scaled by size (accumulation reorder), 02_vector.cpp:259-295.
    u = _int_data(rng, n)
    v = _int_data(rng, n)
    qu = quantize_vec(jnp.asarray(u), bits, key=None)
    qv = quantize_vec(jnp.asarray(v), bits, key=None)
    got = float(dot(qu, qv))
    want = golden.dot(_codes_of(qu), np.asarray(qu.scales),
                      _codes_of(qv), np.asarray(qv.scales), bits)
    assert abs(got - want) <= 0.02 * max(1.0, abs(want))


@pytest.mark.parametrize("bits", [16, 32])
def test_dot_fp(rng, bits):
    n = 512
    u = _int_data(rng, n)
    v = _int_data(rng, n)
    qu = quantize_vec(jnp.asarray(u), bits)
    qv = quantize_vec(jnp.asarray(v), bits)
    want = float(np.dot(u.astype(np.float64), v.astype(np.float64)))
    assert abs(float(dot(qu, qv)) - want) <= 1e-3 * max(1.0, abs(want))


# ---------------------------------------------------------------------------
# scaleAndAdd
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", SIZES)
def test_scale_and_add_deterministic_bitexact(rng, bits, n):
    u = _int_data(rng, n)
    v = _int_data(rng, n)
    qu = quantize_vec(jnp.asarray(u), bits, key=None)
    qv = quantize_vec(jnp.asarray(v), bits, key=None)
    r = scale_and_add(qu, qv, -0.5, key=None)
    g_codes, g_scales = golden.scale_and_add(
        _codes_of(qu), np.asarray(qu.scales),
        _codes_of(qv), np.asarray(qv.scales), -0.5, bits, noise=0.0)
    np.testing.assert_array_equal(_codes_of(r), g_codes)
    np.testing.assert_array_equal(np.asarray(r.scales), g_scales)


def test_scale_and_add_fp32_exact(rng):
    n = 300
    u = _int_data(rng, n)
    v = _int_data(rng, n)
    qu = quantize_vec(jnp.asarray(u), 32)
    qv = quantize_vec(jnp.asarray(v), 32)
    r = scale_and_add(qu, qv, 2.0)
    np.testing.assert_array_equal(np.asarray(r.values)[:n], u + 2.0 * v)


# ---------------------------------------------------------------------------
# threshold (top-K)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [4, 8, 16, 32])
@pytest.mark.parametrize("n", [128, 500, 1024, 8192])  # 8192 -> two-stage
def test_threshold_vs_golden(rng, bits, n):
    k = 32
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    q = quantize_vec(jnp.asarray(x), bits, key=None)
    t = threshold(q, k)
    got = np.asarray(restore_vec(t).values)[:n]
    if bits in (4, 8):
        g_codes = golden.threshold(_codes_of(q), np.asarray(q.scales),
                                   k, pad_to(n), bits)
        want = golden.restore_vec(g_codes, np.asarray(q.scales), bits)[:n]
    else:
        want = golden.threshold_f32(
            np.asarray(restore_vec(q).values), k, pad_to(n))[:n]
    # Reference tolerance: top-K sets equal within 10% on restored
    # magnitudes (02_vector.cpp:449-554); with our deterministic
    # tie-break both sides should in fact match exactly.
    np.testing.assert_array_equal(got, want)
    assert np.count_nonzero(got) <= k
    # scales untouched
    if bits in (4, 8):
        np.testing.assert_array_equal(np.asarray(t.scales),
                                      np.asarray(q.scales))


def test_threshold_keeps_largest(rng):
    x = np.zeros(256, np.float32)
    x[10] = 5.0
    x[100] = -9.0
    x[200] = 1.0
    q = quantize_vec(jnp.asarray(x), 8, key=None)
    t = threshold(q, 2)
    got = np.asarray(restore_vec(t).values)
    assert got[100] != 0 and got[10] != 0 and got[200] == 0


# ---------------------------------------------------------------------------
# transpose
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [4, 8, 16, 32])
@pytest.mark.parametrize("shape", [(128, 128), (128, 256), (200, 440)])
def test_transpose_roundtrip(rng, bits, shape):
    m, n = shape
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    q = quantize_mat(jnp.asarray(a), bits, key=None)
    t = transpose(q)
    assert (t.rows, t.cols) == (n, m)
    # Bit-exact: T(A)[j, i] == A[i, j] on restored values
    # (reference: 03_matrix.cpp:153-245).
    from clover_tpu.ops import restore_mat
    ra = np.asarray(restore_mat(q).values)
    rt = np.asarray(restore_mat(t).values)
    np.testing.assert_array_equal(rt, ra.T)
    tt = transpose(t)
    rtt = np.asarray(restore_mat(tt).values)
    np.testing.assert_array_equal(rtt, ra)
