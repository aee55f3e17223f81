"""Quantize / AXPY Pallas kernels vs golden (interpret mode, deterministic).

Mirrors the reference's quantize validation (bit-exact with SR off,
test/validate/02_vector.cpp:112-179) and scaleAndAdd validation
(:341-447)."""

import numpy as np
import jax.numpy as jnp
import pytest

import clover_tpu as ct
from clover_tpu import golden
from clover_tpu.formats import BLOCK, pad_to, pad_vector, pad_matrix, \
    unpack_nibbles
from clover_tpu.kernels.quantize import (
    axpy_pallas, quantize_mat_pallas, quantize_vec_pallas)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", [512, 1000, 1024, 4096])
def test_quantize_vec_kernel_bitexact(rng, bits, n):
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    xp = pad_vector(jnp.asarray(x))
    q = quantize_vec_pallas(xp, n, bits, key=None)
    g_codes, g_scales = golden.quantize_vec(np.asarray(xp), bits, noise=0.0)
    codes = np.asarray(unpack_nibbles(q.codes) if bits == 4 else q.codes)
    np.testing.assert_array_equal(codes, g_codes)
    np.testing.assert_array_equal(np.asarray(q.scales), g_scales)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("shape", [(128, 128), (256, 384), (192, 512)])
def test_quantize_mat_kernel_bitexact(rng, bits, shape):
    m, n = shape
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    ap = pad_matrix(jnp.asarray(a))
    q = quantize_mat_pallas(ap, m, n, bits, key=None)
    g_codes, g_scales = golden.quantize_mat(np.asarray(ap), bits, noise=0.0)
    codes = np.asarray(unpack_nibbles(q.codes) if bits == 4 else q.codes)
    np.testing.assert_array_equal(codes, g_codes)
    np.testing.assert_array_equal(np.asarray(q.scales), g_scales)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", [512, 1000, 1024])
def test_axpy_kernel_bitexact(rng, bits, n):
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    y = (rng.random(n, dtype=np.float32) * 2 - 1)
    qu = ct.quantize(jnp.asarray(x), bits)
    qv = ct.quantize(jnp.asarray(y), bits)
    r = axpy_pallas(qu, qv, -0.5, key=None)
    uc = np.asarray(unpack_nibbles(qu.codes) if bits == 4 else qu.codes)
    vc = np.asarray(unpack_nibbles(qv.codes) if bits == 4 else qv.codes)
    g_codes, g_scales = golden.scale_and_add(
        uc, np.asarray(qu.scales), vc, np.asarray(qv.scales), -0.5, bits,
        noise=0.0)
    codes = np.asarray(unpack_nibbles(r.codes) if bits == 4 else r.codes)
    # XLA fuses the dequant-FMA into a hardware fma (single rounding), so x
    # can differ from the two-step golden by 1 ulp — which on a razor-edge
    # floor() flips a code by exactly 1.  Allow that on <=0.5% of elements
    # (the reference's own dot validation is tolerance-based for the same
    # reordered-arithmetic reason, test/validate/02_vector.cpp:280-283).
    diff = codes.astype(np.int32) - g_codes.astype(np.int32)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() <= 0.005
    np.testing.assert_allclose(np.asarray(r.scales), g_scales, rtol=1e-6)
