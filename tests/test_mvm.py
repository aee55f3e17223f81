"""MVM validation vs the golden oracle, all precision combinations
(reference: test/validate/03_matrix.cpp:247-566)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clover_tpu import golden
from clover_tpu.formats import unpack_nibbles
from clover_tpu.ops import (
    mvm, mvm_f32, quantize_mat, quantize_vec, restore_mat, restore_vec,
)

SHAPES = [(128, 128), (128, 256), (256, 128), (200, 440)]


def _mat_codes(q):
    return (np.asarray(unpack_nibbles(q.codes)) if q.bits == 4
            else np.asarray(q.codes))


def _vec_codes(q):
    return (np.asarray(unpack_nibbles(q.codes)) if q.bits == 4
            else np.asarray(q.codes))


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("shape", SHAPES)
def test_pure_mvm_vs_golden(rng, bits, shape):
    m, n = shape
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    qa = quantize_mat(jnp.asarray(a), bits, key=None)
    qx = quantize_vec(jnp.asarray(x), bits, key=None)

    got32 = np.asarray(mvm_f32(qa, qx))
    want32 = golden.mvm_f32_exact(
        _mat_codes(qa), np.asarray(qa.scales),
        _vec_codes(qx), np.asarray(qx.scales), bits)
    # int accumulation is exact; only the f32 block-combine order differs.
    np.testing.assert_allclose(got32, want32, rtol=1e-5, atol=1e-4)

    y = mvm(qa, qx, key=None)
    assert y.bits == bits
    g_codes, g_scales = golden.quantize_vec(want32, bits, noise=0.0)
    got = np.asarray(restore_vec(y).values)
    want = golden.restore_vec(g_codes, g_scales, bits)
    # requant floor() can flip 1 code where the combine order shifted the
    # band value across an integer boundary; bound by one quant step.
    step = np.repeat(g_scales / (7.0 if bits == 4 else 127.0), 64)
    assert np.max(np.abs(got - want) / np.maximum(step, 1e-30)) <= 1.000001


@pytest.mark.parametrize("shape", SHAPES)
def test_mixed_mvm_4x8(rng, shape):
    # 4-bit matrix x 8-bit vector -> 8-bit (reference rel tol 0.016,
    # 03_matrix.cpp:328-415).
    m, n = shape
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    qa = quantize_mat(jnp.asarray(a), 4, key=None)
    qx = quantize_vec(jnp.asarray(x), 8, key=None)
    y = mvm(qa, qx, key=None)
    assert y.bits == 8
    want = golden.mvm_mixed(
        _mat_codes(qa), np.asarray(qa.scales), 4,
        golden.restore_vec(_vec_codes(qx), np.asarray(qx.scales), 8))
    got = np.asarray(restore_vec(y).values)[:m]
    scale = np.max(np.abs(want)) + 1e-30
    assert np.max(np.abs(got - want[:m])) / scale <= 0.016


@pytest.mark.parametrize("mat_bits", [4, 8, 16])
@pytest.mark.parametrize("shape", [(128, 256)])
def test_mixed_mvm_x32(rng, mat_bits, shape):
    # Quantized matrix x fp32 vector -> fp32 (reference |delta| <= 0.01,
    # 03_matrix.cpp:419-489).
    m, n = shape
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    qa = quantize_mat(jnp.asarray(a), mat_bits, key=None)
    qx = quantize_vec(jnp.asarray(x), 32)
    y = mvm(qa, qx)
    assert y.bits == 32
    ar = np.asarray(restore_mat(qa).values)[:m, :n]
    want = ar.astype(np.float64) @ x.astype(np.float64)
    got = np.asarray(y.values)[:m]
    assert np.max(np.abs(got - want)) <= 0.01 * max(1.0, np.max(np.abs(want)))


def test_mvm_16x16(rng):
    m, n = 128, 256
    a = _f16able(rng, (m, n))
    x = _f16able(rng, n)
    qa = quantize_mat(jnp.asarray(a), 16)
    qx = quantize_vec(jnp.asarray(x), 16)
    y = mvm(qa, qx)
    assert y.bits == 16
    want = (a.astype(np.float64) @ x.astype(np.float64)).astype(np.float32)
    got = np.asarray(restore_vec(y).values)[:m]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_mvm_32x32(rng):
    m, n = 128, 256
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    y = mvm(quantize_mat(jnp.asarray(a), 32), quantize_vec(jnp.asarray(x), 32))
    want = a @ x
    np.testing.assert_allclose(np.asarray(y.values)[:m], want,
                               rtol=1e-5, atol=1e-4)


def _f16able(rng, shape):
    x = rng.integers(-10, 11, size=shape).astype(np.float32)
    return x / 4.0  # exactly representable in fp16


def test_mvm_pad_rows_are_zero(rng):
    # Padding bands must stay zero codes / scale 1.0.
    m, n = 130, 128
    a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    qa = quantize_mat(jnp.asarray(a), 4, key=None)
    qx = quantize_vec(jnp.asarray(x), 4, key=None)
    y = mvm(qa, qx, key=None)
    vals = np.asarray(restore_vec(y).values)
    assert np.all(vals[192:] == 0)
    assert np.all(np.asarray(y.scales)[3:] == 1.0)
