"""Pallas kernel numerics vs the golden oracle (interpret mode on CPU).

Mirrors the reference's SIMD-vs-scalar validation (test/validate/
03_matrix.cpp:247-320): the fused kernel must reproduce the golden
blocked-integer MVM semantics.  The integer accumulation is exact by
construction; only the f32 scale-combine order differs (per-k-tile tree
vs fully sequential), so the pre-requant comparison uses a tight relative
tolerance and the post-requant comparison allows 1 output LSB.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import clover_tpu as ct
from clover_tpu import golden
from clover_tpu.formats import BLOCK, QVec4, QVec8, unpack_nibbles
from clover_tpu.kernels.mvm import mvm_pallas, mvm_pallas_eligible


def _mk(rng, m, n, bits_a, bits_x):
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), bits_a)
    qx = ct.quantize(jnp.asarray(x), bits_x)
    return qA, qx


def _golden_f32(qA, qx):
    """Exact pre-requant f32 result from the oracle."""
    a_codes = np.asarray(unpack_nibbles(qA.codes) if qA.bits == 4
                         else qA.codes)
    x_codes = np.asarray(unpack_nibbles(qx.codes) if qx.bits == 4
                         else qx.codes)
    qa = 7.0 if qA.bits == 4 else 127.0
    qx_ = 7.0 if qx.bits == 4 else 127.0
    m, n = a_codes.shape
    nb = n // BLOCK
    a3 = a_codes.astype(np.int64).reshape(m, nb, BLOCK)
    x2 = x_codes.astype(np.int64).reshape(nb, BLOCK)
    acc = np.einsum("ibk,bk->ib", a3, x2)
    comb = (np.repeat(np.asarray(qA.scales), BLOCK, axis=0) / qa
            * (np.asarray(qx.scales) / qx_)[None, :])
    return (comb * acc.astype(np.float64)).sum(1).astype(np.float32)


CONFIGS = [(4, 4), (4, 8), (8, 8)]
SIZES = [(128, 128), (256, 384), (512, 1024), (192, 256)]


@pytest.mark.parametrize("bits_a,bits_x", CONFIGS)
@pytest.mark.parametrize("m,n", SIZES)
def test_mvm_kernel_deterministic(rng, bits_a, bits_x, m, n):
    qA, qx = _mk(rng, m, n, bits_a, bits_x)
    assert mvm_pallas_eligible(qA, qx)
    out = mvm_pallas(qA, qx, key=None)
    y_ref = _golden_f32(qA, qx)

    # requantized output: deterministic truncation, <= 1 LSB from y_ref
    y_hat = np.asarray(ct.restore(out).values)[:m]
    lsb = np.repeat(np.asarray(out.scales),
                    BLOCK)[:m] / (7.0 if out.bits == 4 else 127.0)
    err = np.abs(y_hat - y_ref[:m])
    # 1 LSB + slack for f32 combine-order differences
    assert np.all(err <= lsb * (1 + 1e-3) + 1e-4), float((err / lsb).max())


@pytest.mark.parametrize("bits_a,bits_x", CONFIGS)
def test_mvm_kernel_matches_xla_scales(rng, bits_a, bits_x):
    """Output band scales must match the XLA path's band absmax closely."""
    from clover_tpu.ops.mvm import mvm_f32
    qA, qx = _mk(rng, 256, 512, bits_a, bits_x)
    out = mvm_pallas(qA, qx, key=None)
    y32 = np.asarray(mvm_f32(qA, qx))
    s_ref = np.abs(y32).reshape(-1, BLOCK).max(1)
    s_ref = np.where(s_ref == 0, 1.0, s_ref)
    np.testing.assert_allclose(np.asarray(out.scales), s_ref, rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu PRNG has no interpret-mode implementation")
def test_mvm_kernel_sr_statistics(rng):
    """With SR on, codes round both ways and the mean error is small."""
    qA, qx = _mk(rng, 256, 512, 4, 4)
    y_ref = _golden_f32(qA, qx)
    outs = []
    for s in range(8):
        out = mvm_pallas(qA, qx, key=jax.random.PRNGKey(s))
        outs.append(np.asarray(ct.restore(out).values))
    mean = np.mean(outs, axis=0)
    lsb = np.repeat(np.asarray(out.scales), BLOCK) / 7.0
    # SR is unbiased: averaging 8 draws must beat worst-case truncation
    assert np.all(np.abs(mean - y_ref) <= lsb)
    # and draws must actually differ (stochastic)
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_mvm_kernel_output_container_shape(rng):
    qA, qx = _mk(rng, 192, 256, 4, 4)
    out = mvm_pallas(qA, qx)
    assert isinstance(out, QVec4)
    assert out.length == 192
    assert out.codes.shape == (ct.pad_to(192) // 2,)
    qA8, qx8 = _mk(rng, 192, 256, 4, 8)
    out8 = mvm_pallas(qA8, qx8)
    assert isinstance(out8, QVec8)
    assert out8.codes.shape == (ct.pad_to(192),)


@pytest.mark.parametrize("bits_a,bits_x", CONFIGS)
@pytest.mark.parametrize("m,n", [(512, 384), (512, 1024), (1024, 768)])
def test_mvm_axpy_fused_bitexact(rng, bits_a, bits_x, m, n):
    """Fused MVM+AXPY == unfused mvm_pallas -> axpy_pallas KERNEL
    sequence, bit for bit, in deterministic mode: the fused epilogue's
    dequant-fma expression has the same shape as the standalone AXPY
    kernel's, so the compiler contracts both identically.  (vs the eager
    XLA path either kernel may differ by 1 ulp — fma contraction — which
    test_axpy_kernel_bitexact already tolerates.)"""
    from clover_tpu.kernels.mvm import (
        mvm_axpy_pallas, mvm_axpy_pallas_eligible)
    from clover_tpu.kernels.quantize import axpy_pallas, axpy_pallas_eligible
    qA, qx = _mk(rng, m, n, bits_a, bits_x)
    out_bits = 4 if (bits_a, bits_x) == (4, 4) else 8
    u = ct.quantize(jnp.asarray(rng.random(m, dtype=np.float32) * 2 - 1),
                    out_bits)
    for alpha in (-1.0, 0.00513):
        assert mvm_axpy_pallas_eligible(qA, qx, u)
        got = mvm_axpy_pallas(qA, qx, u, alpha)
        t1 = mvm_pallas(qA, qx, key=None)
        assert axpy_pallas_eligible(u, t1)
        want = axpy_pallas(u, t1, alpha, key=None)
        np.testing.assert_array_equal(np.asarray(got.codes),
                                      np.asarray(want.codes))
        np.testing.assert_array_equal(np.asarray(got.scales),
                                      np.asarray(want.scales))


def test_mvm_axpy_op_fallback(rng, monkeypatch):
    """ops.mvm_axpy falls back to the unfused sequence off-TPU/ineligible
    and matches it exactly in deterministic mode."""
    from clover_tpu.ops.mvm import mvm, mvm_axpy
    from clover_tpu.ops.axpy import scale_and_add
    qA, qx = _mk(rng, 256, 512, 8, 8)
    u = ct.quantize(jnp.asarray(rng.random(256, dtype=np.float32)), 8)
    monkeypatch.setenv("CLOVER_PALLAS", "0")
    got = mvm_axpy(qA, qx, u, 0.25)
    want = scale_and_add(u, mvm(qA, qx, key=None), 0.25, key=None)
    monkeypatch.delenv("CLOVER_PALLAS")
    np.testing.assert_array_equal(np.asarray(got.codes),
                                  np.asarray(want.codes))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(want.scales))


@pytest.mark.parametrize("bits_a,bits_x", CONFIGS)
@pytest.mark.parametrize("b", [2, 3, 8])   # 3: non-power-of-two lanes
def test_mvm_batched_kernel(rng, bits_a, bits_x, b):
    """One matrix stream serves B vectors: per-vector results match B
    separate mvm_pallas calls within 1 output LSB (integer accumulation
    identical; the f32 scale-combine may fuse differently — the same
    allowance the single kernel gets vs the XLA path)."""
    from clover_tpu.kernels.mvm import mvm_pallas
    from clover_tpu.kernels.mvm_batched import (
        mvm_batched_pallas, mvm_batched_pallas_eligible)
    m, n = 256, 512
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), bits_a, key=None)
    vecs = [ct.quantize(jnp.asarray(rng.random(n, dtype=np.float32) * 2
                                    - 1), bits_x, key=None)
            for _ in range(b)]
    xs = jax.tree.map(lambda *a: jnp.stack(a), *vecs)
    mode = f"{bits_a}x{bits_x}"
    assert mvm_batched_pallas_eligible(qA, (b,), mode)
    ys = mvm_batched_pallas(qA, xs, key=None)
    for j in range(b):
        want = mvm_pallas(qA, vecs[j], key=None)
        np.testing.assert_allclose(np.asarray(ys.scales[j]),
                                   np.asarray(want.scales), rtol=3e-7)
        got_v = np.asarray(ct.restore(
            jax.tree.map(lambda a: a[j], ys)).values)
        want_v = np.asarray(ct.restore(want).values)
        lsb = np.repeat(np.asarray(want.scales), BLOCK) / (
            7.0 if want.bits == 4 else 127.0)
        assert np.all(np.abs(got_v - want_v) <= lsb * (1 + 1e-3))


@pytest.mark.parametrize("bits_a,bits_x", CONFIGS)
def test_mvm_batched_f32_kernel(rng, bits_a, bits_x):
    """The batched kernel's f32-output mode (no requant — the sharded
    path's per-shard building block) matches the XLA batched f32 MVM."""
    from clover_tpu.kernels.mvm_batched import (
        mvm_batched_pallas_eligible, mvm_batched_pallas_f32)
    from clover_tpu.ops.gemm import mvm_batched_f32
    m, n, b = 256, 512, 4
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), bits_a, key=None)
    vecs = [ct.quantize(jnp.asarray(rng.random(n, dtype=np.float32) * 2
                                    - 1), bits_x, key=None)
            for _ in range(b)]
    xs = jax.tree.map(lambda *a: jnp.stack(a), *vecs)
    assert mvm_batched_pallas_eligible(qA, (b,), f"{bits_a}x{bits_x}")
    got = np.asarray(mvm_batched_pallas_f32(qA, xs))
    want = np.asarray(mvm_batched_f32(qA, xs))
    assert got.shape == want.shape == (b, m)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu PRNG has no interpret-mode implementation")
def test_mvm_batched_sr_statistics(rng):
    """With SR on, the batched kernel's per-vector draws are unbiased
    and stochastic (mirrors test_mvm_kernel_sr_statistics)."""
    from clover_tpu.kernels.mvm_batched import mvm_batched_pallas
    qA, qx = _mk(rng, 256, 512, 4, 4)
    xs = jax.tree.map(lambda *a: jnp.stack(a), *([qx] * 4))
    y_ref = _golden_f32(qA, qx)
    outs = []
    for s in range(8):
        ys = mvm_batched_pallas(qA, xs, key=jax.random.PRNGKey(s))
        for j in range(4):
            outs.append(np.asarray(ct.restore(
                jax.tree.map(lambda a: a[j], ys)).values))
    mean = np.mean(outs, axis=0)
    lsb = np.repeat(np.asarray(ys.scales[0]), BLOCK) / 7.0
    assert np.all(np.abs(mean - y_ref) <= lsb)
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_mvm_batched_op_dispatch(rng, monkeypatch):
    """ops.gemm.mvm_batched: kernel path vs the vmapped fallback agree
    within the same 1-LSB allowance; B=1 stays on the fallback."""
    from clover_tpu.ops.gemm import mvm_batched
    m, n, b = 192, 256, 4
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    qA = ct.quantize(jnp.asarray(A), 8, key=None)
    vecs = [ct.quantize(jnp.asarray(rng.random(n, dtype=np.float32) * 2
                                    - 1), 8, key=None) for _ in range(b)]
    xs = jax.tree.map(lambda *a: jnp.stack(a), *vecs)
    ys = mvm_batched(qA, xs)
    monkeypatch.setenv("CLOVER_PALLAS", "0")
    ys_ref = mvm_batched(qA, xs)
    monkeypatch.delenv("CLOVER_PALLAS")
    for j in range(b):
        lsb = np.asarray(ys_ref.scales[j]).repeat(BLOCK) / 127.0
        gv = np.asarray(ct.restore(jax.tree.map(lambda a: a[j], ys)).values)
        wv = np.asarray(ct.restore(
            jax.tree.map(lambda a: a[j], ys_ref)).values)
        assert np.all(np.abs(gv - wv) <= 2 * lsb * (1 + 1e-3))


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", [512, 1024, 4096])
def test_dot_kernel_vs_golden(rng, bits, n):
    from clover_tpu import golden
    from clover_tpu.kernels.dot import dot_pallas, dot_pallas_eligible
    u = (rng.random(n, dtype=np.float32) * 2 - 1)
    v = (rng.random(n, dtype=np.float32) * 2 - 1)
    qu = ct.quantize(jnp.asarray(u), bits)
    qv = ct.quantize(jnp.asarray(v), bits)
    assert dot_pallas_eligible(qu, qv)
    got = float(dot_pallas(qu, qv))
    uc = np.asarray(unpack_nibbles(qu.codes) if bits == 4 else qu.codes)
    vc = np.asarray(unpack_nibbles(qv.codes) if bits == 4 else qv.codes)
    ref = float(golden.dot(uc, np.asarray(qu.scales), vc,
                           np.asarray(qv.scales), bits))
    # reference dot tolerance for reordered accumulation (:280-283)
    assert abs(got - ref) <= 0.02 * max(1.0, abs(ref) / 10), (got, ref)


def test_threshold4_kernel_matches_xla(rng):
    """Fused 4-bit threshold kernel (interpret) is bit-identical to the
    wide-view XLA bisect path, including heavy-tie fills (slow path) and
    the rank-free exact-fit fast path."""
    import jax.numpy as jnp
    from clover_tpu.formats import QVec4, pack_nibbles
    from clover_tpu.kernels.threshold import (
        threshold4_pallas, threshold4_pallas_eligible)
    from clover_tpu.ops.quantize import quantize_vec, restore_vec
    from clover_tpu.ops.threshold import _threshold4_xla

    for n, k in [(2048, 64), (8192, 2048), (4096, 4095), (65536, 17),
                 (131072, 100)]:
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize_vec(jnp.asarray(x), 4, key=None)
        assert threshold4_pallas_eligible(q, k)
        got = np.asarray(restore_vec(threshold4_pallas(q, k)).values)
        want = np.asarray(restore_vec(_threshold4_xla(q, k)).values)
        np.testing.assert_array_equal(got, want)

    # tie storm (forces the in-kernel slow path): fill by lowest index
    codes = np.full(4096, -5, np.int8)
    q2 = QVec4(codes=pack_nibbles(jnp.asarray(codes)),
               scales=jnp.ones((64,), jnp.float32), length=4096)
    out = np.asarray(restore_vec(threshold4_pallas(q2, 100)).values)
    assert np.count_nonzero(out) == 100
    assert np.all(np.nonzero(out)[0] == np.arange(100))

    # degenerate: fewer nonzero codes than k -> keep them all
    codes0 = np.zeros(2048, np.int8)
    codes0[[5, 100, 2000]] = [3, -7, 1]
    q0 = QVec4(codes=pack_nibbles(jnp.asarray(codes0)),
               scales=jnp.ones((32,), jnp.float32), length=2048)
    out0 = np.asarray(restore_vec(threshold4_pallas(q0, 64)).values)
    assert np.count_nonzero(out0) == 3


def test_threshold4_xla_edge_cases(rng):
    """4-bit wide-view bisect path vs golden, including heavy-tie fills
    in golden index order and the degenerate fewer-nonzeros-than-k
    case."""
    import jax.numpy as jnp
    from clover_tpu import golden
    from clover_tpu.formats import QVec4, pack_nibbles, unpack_nibbles
    from clover_tpu.ops.quantize import quantize_vec, restore_vec
    from clover_tpu.ops.threshold import _threshold4_xla as thr

    # sizes exercise every _wide_cols branch (1024/512/256/128)
    for n, k in [(2048, 64), (8192, 2048), (4096, 4095), (65536, 17),
                 (262144, 4096), (640, 9), (384, 5)]:
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize_vec(jnp.asarray(x), 4, key=None)
        got = np.asarray(unpack_nibbles(thr(q, k).codes))
        want = golden.threshold(
            np.asarray(unpack_nibbles(q.codes)), np.asarray(q.scales),
            k, q.length, 4)
        np.testing.assert_array_equal(got, want)

    # degenerate: fewer nonzero codes than k -> keep them all
    codes0 = np.zeros(2048, np.int8)
    codes0[[5, 100, 2000]] = [3, -7, 1]
    q0 = QVec4(codes=pack_nibbles(jnp.asarray(codes0)),
               scales=jnp.ones((32,), jnp.float32), length=2048)
    out0 = np.asarray(restore_vec(thr(q0, 64)).values)
    assert np.count_nonzero(out0) == 3

    # tie storm: every code the same magnitude -> fill by lowest index
    # (forces the rank-based slow path: n_eq > fill)
    codes = np.full(4096, -5, np.int8)
    q2 = QVec4(codes=pack_nibbles(jnp.asarray(codes)),
               scales=jnp.ones((64,), jnp.float32), length=4096)
    out = np.asarray(restore_vec(thr(q2, 100)).values)
    assert np.count_nonzero(out) == 100
    assert np.all(np.nonzero(out)[0] == np.arange(100))


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("n", [512, 4000, 16384])
def test_restore_vec_kernel_bitexact(rng, bits, n, monkeypatch):
    """Pallas restore is bit-identical to the XLA unpack path (same
    multiplier order: code * (scale/qmax)), padding included."""
    from clover_tpu.kernels.restore import (
        restore_vec_pallas, restore_vec_pallas_eligible)
    from clover_tpu.ops.quantize import quantize_vec, restore_vec
    x = (rng.random(n, dtype=np.float32) * 2 - 1)
    q = quantize_vec(jnp.asarray(x), bits, key=None)
    assert restore_vec_pallas_eligible(q)
    got = restore_vec_pallas(q)
    monkeypatch.setenv("CLOVER_PALLAS", "0")
    want = restore_vec(q)
    monkeypatch.delenv("CLOVER_PALLAS")
    assert got.length == want.length == n
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(want.values))


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("m,n", [(256, 512), (128, 1024), (200, 500)])
def test_restore_mat_kernel_bitexact(rng, bits, m, n, monkeypatch):
    from clover_tpu.kernels.restore import (
        restore_mat_pallas, restore_mat_pallas_eligible)
    from clover_tpu.ops.quantize import quantize_mat, restore_mat
    A = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    q = quantize_mat(jnp.asarray(A), bits, key=None)
    assert restore_mat_pallas_eligible(q)
    got = restore_mat_pallas(q)
    monkeypatch.setenv("CLOVER_PALLAS", "0")
    want = restore_mat(q)
    monkeypatch.delenv("CLOVER_PALLAS")
    assert (got.rows, got.cols) == (want.rows, want.cols) == (m, n)
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(want.values))


def test_threshold8_kernel_matches_xla(rng, monkeypatch):
    import jax.numpy as jnp
    from clover_tpu.kernels.threshold import (
        threshold8_pallas, threshold8_pallas_eligible)
    from clover_tpu.ops.quantize import quantize_vec, restore_vec
    from clover_tpu.ops.threshold import threshold as thr

    for n, k in [(2048, 64), (8192, 2048), (65536, 17)]:
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize_vec(jnp.asarray(x), 8, key=None)
        assert threshold8_pallas_eligible(q, k)
        got = np.asarray(restore_vec(threshold8_pallas(q, k)).values)
        monkeypatch.setenv("CLOVER_PALLAS", "0")
        want = np.asarray(restore_vec(thr(q, k)).values)
        monkeypatch.delenv("CLOVER_PALLAS")
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Whole-iteration fused kernel (kernels/iteration.py)
# ---------------------------------------------------------------------------

def _mk_iter_problem(rng, m, n, mb, vb):
    from clover_tpu.formats import zeros_vector
    Phi = (rng.random((m, n), dtype=np.float32) * 2 - 1)
    yv = Phi @ (rng.random(n, dtype=np.float32) * 2 - 1)
    yv = yv / np.abs(yv).max()
    xv = rng.random(n, dtype=np.float32) * 2 - 1
    qPhi = ct.quantize(jnp.asarray(Phi), mb)
    qPhiT = ct.transpose(qPhi)
    qy = ct.quantize(jnp.asarray(yv), vb)
    qx = ct.quantize(jnp.asarray(xv), vb)
    return qPhi, qPhiT, qy, qx


@pytest.mark.parametrize("mb,vb", [(4, 4), (4, 8)])
@pytest.mark.parametrize("m,n", [(512, 1024), (1024, 512)])
def test_iteration_kernel_bitexact(rng, mb, vb, m, n):
    """One-launch whole-iteration kernel == the two-launch fused
    sequence bit-for-bit (deterministic).  On the real TPU this holds
    at EVERY eligible size and in SR mode (verified on-chip, round 3);
    interpret mode on XLA:CPU lowers the phase bodies inside cond
    regions with ~1-ulp different contraction at multi-row-tile sizes,
    so the CPU suite asserts bitwise only where phases are single-tile
    (multi-tile value parity: test_iteration_kernel_multitile)."""
    from clover_tpu.kernels.iteration import (iteration_pallas,
                                              iteration_pallas_eligible)
    from clover_tpu.kernels.mvm import mvm_axpy_pallas
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, m, n, mb, vb)
    assert iteration_pallas_eligible(qPhi, qPhiT, qy, qx)
    mu = 1e-3
    got = iteration_pallas(qPhi, qPhiT, qy, qx, mu)
    t2 = mvm_axpy_pallas(qPhi, qx, qy, -1.0)
    want = mvm_axpy_pallas(qPhiT, t2, qx, mu)
    assert got.length == want.length == n
    np.testing.assert_array_equal(np.asarray(got.codes),
                                  np.asarray(want.codes))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(want.scales))


def test_iteration_kernel_multitile(rng):
    """Multi-row-tile phases (gA=2, gB=2): restored values within one
    requant step of the two-launch path on CPU (bitwise on TPU — the
    interpret-mode cond-context contraction moves y2 by 1 ulp, which a
    floor() boundary can amplify to one quantization step)."""
    from clover_tpu.kernels.iteration import (iteration_pallas,
                                              iteration_pallas_eligible)
    from clover_tpu.kernels.mvm import mvm_axpy_pallas
    from clover_tpu.ops.quantize import restore_vec
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, 2048, 1024, 4, 4)
    assert iteration_pallas_eligible(qPhi, qPhiT, qy, qx)
    got = iteration_pallas(qPhi, qPhiT, qy, qx, 1e-3)
    t2 = mvm_axpy_pallas(qPhi, qx, qy, -1.0)
    want = mvm_axpy_pallas(qPhiT, t2, qx, 1e-3)
    v1 = np.asarray(restore_vec(got).values)
    v2 = np.asarray(restore_vec(want).values)
    step = np.repeat(np.maximum(np.asarray(got.scales),
                                np.asarray(want.scales)) / 7.0, 64)
    assert np.all(np.abs(v1 - v2) <= 2 * step + 1e-6)


def test_iteration_kernel_eligibility(rng):
    """8x8 stays two-launch (stream-bound; fused measured slower); legs
    with multiple k-tiles (n_pad > 8192) are ineligible; mismatched
    container classes are rejected."""
    from clover_tpu.kernels.iteration import iteration_pallas_eligible
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, 512, 1024, 8, 8)
    assert not iteration_pallas_eligible(qPhi, qPhiT, qy, qx)
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, 512, 1024, 4, 4)
    # wrong u class: y at 8-bit for a 4x4 iteration
    qy8 = ct.quantize(jnp.asarray(rng.random(512, np.float32)), 8)
    assert not iteration_pallas_eligible(qPhi, qPhiT, qy8, qx)


def test_iteration_solver_dispatch(rng, monkeypatch):
    """models/solvers._iteration routes through the fused whole-iteration
    kernel when kernels are enabled and the problem is eligible, and the
    result matches the explicit two-launch kernel sequence + threshold."""
    from clover_tpu.kernels.iteration import iteration_pallas_eligible
    from clover_tpu.kernels.mvm import mvm_axpy_pallas
    from clover_tpu.models.solvers import _iteration
    from clover_tpu.ops.threshold import threshold as thr
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, 512, 1024, 4, 4)
    assert iteration_pallas_eligible(qPhi, qPhiT, qy, qx)
    monkeypatch.setenv("CLOVER_PALLAS", "1")
    got = _iteration(qPhi, qPhiT, qy, qx, jnp.float32(1e-3), 64, None)
    t2 = mvm_axpy_pallas(qPhi, qx, qy, -1.0)
    want = thr(mvm_axpy_pallas(qPhiT, t2, qx, 1e-3), 64)
    monkeypatch.delenv("CLOVER_PALLAS")
    np.testing.assert_array_equal(np.asarray(got.codes),
                                  np.asarray(want.codes))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(want.scales))


def test_dma_probe_stream_stacking(rng):
    """Measurement probes (kernels/probes.py): the stacked salted stream
    probe stacks a small codes buffer to >= ring_bytes, runs a dependent
    chain, and returns finite values; launch_probe likewise.  (These are
    measurement-only, but a silent breakage would invalidate floor
    claims — doc/results/iht_small_r3.md.)"""
    from clover_tpu.kernels.probes import dma_probe_stream, launch_probe
    q = ct.quantize(jnp.asarray(rng.random((256, 512), np.float32)), 4)
    mk, nbytes, p = dma_probe_stream(q, ring_bytes=1 << 20)
    assert p == -(-(1 << 20) // q.codes.nbytes)
    assert nbytes == p * q.codes.nbytes
    assert np.isfinite(mk(3)())
    assert np.isfinite(launch_probe()(3)())


@pytest.mark.parametrize("mb,vb", [(4, 4), (4, 8)])
@pytest.mark.parametrize("k", [64, None])
def test_iteration_chain_kernel(rng, mb, vb, k):
    """Two chained iterations + in-kernel thresholds (one launch) ==
    the unchained sequence [iteration_pallas -> ct.threshold] x 2,
    bitwise (deterministic, single-tile phases — the interpret-mode
    caveat of test_iteration_kernel_bitexact applies)."""
    from clover_tpu.kernels.iteration import (
        iteration_chain_pallas, iteration_chain_pallas_eligible,
        iteration_pallas)
    m, n = 512, 1024
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, m, n, mb, vb)
    assert iteration_chain_pallas_eligible(qPhi, qPhiT, qy, qx, k)
    mu = 1e-3
    got = iteration_chain_pallas(qPhi, qPhiT, qy, qx, mu, k,
                                 (None,) * 8)
    x = qx
    for _ in range(2):
        x = iteration_pallas(qPhi, qPhiT, qy, x, mu)
        if k is not None:
            x = ct.threshold(x, k)
    np.testing.assert_array_equal(np.asarray(got.codes),
                                  np.asarray(x.codes))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(x.scales))


def test_solver_chain_dispatch(rng):
    """_solve uses the chained kernel for untraced even-iteration solves
    and the result matches the unchained path (CLOVER_ITER_CHAIN=0)
    bitwise in deterministic mode."""
    import os
    from clover_tpu.models import solvers
    qPhi, qPhiT, qy, qx = _mk_iter_problem(rng, 512, 1024, 4, 4)
    old = os.environ.get("CLOVER_ITER_CHAIN")
    try:
        os.environ["CLOVER_ITER_CHAIN"] = "1"
        # force kernels on (CPU suite defaults them off)
        os.environ["CLOVER_PALLAS"] = "1"
        solvers._solve.clear_cache()
        a = solvers.iht(qPhi, qPhiT, qy, 4, 64, 1e-3, key=None)
        os.environ["CLOVER_ITER_CHAIN"] = "0"
        solvers._solve.clear_cache()
        b = solvers.iht(qPhi, qPhiT, qy, 4, 64, 1e-3, key=None)
        np.testing.assert_array_equal(np.asarray(a.x.codes),
                                      np.asarray(b.x.codes))
    finally:
        os.environ.pop("CLOVER_PALLAS", None)
        if old is None:
            os.environ.pop("CLOVER_ITER_CHAIN", None)
        else:
            os.environ["CLOVER_ITER_CHAIN"] = old
        solvers._solve.clear_cache()
