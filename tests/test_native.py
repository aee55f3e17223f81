"""Native host runtime (C++/ctypes) vs the Python golden oracle and the
JAX XORShift128+ parity module — three independent implementations must
agree."""

import numpy as np
import pytest

from clover_tpu import golden, native
from clover_tpu import rng as cr
from clover_tpu.formats import unpack_nibbles

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

K1, K2 = 445560390295639063, 2935984234003016713


def test_xorshift_bitexact_vs_python_golden():
    got = native.xs_stream(5, 7, 32)
    st = (np.array([5], np.uint64), np.array([7], np.uint64))
    s0, s1 = st
    expect = []
    for _ in range(32):
        s0, s1, out = cr._np_next(s0, s1)
        expect.append(out[0])
    np.testing.assert_array_equal(got, np.array(expect, np.uint64))


def test_xs_init_matches_python():
    s0n, s1n = native.xs_init(K1, K2, lanes=4)
    s0p, s1p = cr.init_lanes(K1, K2, lanes=4)
    np.testing.assert_array_equal(s0n, s0p)
    np.testing.assert_array_equal(s1n, s1p)


@pytest.mark.parametrize("bits", [4, 8])
def test_native_quantize_matches_golden(bits):
    rng = np.random.default_rng(3)
    x = (rng.random(1000, dtype=np.float32) * 2 - 1)
    codes, scales = native.quantize_vec(x, bits)
    xp = np.zeros(1024, np.float32)
    xp[:1000] = x
    gc, gs = golden.quantize_vec(xp, bits, noise=0.0)
    got = np.asarray(unpack_nibbles(codes)) if bits == 4 else codes
    # the native multiplier is an IEEE divide; golden routes through the
    # XLA divide (1 ulp apart) -> razor-edge codes may differ by 1
    diff = got.astype(np.int32) - gc.astype(np.int32)
    assert np.abs(diff).max() <= 1 and (diff != 0).mean() < 0.01
    np.testing.assert_allclose(scales, gs, rtol=1e-7)


def test_native_restore_roundtrip():
    rng = np.random.default_rng(4)
    x = (rng.random(512, dtype=np.float32) * 2 - 1)
    codes, scales = native.quantize_vec(x, 4)
    xr = native.restore_vec(codes, scales, 4)
    assert np.all(np.abs(xr[:512] - x) <= scales.repeat(64)[:512] / 7 + 1e-6)


def test_native_dot_matches_golden():
    rng = np.random.default_rng(5)
    u = (rng.random(640, dtype=np.float32) * 2 - 1)
    v = (rng.random(640, dtype=np.float32) * 2 - 1)
    uc, us = native.quantize_vec(u, 4)
    vc, vs = native.quantize_vec(v, 4)
    got = native.dot(uc, us, vc, vs, 4)
    ref = golden.dot(np.asarray(unpack_nibbles(uc)), us,
                     np.asarray(unpack_nibbles(vc)), vs, 4)
    assert abs(got - ref) < 1e-4


def test_native_mvm_matches_golden():
    rng = np.random.default_rng(6)
    a = (rng.random((128, 256), dtype=np.float32) * 2 - 1)
    x = (rng.random(256, dtype=np.float32) * 2 - 1)
    ac, as_ = native.quantize_mat4(a)
    xc, xs = native.quantize_vec(x, 4)
    yc, ys = native.mvm4(ac, as_, xc, xs, 128, 256)
    y = native.restore_vec(yc, ys, 4)
    ref = golden.mvm_f32_exact(
        np.asarray(unpack_nibbles(ac)), as_,
        np.asarray(unpack_nibbles(xc)), xs, 4)
    lsb = ys.repeat(64) / 7.0
    assert np.all(np.abs(y - ref) <= lsb * (1 + 1e-3) + 1e-5)


def test_native_threshold():
    rng = np.random.default_rng(7)
    x = (rng.random(512, dtype=np.float32) * 2 - 1)
    codes, scales = native.quantize_vec(x, 4)
    t = native.threshold4(codes, scales, 512, 32)
    vals = native.restore_vec(t, scales, 4)
    assert np.count_nonzero(vals) <= 32
    kept = np.abs(vals[vals != 0])
    dropped = np.abs(native.restore_vec(codes, scales, 4))
    assert kept.min() >= np.sort(dropped)[::-1][:32].min() * 0.99