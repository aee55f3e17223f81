"""XORShift128+ parity: JAX uint32-pair implementation vs NumPy uint64
golden, reproducing the reference's algorithm semantics
(simdxorshift128plus.h:38-127)."""

import numpy as np
import jax

from clover_tpu import rng as cr

K1, K2 = 445560390295639063, 2935984234003016713  # reference fixed seeds
                                                  # (test/random/00_random.cpp:42)


def test_jax_matches_numpy_golden():
    golden = cr.np_stream(K1, K2, n_draws=16, lanes=8)
    st = cr.XorShift128Plus.make(K1, K2, lanes=8)

    def step(st, _):
        st, oh, ol = st.next()
        return st, (oh, ol)

    _, (ohs, ols) = jax.lax.scan(step, st, None, length=16)
    got = (np.asarray(ohs, np.uint64) << np.uint64(32)) | np.asarray(
        ols, np.uint64)
    np.testing.assert_array_equal(got, golden)


def test_lane_seeding_is_jump_chained():
    """Lane i+1 must equal jump(lane i): the reference's init."""
    s0, s1 = cr.init_lanes(K1, K2, lanes=4)
    j0, j1 = cr._np_jump(s0[0:1], s1[0:1])
    assert j0[0] == s0[1] and j1[0] == s1[1]


def test_for_shard_streams_differ():
    a = cr.XorShift128Plus.for_shard(K1, K2, shard=0, lanes=4)
    b = cr.XorShift128Plus.for_shard(K1, K2, shard=1, lanes=4)
    _, ah, al = a.next()
    _, bh, bl = b.next()
    assert not (np.array_equal(np.asarray(ah), np.asarray(bh))
                and np.array_equal(np.asarray(al), np.asarray(bl)))


def test_uniform_block_range_and_reproducibility():
    st = cr.XorShift128Plus.make(K1, K2, lanes=8)
    st2, u = st.uniform_block()
    u = np.asarray(u)
    assert u.shape == (8, 8)
    assert np.all(u >= 0.0) and np.all(u < 1.0)
    # deterministic given the seed
    _, u_again = cr.XorShift128Plus.make(K1, K2, lanes=8).uniform_block()
    np.testing.assert_array_equal(u, np.asarray(u_again))
    # masked-byte structure: max possible value is 0x7F7F7F7F * 2^-31
    # (the int32->f32 convert rounds to 24-bit mantissa, like cvtepi32_ps)
    assert np.all(u <= np.float32(0x7F7F7F7F) * 2.0 ** -31)


def test_works_under_jit():
    st = cr.XorShift128Plus.make(1, 2, lanes=4)

    @jax.jit
    def draw(st):
        st, u = st.uniform_block()
        return u

    u = np.asarray(draw(st))
    golden = cr.np_stream(1, 2, 1, lanes=4)[0]
    lo = (golden & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    expect0 = float((lo[0] & 0x7F7F7F7F).astype(np.int32)) * 2.0 ** -31
    assert abs(u[0, 0] - expect0) < 1e-12
