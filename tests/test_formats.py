"""Packing/layout and container invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from clover_tpu.formats import (
    BLOCK, PAD, pack_nibbles, pad_to, unpack_nibbles, zeros_vector,
)


def test_pad_to():
    assert pad_to(1) == 128
    assert pad_to(128) == 128
    assert pad_to(129) == 256
    assert pad_to(1000) == 1024


def test_pack_unpack_roundtrip(rng):
    for n in (64, 128, 192, 1024):
        codes = rng.integers(-7, 8, size=n).astype(np.int8)
        packed = pack_nibbles(jnp.asarray(codes))
        assert packed.shape == (n // 2,)
        assert packed.dtype == jnp.int8
        out = np.asarray(unpack_nibbles(packed))
        np.testing.assert_array_equal(out, codes)


def test_pack_unpack_matrix(rng):
    codes = rng.integers(-7, 8, size=(128, 256)).astype(np.int8)
    packed = pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (128, 128)
    out = np.asarray(unpack_nibbles(packed))
    np.testing.assert_array_equal(out, codes)


def test_pack_full_nibble_range(rng):
    # -8 is representable (two's complement) even though quantize never
    # produces it.
    codes = np.arange(-8, 8, dtype=np.int8).repeat(8)  # 128 elems
    out = np.asarray(unpack_nibbles(pack_nibbles(jnp.asarray(codes))))
    np.testing.assert_array_equal(out, codes)


def test_deinterleaved_layout():
    # Byte j of block b holds element 64b+j (lo) and 64b+j+32 (hi).
    codes = np.zeros(128, np.int8)
    codes[0] = 3       # block 0, elem 0 -> byte 0 lo
    codes[32] = -5     # block 0, elem 32 -> byte 0 hi
    codes[64 + 1] = 7  # block 1, elem 1 -> byte 33 lo
    packed = np.asarray(pack_nibbles(jnp.asarray(codes)))
    # biased low nibble: byte == 16*hi + (lo + 8) exactly as signed int8
    assert packed[0] == 16 * (-5) + (3 + 8)
    assert (packed[33] & 0x0F) == 7 + 8
    # a zero code pair packs to 0x08
    assert packed[1] == 0x08


def test_zeros_vector_invariants():
    for bits in (4, 8, 16, 32):
        v = zeros_vector(bits, 200)
        assert v.length == 200
        assert v.length_pad == 256
        if bits in (4, 8):
            assert np.all(np.asarray(v.scales) == 1.0)
            zero_byte = 0x08 if bits == 4 else 0  # biased low nibble
            assert np.all(np.asarray(v.codes) == zero_byte)
            from clover_tpu import restore
            assert np.all(np.asarray(restore(v).values) == 0.0)


def test_containers_are_pytrees():
    v = zeros_vector(4, 128)
    leaves = jax.tree_util.tree_leaves(v)
    assert len(leaves) == 2
    v2 = jax.jit(lambda q: q)(v)
    assert v2.length == v.length
    np.testing.assert_array_equal(np.asarray(v2.codes), np.asarray(v.codes))
