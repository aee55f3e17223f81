"""Tiled quantized-matrix transpose kernels (reference:
CloverMatrix4.h:1549-1663 nibble-shuffle transpose, CloverMatrix8.h:1359).

The XLA unpack -> jnp.T -> repack path materializes a full int8 element
matrix in HBM (3x the packed traffic; 87 GB/s at n=16K).  This kernel
transposes the PACKED bytes tile-by-tile on the MXU (int8 identity
matmul — Mosaic lowers the lhs-contracted dot natively) and then fixes
the nibbles with a handful of int32 ops:

With the deinterleaved format (byte = 16*hi + lo+8; byte j of a block
holds elements j and j+32), a byte-transposed tile BT[cb, r] carries
A[r, 64b+j] in its low nibble and A[r, 64b+j+32] in its high nibble.
The transposed matrix's packed byte (c, 32B+J) needs codes
A[64B+J, c] and A[64B+J+32, c] — i.e. the SAME nibble of two BT bytes
32 columns apart, low nibbles for output rows c%64 < 32 and high
nibbles for the rest.  Static 32-lane slices + sublane concats only.

8-bit needs no nibble fixup: the byte transpose IS the result.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QMat4, QMat8
from .dispatch import pallas_interpret

TR = 512          # A rows per tile (= output packed-byte columns * 2)
TCB = 1024        # A packed bytes per tile (= 1024 element columns)


def _pick_geom(bits: int, m_pad: int, wb: int) -> tuple[int, int]:
    """Tile geometry per precision (n=16K sweep, all exact): 4-bit is
    fastest at (512, 1024) — 484 GB/s vs 288-397 for taller/narrower
    tiles (the pair-weight matmul grows with tr^2); 8-bit has no matmul
    and prefers the bigger square (1024, 1024) — 642 vs 600 GB/s."""
    if bits == 8 and m_pad % 1024 == 0:
        return 1024, min(TCB, wb)
    return min(TR, m_pad), min(TCB, wb)


def _pair_weights(tr: int):
    """(TR, TR/2) int8: out lane o (byte column 32B+J) sums its x-source
    (lane 64B+J, weight 1) and y-source (lane 64B+J+32, weight 16) — one
    int8 MXU matmul does extract+pair+compact+shift at once."""
    r = jax.lax.broadcasted_iota(jnp.int32, (tr, tr // 2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (tr, tr // 2), 1)
    x_src = 64 * (c // 32) + (c % 32)
    w = jnp.where(r == x_src, 1, jnp.where(r == x_src + 32, 16, 0))
    return w.astype(jnp.int8)


def _kernel4(a_ref, out_ref, *, tr, tcb):
    bt = jnp.transpose(a_ref[:])                  # (TCB, TR) int8 bytes
    W = _pair_weights(tr)
    dn = (((1,), (0,)), ((), ()))
    # low nibbles: byte = (x & 15) + 16*(y & 15) - 128
    mm_lo = jax.lax.dot_general(jnp.bitwise_and(bt, jnp.int8(0x0F)), W,
                                dn, preferred_element_type=jnp.int32)
    lo_b = mm_lo - 128
    # high nibbles: (x & 0xF0) + 16*(y & 0xF0) = 16*hx + 256*hy
    mm_hi = jax.lax.dot_general(jnp.bitwise_and(bt, jnp.int8(-16)), W,
                                dn, preferred_element_type=jnp.int32)
    hi_b = jax.lax.shift_right_arithmetic(mm_hi, 4) + 8
    # interleave 32-row groups: out rows [32 lo | 32 hi] per 64-block
    lo3 = lo_b.reshape(tcb // 32, 1, 32, tr // 2)
    hi3 = hi_b.reshape(tcb // 32, 1, 32, tr // 2)
    out = jnp.concatenate([lo3, hi3], axis=1).reshape(2 * tcb, tr // 2)
    out_ref[:] = out.astype(jnp.int8)


def _kernel8(a_ref, out_ref, *, tr, tcb):
    out_ref[:] = jnp.transpose(a_ref[:])


@lru_cache(maxsize=64)
def _build(bits: int, m_pad: int, n_pad: int, interpret: bool):
    wb = n_pad // 2 if bits == 4 else n_pad       # packed bytes per row
    tr, tcb = _pick_geom(bits, m_pad, wb)
    gi, gj = m_pad // tr, wb // tcb
    if bits == 4:
        kernel = partial(_kernel4, tr=tr, tcb=tcb)
        out_block = (2 * tcb, tr // 2)
        out_shape = jax.ShapeDtypeStruct((n_pad, m_pad // 2), jnp.int8)
    else:
        kernel = partial(_kernel8, tr=tr, tcb=tcb)
        out_block = (tcb, tr)
        out_shape = jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int8)
    return pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[pl.BlockSpec((tr, tcb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_block, lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def _geometry_ok(bits: int, m_pad: int, n_pad: int) -> bool:
    wb = n_pad // 2 if bits == 4 else n_pad
    tr, tcb = _pick_geom(bits, m_pad, wb)
    if m_pad % tr or wb % tcb:
        return False
    if bits == 4 and (tr % BLOCK or tcb % 32):
        return False
    return True


def transpose_pallas_eligible(A) -> bool:
    return (isinstance(A, (QMat4, QMat8))
            and _geometry_ok(A.bits, A.rows_pad, A.cols_pad))


def transpose_pallas(A):
    call = _build(A.bits, A.rows_pad, A.cols_pad, pallas_interpret())
    codes_t = call(A.codes)
    return type(A)(codes=codes_t, scales=A.scales.T,
                   rows=A.cols, cols=A.rows)
