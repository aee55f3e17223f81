"""Per-shard building blocks used inside ``shard_map`` regions.

These are the distributed equivalents of the reference's OpenMP kernels
(SURVEY §2.5): ``psum`` over ICI replaces the implicit shared-memory
reduction, per-shard PRNG keys replace ``random_key*_perthread``
(CloverRandom.h:39-41), and the two-phase top-K (local top-K + gathered
merge) is the reference's parallel threshold algorithm
(CloverVector4.h:1975-2060) with ICI standing in for shared memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import QVec4, QVec8, QVec16, QVec32, pack_nibbles, unpack_nibbles
from ..ops import restore_vec
from ..ops.mvm import mvm_f32_fast
from ..ops.quantize import quantize_vec


def axis_key(key, axis: str):
    """Fold the mesh position along ``axis`` into the SR randomness so each
    shard of that axis draws an independent stochastic-rounding stream,
    while replicas along other axes stay bit-identical (required for
    outputs that are replicated along those axes).  This is the TPU analog
    of the reference's per-thread key arrays (CloverRandom.h:104-113).

    ``key`` may be an int32 seed (cheap: one integer mix per shard) or a
    JAX PRNG key (fold_in)."""
    if key is None:
        return None
    idx = jax.lax.axis_index(axis)
    arr = jnp.asarray(key)
    if arr.dtype == jnp.int32:
        from ..kernels.dispatch import SEED_GOLD
        return arr + (idx + 1) * jnp.int32(SEED_GOLD ^ 0x5851F42D)
    return jax.random.fold_in(key, idx)


def mvm_psum(A_local, x_local, reduce_axis: str, key, out_bits: int,
             out_owner_axis: str):
    """Local fused-MVM partial -> psum over ``reduce_axis`` -> requantize.

    The psum happens BEFORE output requantization so every shard's band
    absmax sees the globally reduced values — the distributed version of
    CloverMatrix4.h:788-1083's band requant.  On TPU the per-shard
    partial runs the fused Pallas kernel (mvm_f32_fast).
    """
    y32 = mvm_f32_fast(A_local, x_local)
    y32 = jax.lax.psum(y32, reduce_axis)
    if out_bits == 32:
        return QVec32(values=y32, length=A_local.rows)
    if out_bits == 16:
        return QVec16(values=y32.astype(jnp.float16), length=A_local.rows)
    return quantize_vec(QVec32(values=y32, length=A_local.rows), out_bits,
                        key=axis_key(key, out_owner_axis))


def threshold_global(x_local, k: int, axis: str):
    """Global top-K over a vector sharded along ``axis``: local top-K,
    all_gather the K candidates per shard, merge, mask locally.

    Tie-break: (|value| desc, global index asc) — the gathered order is
    (shard, local rank), which coincides with global index order for
    equal values because the local top_k is index-stable.
    """
    from ..ops.threshold import _top_k_idx
    local_len = x_local.length_pad
    my = jax.lax.axis_index(axis)
    vals = jnp.abs(restore_vec(x_local).values)
    li = _top_k_idx(vals, k)       # two-stage for large shards, stable
    lv = vals[li]
    # gather candidates from all shards of `axis`
    gv = jax.lax.all_gather(lv, axis)              # (parts, k)
    gi = jax.lax.all_gather(li + 0, axis)          # local indices
    parts = gv.shape[0]
    shard_of = jnp.repeat(jnp.arange(parts), k)
    flat_v = gv.reshape(-1)
    flat_i = gi.reshape(-1)
    _, sel = jax.lax.top_k(flat_v, k)
    sel_shard = shard_of[sel]
    sel_local_idx = flat_i[sel]
    # indices that belong to me
    mine = sel_shard == my
    scatter_idx = jnp.where(mine, sel_local_idx, local_len)  # OOB -> drop
    mask = jnp.zeros((local_len,), jnp.bool_).at[scatter_idx].set(
        True, mode="drop")

    if isinstance(x_local, QVec4):
        codes = unpack_nibbles(x_local.codes)
        codes = jnp.where(mask, codes, jnp.int8(0))
        return QVec4(codes=pack_nibbles(codes), scales=x_local.scales,
                     length=x_local.length)
    if isinstance(x_local, QVec8):
        return QVec8(codes=jnp.where(mask, x_local.codes, jnp.int8(0)),
                     scales=x_local.scales, length=x_local.length)
    if isinstance(x_local, QVec16):
        return QVec16(values=jnp.where(mask, x_local.values, jnp.float16(0)),
                      length=x_local.length)
    return QVec32(values=jnp.where(mask, x_local.values, jnp.float32(0)),
                  length=x_local.length)


def dot_psum(u_local, v_local, axis: str):
    """Distributed quantized dot: local blocked dot + psum over ``axis``."""
    from ..ops import dot as _dot
    return jax.lax.psum(_dot(u_local, v_local), axis)


def norm2_psum(x32_local: jax.Array, axis: str):
    return jnp.sqrt(jax.lax.psum(jnp.sum(x32_local * x32_local), axis))
