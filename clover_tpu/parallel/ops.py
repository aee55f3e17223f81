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
from ..ops._core import f16_rounded
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
             out_owner_axis: str, a_i4=None):
    """Local fused-MVM partial -> psum over ``reduce_axis`` -> requantize.

    The psum happens BEFORE output requantization so every shard's band
    absmax sees the globally reduced values — the distributed version of
    CloverMatrix4.h:788-1083's band requant.  On TPU the per-shard
    partial runs the fused Pallas kernel (mvm_f32_fast); ``a_i4`` is
    the shard's prepared int4 stream view (kernels.mat4_i4_stream) so
    multi-chip 4x4 legs ride the single-int4-matmul kernel.
    """
    y32 = mvm_f32_fast(A_local, x_local, a_i4=a_i4)
    y32 = jax.lax.psum(y32, reduce_axis)
    if out_bits == 32:
        return QVec32(values=y32, length=A_local.rows)
    if out_bits == 16:
        return QVec16(values=f16_rounded(y32), length=A_local.rows)
    return quantize_vec(QVec32(values=y32, length=A_local.rows), out_bits,
                        key=axis_key(key, out_owner_axis))


def mvm_batched_psum(A_local, xs_local, reduce_axis: str, key,
                     out_bits: int, out_owner_axis: str):
    """Sharded batched MVM on the fused kernel (VERDICT r2 #9): per-shard
    batched kernel in f32-output mode (ops.gemm.mvm_batched_f32_fast ->
    kernels/mvm_batched.mvm_batched_pallas_f32 on TPU), psum of the f32
    partials over ``reduce_axis``, THEN the per-vector band requant — the
    batch-of-vectors version of :func:`mvm_psum`, replacing serving.py's
    GSPMD fallback for mesh-resident matrices.

    ``xs_local`` is a stacked vector container whose per-vector arrays are
    sharded along ``reduce_axis``.  Returns a stacked container owned by
    ``out_owner_axis`` shards.  Per-vector SR seeds stride by batch index
    so each request draws an independent stream (same scheme as
    ops/gemm.mvm_batched).
    """
    from ..ops.gemm import mvm_batched_f32_fast
    ys = mvm_batched_f32_fast(A_local, xs_local)       # (b, m_local)
    ys = jax.lax.psum(ys, reduce_axis)
    b = ys.shape[0]
    rows = A_local.rows
    if out_bits == 32:
        return QVec32(values=ys, length=rows)
    if out_bits == 16:
        return QVec16(values=f16_rounded(ys), length=rows)
    k0 = axis_key(key, out_owner_axis)
    if k0 is None:
        keys = None
    else:
        arr = jnp.asarray(k0)
        if arr.dtype == jnp.int32:
            keys = arr.reshape(1, -1) + jnp.arange(b, dtype=jnp.int32)[:, None]
        else:
            keys = jax.vmap(lambda i: jax.random.fold_in(k0, i))(jnp.arange(b))

    def quant(y, k):
        return quantize_vec(QVec32(values=y, length=rows), out_bits, key=k)

    if keys is None:
        return jax.vmap(lambda y: quant(y, None))(ys)
    return jax.vmap(quant)(ys, keys)


def _col_chunk_mat(A, b0: int, b1: int):
    """Column-block slice [64*b0, 64*b1) of a quantized matrix.  The packed
    layout is block-contiguous (formats.pack_nibbles deinterleaves WITHIN
    each 64-block), so 4-bit byte columns slice at 32*b and scales at b."""
    from ..formats import QMat4, QMat8
    cols = (b1 - b0) * 64
    if isinstance(A, QMat4):
        return QMat4(codes=A.codes[:, 32 * b0:32 * b1],
                     scales=A.scales[:, b0:b1], rows=A.rows, cols=cols)
    assert isinstance(A, QMat8)
    return QMat8(codes=A.codes[:, 64 * b0:64 * b1],
                 scales=A.scales[:, b0:b1], rows=A.rows, cols=cols)


def _chunk_vec(x, b0: int, b1: int):
    from ..formats import QVec4, QVec8
    n = (b1 - b0) * 64
    if isinstance(x, QVec4):
        return QVec4(codes=x.codes[32 * b0:32 * b1],
                     scales=x.scales[b0:b1], length=n)
    assert isinstance(x, QVec8)
    return QVec8(codes=x.codes[64 * b0:64 * b1],
                 scales=x.scales[b0:b1], length=n)


# Measured on-chip (v5e, n=16K local shard, prepared chunks): each extra
# chunk costs ~5 us of launch + stream-efficiency loss (chunks=2 +2.2,
# 4 +16, 8 +53 us vs the unchunked 212 us); UNPREPARED column slices pay
# a full local-matrix copy per call (+415 us — XLA does not hoist the
# slices out of solver loops), which is why prepare_psum_chunks exists.
PSUM_CHUNK_OVERHEAD_S = 5e-6
# per-direction ring-all-reduce link bandwidth used by the chunk model;
# override with CLOVER_PSUM_LINK_GBS (e.g. ~2-10 for DCN-attached pods)
PSUM_LINK_GBS_DEFAULT = 45.0


def prepare_psum_chunks(A_local, chunks: int):
    """Materialize the column-chunk containers ONCE (hoist out of solver
    scans): a pytree of contiguous per-chunk matrices behind an
    optimization barrier so XLA builds them a single time."""
    nb = A_local.cols_pad // 64
    chunks = max(1, min(chunks, nb))
    bounds = [round(i * nb / chunks) for i in range(chunks + 1)]
    mats = [_col_chunk_mat(A_local, bounds[c], bounds[c + 1])
            for c in range(chunks)]
    return jax.lax.optimization_barrier(mats)


def pick_psum_chunks(rows_local: int, cols_pad_local: int, n_dev: int,
                     bits: int = 4, link_gbs: float | None = None,
                     hbm_gbs: float = 740.0) -> int:
    """Model-based chunk count for :func:`mvm_psum_overlapped` (VERDICT
    r4 item 5): 1 means "use plain mvm_psum".

    Overlap hides min(T_compute, T_psum) * (c-1)/c at a measured cost of
    ~PSUM_CHUNK_OVERHEAD_S per extra chunk.  T_compute = local matrix
    bytes / HBM rate; T_psum = ring all-reduce of the f32 partial vector,
    2*(D-1)/D * 4*rows / link rate.  On pure-ICI v5e meshes T_psum is
    ~3 us at serving sizes — chunking NEVER pays there and this returns
    1; it engages for DCN-class links (CLOVER_PSUM_LINK_GBS) or very
    tall shards.  c* = sqrt(min(Tc,Tp)/overhead), clamped to [2, 8],
    accepted only when the modeled net saving is positive."""
    import math
    import os
    if n_dev <= 1:
        return 1
    if link_gbs is None:
        link_gbs = float(os.environ.get("CLOVER_PSUM_LINK_GBS",
                                        PSUM_LINK_GBS_DEFAULT))
    local_bytes = rows_local * cols_pad_local * bits / 8.0
    tc = local_bytes / (hbm_gbs * 1e9)
    tp = 2.0 * (n_dev - 1) / n_dev * 4.0 * rows_local / (link_gbs * 1e9)
    hideable = min(tc, tp)
    c = max(2, min(8, int(math.sqrt(hideable / PSUM_CHUNK_OVERHEAD_S))))
    saving = hideable * (c - 1) / c - PSUM_CHUNK_OVERHEAD_S * (c - 1)
    return c if saving > PSUM_CHUNK_OVERHEAD_S else 1


def mvm_psum_overlapped(A_local, x_local, reduce_axis: str, key,
                        out_bits: int, out_owner_axis: str,
                        chunks: int = 4, prepared=None):
    """:func:`mvm_psum` with the k-reduction chunked so ICI transfer can
    overlap MXU/HBM compute (the BASELINE.json north star: "partial
    dot-products reduced via ICI psum overlapped with compute").

    The local column range splits into ``chunks`` 64-aligned groups; each
    group's fused partial MVM feeds its own ``psum``.  Chunk c+1's compute
    has NO data dependency on chunk c's psum, so XLA's async-collective
    scheduler can run the (c+1)-th kernel while the c-th all-reduce is in
    flight; the final band requant still sees the fully reduced values, so
    the requant-after-psum correctness rule is preserved.  Total HBM
    traffic is unchanged (each chunk streams its own column slice once).

    Numerics: the f32 block-sum association differs from mvm_psum (per-
    chunk partial sums), the same class of difference psum itself already
    introduces; the exact-integer cross-check passes bit-for-bit
    (tests/test_parallel.py::test_mvm_psum_overlapped_exact).

    When it wins (design note, v5e numbers): per-shard compute time is
    bytes/740 GB/s; the psum moves 4*rows bytes over ICI both ways.  For
    a (row=R, col=C) sharding of an m x n 4-bit matrix, compute is
    ~(mn/2)/(RC)/740e9 s and the col-psum is ~4m/R / 45e9 s per hop
    direction; overlap hides min(compute, psum) * (chunks-1)/chunks.  At
    m=n=32768 on a 1x4 mesh: compute ~181 us, psum ~2.9 us — negligible
    (<2%), chunking is pure overhead.  It matters when n/C shrinks or C
    grows: at m=n=8192 on 1x16, compute ~2.8 us vs psum ~0.7 us, and for
    mixed DCN-attached meshes (psum ~10-100x slower) chunking hides a
    first-order cost.  Dispatch (r5): parallel/solvers auto-picks via
    :func:`pick_psum_chunks` from static shard shapes and the link
    estimate, preparing the chunk containers once per solve
    (:func:`prepare_psum_chunks` — unprepared slices pay a full
    local-matrix copy per call); the model returns 1 on pure-ICI v5e
    meshes, so the r4 1x1 regression is no longer reachable by
    accident.
    """
    nb = A_local.cols_pad // 64
    chunks = max(1, min(chunks, nb))
    bounds = [round(i * nb / chunks) for i in range(chunks + 1)]
    if prepared is None:
        prepared = prepare_psum_chunks(A_local, chunks)
    partials = []
    for c in range(chunks):
        b0, b1 = bounds[c], bounds[c + 1]
        if b0 == b1:
            continue
        partials.append(mvm_f32_fast(prepared[c],
                                     _chunk_vec(x_local, b0, b1)))
    y32 = None
    for p in partials:
        r = jax.lax.psum(p, reduce_axis)
        y32 = r if y32 is None else y32 + r
    if out_bits == 32:
        return QVec32(values=y32, length=A_local.rows)
    if out_bits == 16:
        return QVec16(values=f16_rounded(y32), length=A_local.rows)
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
