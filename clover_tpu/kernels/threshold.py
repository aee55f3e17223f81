"""Fused 4-bit hard-threshold kernel (reference: CloverVector4.h:1913-2060).

One pallas_call, two sequential grid phases over the packed codes:

* phase 0 streams each tile once and builds the compressed candidate
  multiset — per (64-block, magnitude a in 1..7) the value ``a * s_b/7``
  and its count — into VMEM scratch (~n/9 entries; a 4-bit block can
  only take 7 distinct magnitudes).
* at the start of phase 1 a 32-step scalar bisection over the candidate
  bit patterns finds the EXACT k-th largest |value| (TPU sorts cost ~1 ms
  at 10^5 elements; `lax.top_k` is sort-based — this kernel never sorts).
* phase 1 re-streams each tile, keeps strictly-greater elements, fills
  the remaining slots from ties in golden order (|value| desc, index
  asc) using triangular-matmul prefix sums plus a running cross-tile tie
  counter in SMEM, and repacks in-register.

Tie values compare at the BIT level of the exact same f32 expression the
XLA path uses (|code| * (s/7)), so kernel and XLA results are identical.
Layout: codes as (rows, 128) int8 — one row = 4 blocks; scales (rows, 4).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QVec4
from .dispatch import pallas_interpret

ROW_BYTES = 128                  # packed bytes per row = 4 blocks
GPR = 4                          # blocks (32-lane groups) per row
# Coverage cap: 2048 rows = n = 2^19.  Measured crossover (r2 rt sweep):
# the fused kernel wins up to 2^18-2^19 (43.8 vs 53.2 us at 2^18), but
# at 2^20 even the best tile height (rt=1024, 168 us) loses to the XLA
# candidate-bisect path (148 us) — the per-tile selection matmuls and
# the (rows, 32) bisect reduces grow faster than the XLA path's.
# The 8-bit kernel keeps its own (larger) cap: its 128-elem rows have no
# nibble-plane bookkeeping and it still beats XLA 2.4x at 2^20
# (118 vs 284 us measured).
MAX_ROWS = 2048
MAX_ROWS8 = 8192


def _bisect9(count_gt, k: int):
    """k-th-largest bit pattern via 9-way bisection: eight INDEPENDENT
    pivot counts per level (Mosaic pipelines them — each cross-lane
    reduce is ~us latency, so sequential depth, not throughput, is the
    cost), 13 levels cover the int32 range (9^13 > 2^41)."""
    def body(_, lohi):
        lo_, hi_ = lohi
        step = jnp.maximum((hi_ - lo_) // 9, 1)
        mids = [jnp.minimum(lo_ + step * j, hi_) for j in range(1, 9)]
        cjs = [count_gt(m) for m in mids]
        lo2, hi2 = lo_, hi_
        for m, c in zip(mids, cjs):
            ge = c >= k
            lo2 = jnp.maximum(lo2, jnp.where(ge, m, lo_))
            hi2 = jnp.minimum(hi2, jnp.where(ge, hi_, m))
        return lo2, hi2

    _, tau = jax.lax.fori_loop(
        0, 13, body, (jnp.int32(-1), jnp.int32(2**31 - 2)))
    return tau


def _place28(vals28, values: bool):
    """(RT, 28) [seven (RT,4) per-a panels] -> (RT, 32): panel a-1,
    group g lands at lane 8*g + (a-1).

    counts (integer inputs < 256): plain bf16 matmul — exact, 6x cheaper
    than HIGHEST.  values (arbitrary f32): HIGHEST (bit-exact copies)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (28, 32), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (28, 32), 1)
    P = jnp.where(c == 8 * (r % 4) + r // 4, 1.0, 0.0)
    if values:
        return jax.lax.dot(vals28, P, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot(vals28.astype(jnp.bfloat16), P.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _expand_groups(vals4):
    """(RT, 4) -> (RT, 128): group g's value broadcast to its 32 lanes
    (HIGHEST: bit-exact copies of arbitrary f32)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (GPR, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (GPR, 128), 1)
    E = jnp.where(c // 32 == r, 1.0, 0.0)
    return jax.lax.dot(vals4, E, precision=jax.lax.Precision.HIGHEST)


def _group_sums(x):
    """(RT, 128) -> (RT, 4) per-32-lane-group sums."""
    return jnp.concatenate(
        [jnp.sum(x[:, 32 * g:32 * (g + 1)], axis=1, keepdims=True)
         for g in range(GPR)], axis=1)


def _lane_prefix_excl(x):
    """(RT, 128) 0/1/2-valued -> exclusive prefix within each 32-lane
    group (plain bf16: inputs <= 2 exact, sums f32)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    BU = jnp.where((r // 32 == c // 32) & (r < c), 1.0, 0.0)
    return jax.lax.dot(x.astype(jnp.bfloat16), BU.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _row_prefix_excl_col(v, rt: int):
    """(RT, 1) int-valued < 256 -> exclusive prefix down the rows
    (plain bf16 inputs, f32 accumulation — exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    L = jnp.where(c < r, 1.0, 0.0)
    return jax.lax.dot(L.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _unpack_i32(p):
    p32 = p.astype(jnp.int32)
    lo = jnp.bitwise_and(p32, 15) - 8
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    return lo, hi


def _kernel(codes_ref, scales_ref, out_ref, cnts_s, cand_s, sm, *,
            rt: int, g_total: int, k: int):
    ph, g = pl.program_id(0), pl.program_id(1)
    p = codes_ref[:]
    lo, hi = _unpack_i32(p)
    alo, ahi = jnp.abs(lo), jnp.abs(hi)
    m7 = scales_ref[:] * (1.0 / 7.0)                    # (RT, 4)

    @pl.when(ph == 0)
    def _():
        panels_c, panels_v = [], []
        for a in range(1, 8):
            e = ((alo == a).astype(jnp.float32)
                 + (ahi == a).astype(jnp.float32))
            panels_c.append(_group_sums(e))
            panels_v.append(jnp.float32(a) * m7)
        cnt32 = _place28(jnp.concatenate(panels_c, axis=1), values=False)
        cand32 = _place28(jnp.concatenate(panels_v, axis=1), values=True)
        cnts_s[pl.dslice(g * rt, rt), :] = cnt32
        cand_s[pl.dslice(g * rt, rt), :] = cand32
        out_ref[:] = p                                  # dummy block

    @pl.when((ph == 1) & (g == 0))
    def _():
        bits = jax.lax.bitcast_convert_type(cand_s[:], jnp.int32)
        cnts = cnts_s[:].astype(jnp.int32)

        def count_gt(t):
            return jnp.sum(jnp.where(bits > t, cnts, 0))

        tau = _bisect9(count_gt, k)
        sm[0, 0] = tau
        sm[0, 1] = count_gt(tau)                        # n_above
        sm[0, 2] = 0                                    # running ties

    @pl.when(ph == 1)
    def _():
        tau = sm[0, 0]
        me = _expand_groups(m7)                         # (RT, 128)
        vlo = alo.astype(jnp.float32) * me
        vhi = ahi.astype(jnp.float32) * me
        blo = jax.lax.bitcast_convert_type(vlo, jnp.int32)
        bhi = jax.lax.bitcast_convert_type(vhi, jnp.int32)
        gt_lo, gt_hi = blo > tau, bhi > tau
        eq_lo = (blo == tau).astype(jnp.float32)
        eq_hi = (bhi == tau).astype(jnp.float32)

        plo = _lane_prefix_excl(eq_lo)
        phi = _lane_prefix_excl(eq_hi)
        glo = _group_sums(eq_lo)                        # (RT, 4)
        ghi = _group_sums(eq_hi)
        tb = glo + ghi                                  # ties per block
        go = jax.lax.dot(                               # offset of block
            tb.astype(jnp.bfloat16),
            jnp.where(jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
                      < jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1),
                      1.0, 0.0).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        row_tot = jnp.sum(tb, axis=1, keepdims=True)    # (RT, 1)
        ro = _row_prefix_excl_col(row_tot, rt)          # (RT, 1)
        # fold the small additive offsets BEFORE expansion: two HIGHEST
        # expansions instead of three (each tiny matmul costs ~1 us
        # fixed on Mosaic)
        base4 = go + jnp.broadcast_to(ro, (rt, GPR)) + sm[0, 2].astype(
            jnp.float32)
        rank_lo = _expand_groups(base4) + plo
        rank_hi = _expand_groups(base4 + glo) + phi
        fill = jnp.float32(k) - sm[0, 1].astype(jnp.float32)
        keep_lo = jnp.logical_or(gt_lo,
                                 (eq_lo > 0) & (rank_lo < fill))
        keep_hi = jnp.logical_or(gt_hi,
                                 (eq_hi > 0) & (rank_hi < fill))
        sm[0, 2] = sm[0, 2] + jnp.sum(tb).astype(jnp.int32)

        lo_k = jnp.where(keep_lo, lo, 0)
        hi_k = jnp.where(keep_hi, hi, 0)
        packed = jnp.bitwise_or(jnp.bitwise_and(lo_k + 8, 15),
                                jnp.left_shift(jnp.bitwise_and(hi_k, 15),
                                               4))
        out_ref[:] = packed.astype(jnp.int8)


def _kernel8(codes_ref, scales_ref, out_ref, bits_s, sm, *,
             rt: int, k: int):
    """8-bit variant: 128 elements per row (2 blocks), no nibble planes;
    the candidate multiset is simply every element's |value| bits (unit
    weights; no 7-magnitude compression exists at 8 bits)."""
    ph, g = pl.program_id(0), pl.program_id(1)
    c = codes_ref[:].astype(jnp.int32)
    a = jnp.abs(c)
    m = _expand_groups2(scales_ref[:] * (1.0 / 127.0))   # (RT, 128)
    v = a.astype(jnp.float32) * m
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)

    @pl.when(ph == 0)
    def _():
        bits_s[pl.dslice(g * rt, rt), :] = bits
        out_ref[:] = codes_ref[:]                        # dummy block

    @pl.when((ph == 1) & (g == 0))
    def _():
        ab = bits_s[:]

        def count_gt(t):
            return jnp.sum(jnp.where(ab > t, 1, 0))

        tau = _bisect9(count_gt, k)
        sm[0, 0] = tau
        sm[0, 1] = count_gt(tau)
        sm[0, 2] = 0

    @pl.when(ph == 1)
    def _():
        tau = sm[0, 0]
        gt = bits > tau
        eq = (bits == tau).astype(jnp.float32)
        # element order within a row IS lane order (no nibble planes):
        # full-row strict-upper prefix + cross-row offset
        r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        U = jnp.where(r < cc, 1.0, 0.0).astype(jnp.bfloat16)
        intra = jax.lax.dot(eq.astype(jnp.bfloat16), U,
                            preferred_element_type=jnp.float32)
        row_tot = jnp.sum(eq, axis=1, keepdims=True)
        ro = _row_prefix_excl_col(row_tot, rt)
        rank = sm[0, 2].astype(jnp.float32) + ro + intra
        fill = jnp.float32(k) - sm[0, 1].astype(jnp.float32)
        keep = jnp.logical_or(gt, (eq > 0) & (rank < fill))
        sm[0, 2] = sm[0, 2] + jnp.sum(eq).astype(jnp.int32)
        out_ref[:] = jnp.where(keep, c, 0).astype(jnp.int8)


def _expand_groups2(vals2):
    """(RT, 2) -> (RT, 128): 64-lane-group broadcast (HIGHEST exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    E = jnp.where(c // 64 == r, 1.0, 0.0)
    return jax.lax.dot(vals2, E, precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=64)
def _build8(rows: int, rt: int, k: int, interpret: bool):
    g_total = rows // rt
    return pl.pallas_call(
        partial(_kernel8, rt=rt, k=k),
        grid=(2, g_total),
        in_specs=[
            pl.BlockSpec((rt, 128), lambda ph, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 2), lambda ph, g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rt, 128), lambda ph, g: (g_total + ph * (g - g_total), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((g_total + 1) * rt, 128),
                                       jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.int32),
                        pltpu.SMEM((1, 4), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def _geometry8(npad: int):
    if npad % 128:
        return None
    rows = npad // 128
    if rows > MAX_ROWS8 or rows < 8:
        return None
    rt = next((r for r in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
               if rows % r == 0), None)
    return (rows, rt) if rt else None


def threshold8_pallas_eligible(x, k: int) -> bool:
    from ..formats import QVec8
    return isinstance(x, QVec8) and _geometry8(x.length_pad) is not None


def threshold8_pallas(x, k: int):
    from ..formats import QVec8
    rows, rt = _geometry8(x.length_pad)
    call = _build8(rows, rt, int(k), pallas_interpret())
    out = call(x.codes.reshape(rows, 128), x.scales.reshape(rows, 2))
    return QVec8(codes=out[:rows].reshape(-1), scales=x.scales,
                 length=x.length)


@lru_cache(maxsize=64)
def _build(rows: int, rt: int, k: int, interpret: bool):
    g_total = rows // rt
    call = pl.pallas_call(
        partial(_kernel, rt=rt, g_total=g_total, k=k),
        grid=(2, g_total),
        in_specs=[
            pl.BlockSpec((rt, ROW_BYTES),
                         lambda ph, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, GPR),
                         lambda ph, g: (g, 0), memory_space=pltpu.VMEM),
        ],
        # phase 0 parks its writes in a dummy trailing block so no block
        # is ever revisited; phase 1 writes the real outputs
        out_specs=pl.BlockSpec(
            (rt, ROW_BYTES),
            lambda ph, g: (g_total + ph * (g - g_total), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((g_total + 1) * rt, ROW_BYTES),
                                       jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, 32), jnp.float32),
                        pltpu.VMEM((rows, 32), jnp.float32),
                        pltpu.SMEM((1, 4), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    return call


def _geometry(npad: int):
    if npad % (2 * ROW_BYTES):
        return None
    rows = npad // (2 * ROW_BYTES)
    if rows > MAX_ROWS or rows < 8:
        return None
    # rt <= 1024: the (rt, rt) triangular row-prefix build grows with
    # rt^2 (247.6 -> 167.9 us at rows=4096 going 2048 -> 1024)
    rt = next((r for r in (1024, 512, 256, 128, 64, 32, 16, 8)
               if rows % r == 0), None)
    if rt is None:
        return None
    return rows, rt


def threshold4_pallas_eligible(x, k: int) -> bool:
    return isinstance(x, QVec4) and _geometry(x.length_pad) is not None


def threshold4_pallas(x, k: int):
    rows, rt = _geometry(x.length_pad)
    call = _build(rows, rt, int(k), pallas_interpret())
    out = call(x.codes.reshape(rows, ROW_BYTES),
               x.scales.reshape(rows, GPR))
    codes = out[:rows].reshape(-1)
    return QVec4(codes=codes, scales=x.scales, length=x.length)
