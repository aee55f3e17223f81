"""Fused hard-threshold kernels (reference: CloverVector4.h:1913-2060,
ditto CloverVector8.h).

One pallas_call, two sequential grid phases over the codes:

* phase 0 streams each tile once and stashes the candidate multiset
  into VMEM scratch: for 8-bit every element's |value| bit pattern; for
  4-bit the compressed per-(64-block, magnitude a in 1..7) value
  ``a * s_b/7`` and its count (~n/9 entries — a 4-bit block can only
  take 7 distinct magnitudes).
* at the start of phase 1 a scalar bisection over the candidate bit
  patterns finds the EXACT k-th largest |value| (TPU sorts cost ~1 ms
  at 10^5 elements; ``lax.top_k`` is sort-based — this kernel never
  sorts).  The range is seeded with the multiset max; 12 nine-way
  levels (10 + two unit-step levels for the per-level remainder slack)
  resolve it exactly.
* phase 1 re-streams each tile and keeps strictly-greater elements.
  Ties take a rank-free fast path (``pl.when``) whenever the tie count
  exactly fits the remaining slots — the generic case, since tau is one
  specific block's quantized value; otherwise remaining slots fill
  from ties in golden order (|value| desc, index asc) via triangular-
  matmul prefix sums plus a running cross-tile tie counter in SMEM.

Tie values compare at the BIT level of the exact same f32 expression the
XLA path uses, so kernel and XLA results are identical.

Size caps: the kernels win where the XLA paths pay a fixed
multi-dispatch latency; past the caps ops/threshold.py's wide-view
bisect paths take over.  The r2 4-bit kernel stored candidates as
(rows, 32) — quarter VPU width — and lost to XLA past 2^17; r4 packs
four rows' candidate panels per full-width scratch row, which took the
bisection scans to full width and moved the crossover past 2^20
(doc/results/threshold4_r4.md).
Layouts: 8-bit codes as (rows, 128) int8 — one row = 2 blocks; 4-bit
packed codes as (rows, 128) int8 — one row = 4 blocks; scales lane-major.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret

# Coverage caps (r4 recrossed against the XLA paths,
# doc/results/threshold4_r4.md).  8-bit: the r4 approx_max_k+verify
# dense path (ops/threshold._tau_approx_verified) overtakes this kernel
# past n=2^17 (measured 21.8 vs 26.1 us at 2^18, 42.7 vs 88.3 at 2^20)
# — the r2/r3 cap was 2^20 against the old dense-bisect.  4-bit: the
# r2/r3 kernel was capped at 2^17 because its (rows, 32) candidate
# arrays ran the VPU quarter-width; r4 packs four rows' candidate
# panels into full 128-lane scratch rows (sublane reshape +
# lane-banded stores), which moved the crossover vs the wide-view XLA
# path to ~2^20 (45.9 vs 55.8 us at 2^19, 90.8 vs ~93 at 2^20).
MAX_ROWS8 = 1024                 # 8-bit cap: n = 2^17
ROW_BYTES = 128                  # 4-bit packed bytes per row = 4 blocks
GPR = 4                          # 4-bit blocks (32-lane groups) per row
MAX_ROWS4 = 4096                 # 4-bit cap: n = 2^20


def _bisect9(count_gt, k: int, hi0, fan: int | None = None):
    """k-th-largest bit pattern via fan-way bisection: fan-1 INDEPENDENT
    pivot counts per level (Mosaic pipelines them — each cross-lane
    reduce is ~us latency, so sequential depth, not throughput, is the
    cost).  Depth per ops.threshold._bisect_levels over the max-seeded
    positive range (fan=9 -> 12 levels: each level leaves width
    floor(w/9) plus up to 8 of remainder slack, so w_L <= 2^31/9^L + 9 —
    10 levels can leave a ~10-wide bracket and two unit-step levels
    resolve it exactly; a 10-level version kept k-1 elements on adjacent
    bit patterns).  The fan defaults to ops.threshold.BISECT_FAN so the
    kernel and XLA paths sweep together."""
    from ..ops.threshold import BISECT_FAN, _bisect_levels
    fan = BISECT_FAN if fan is None else fan

    def body(_, lohi):
        lo_, hi_ = lohi
        step = jnp.maximum((hi_ - lo_) // fan, 1)
        mids = [jnp.minimum(lo_ + step * j, hi_) for j in range(1, fan)]
        cjs = [count_gt(m) for m in mids]
        lo2, hi2 = lo_, hi_
        for m, c in zip(mids, cjs):
            ge = c >= k
            lo2 = jnp.maximum(lo2, jnp.where(ge, m, lo_))
            hi2 = jnp.minimum(hi2, jnp.where(ge, hi_, m))
        return lo2, hi2

    _, tau = jax.lax.fori_loop(0, _bisect_levels(fan), body,
                               (jnp.int32(-1), hi0))
    return tau


def _row_prefix_excl_col(v, rt: int):
    """(RT, 1) int-valued < 2^24 -> exclusive prefix down the rows
    (plain bf16 inputs < 256, f32 accumulation — exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
    L = jnp.where(c < r, 1.0, 0.0)
    return jax.lax.dot(L.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _expand_groups2(vals2):
    """(RT, 2) -> (RT, 128): 64-lane-group broadcast (HIGHEST exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    E = jnp.where(c // 64 == r, 1.0, 0.0)
    return jax.lax.dot(vals2, E, precision=jax.lax.Precision.HIGHEST)


def _kernel8(codes_ref, ms_ref, out_ref, bits_s, sm, *,
             rt: int, k: int):
    # ms_ref carries scales/127 PRE-DIVIDED outside the kernel so tie
    # bits match the XLA path's restore expression exactly (in-kernel
    # division can differ by 1 ULP)
    ph, g = pl.program_id(0), pl.program_id(1)
    c = codes_ref[:].astype(jnp.int32)
    a = jnp.abs(c)
    m = _expand_groups2(ms_ref[:])                       # (RT, 128)
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

        tau = _bisect9(count_gt, k, jnp.max(ab))
        sm[0, 0] = tau
        sm[0, 1] = count_gt(tau)                         # n_above
        sm[0, 2] = 0                                     # running ties
        sm[0, 3] = jnp.sum(jnp.where(ab == tau, 1, 0))   # n_eq

    @pl.when(ph == 1)
    def _():
        tau = sm[0, 0]
        gt = bits > tau
        eq = bits == tau
        fill = jnp.float32(k) - sm[0, 1].astype(jnp.float32)

        # ties fit the remaining slots exactly (n_eq == k - n_above):
        # keep them all — no rank matmuls, no cross-tile serialization.
        # Zero-valued ties (tau == 0, incl. padding) write code 0 either
        # way, so the fast path is safe there too.
        @pl.when(sm[0, 3] + sm[0, 1] == k)
        def _():
            out_ref[:] = jnp.where(gt | eq, c, 0).astype(jnp.int8)

        @pl.when(sm[0, 3] + sm[0, 1] != k)
        def _():
            eqf = eq.astype(jnp.float32)
            # element order within a row IS lane order (no nibble
            # planes): full-row strict-upper prefix + cross-row offset
            r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            U = jnp.where(r < cc, 1.0, 0.0).astype(jnp.bfloat16)
            intra = jax.lax.dot(eqf.astype(jnp.bfloat16), U,
                                preferred_element_type=jnp.float32)
            row_tot = jnp.sum(eqf, axis=1, keepdims=True)
            ro = _row_prefix_excl_col(row_tot, rt)
            rank = sm[0, 2].astype(jnp.float32) + ro + intra
            keep = jnp.logical_or(gt, (eq > 0) & (rank < fill))
            sm[0, 2] = sm[0, 2] + jnp.sum(eqf).astype(jnp.int32)
            out_ref[:] = jnp.where(keep, c, 0).astype(jnp.int8)


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
        # phase 0 parks its writes in a dummy trailing block so no block
        # is ever revisited; phase 1 writes the real outputs
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
    out = call(x.codes.reshape(rows, 128),
               (x.scales / 127.0).reshape(rows, 2))
    return QVec8(codes=out[:rows].reshape(-1), scales=x.scales,
                 length=x.length)


# ---------------------------------------------------------------------------
# 4-bit kernel (compressed candidate multiset)
# ---------------------------------------------------------------------------

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


def _unpack_i32(p):
    p32 = p.astype(jnp.int32)
    lo = jnp.bitwise_and(p32, 15) - 8
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    return lo, hi


def _kernel4(codes_ref, ms_ref, out_ref, cnts_s, cand_s, sm, *,
             rt: int, g_total: int, k: int):
    # ms_ref carries scales/7 PRE-DIVIDED outside the kernel so tie
    # bits match the XLA path's restore expression exactly (in-kernel
    # division can differ by 1 ULP)
    ph, g = pl.program_id(0), pl.program_id(1)
    p = codes_ref[:]
    lo, hi = _unpack_i32(p)
    alo, ahi = jnp.abs(lo), jnp.abs(hi)
    m7 = ms_ref[:]                                      # (RT, 4)

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
        # pack FOUR rows into one full-width scratch row (row 4q+j lands
        # in lane quarter j): sublane-split reshape, then one lane-banded
        # store per quarter (tpu.concatenate of the offset slices is not
        # implemented in Mosaic: "offset mismatch on non-concat dim") —
        # the bisection then scans at full VPU width (the r2/r3
        # (rows, 32) layout ran it quarter-width, capping the kernel at
        # 2^17)
        r4 = pl.dslice(g * (rt // 4), rt // 4)
        qc = cnt32.reshape(rt // 4, 4, 32)
        qv = cand32.reshape(rt // 4, 4, 32)
        for j in range(4):
            cnts_s[r4, 32 * j:32 * (j + 1)] = qc[:, j, :]
            cand_s[r4, 32 * j:32 * (j + 1)] = qv[:, j, :]
        out_ref[:] = p                                  # dummy block

    @pl.when((ph == 1) & (g == 0))
    def _():
        bits = jax.lax.bitcast_convert_type(cand_s[:], jnp.int32)
        cnts = cnts_s[:].astype(jnp.int32)

        def count_gt(t):
            return jnp.sum(jnp.where(bits > t, cnts, 0))

        tau = _bisect9(count_gt, k, jnp.max(bits))
        sm[0, 0] = tau
        sm[0, 1] = count_gt(tau)                        # n_above
        sm[0, 2] = 0                                    # running ties
        sm[0, 3] = jnp.sum(jnp.where(bits == tau, cnts, 0))   # n_eq

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
        fill = jnp.float32(k) - sm[0, 1].astype(jnp.float32)

        def pack_write(keep_lo, keep_hi):
            lo_k = jnp.where(keep_lo, lo, 0)
            hi_k = jnp.where(keep_hi, hi, 0)
            out_ref[:] = jnp.bitwise_or(
                jnp.bitwise_and(lo_k + 8, 15),
                jnp.left_shift(jnp.bitwise_and(hi_k, 15), 4)
            ).astype(jnp.int8)

        # multiset ties fit the remaining slots exactly AND tau > 0
        # (the multiset has no zero-valued entries, so at tau == 0 the
        # element-level tie count can exceed n_eq): keep every tie, no
        # rank matmuls, no cross-tile serialization
        fastp = (sm[0, 3] + sm[0, 1] == k) & (tau > 0)

        @pl.when(fastp)
        def _():
            pack_write(gt_lo | (eq_lo > 0), gt_hi | (eq_hi > 0))

        @pl.when(jnp.logical_not(fastp))
        def _():
            plo = _lane_prefix_excl(eq_lo)
            phi = _lane_prefix_excl(eq_hi)
            glo = _group_sums(eq_lo)                    # (RT, 4)
            ghi = _group_sums(eq_hi)
            tb = glo + ghi                              # ties per block
            go = jax.lax.dot(                           # offset of block
                tb.astype(jnp.bfloat16),
                jnp.where(jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
                          < jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1),
                          1.0, 0.0).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            row_tot = jnp.sum(tb, axis=1, keepdims=True)  # (RT, 1)
            ro = _row_prefix_excl_col(row_tot, rt)        # (RT, 1)
            # fold the small additive offsets BEFORE expansion: two
            # HIGHEST expansions instead of three (each tiny matmul
            # costs ~1 us fixed on Mosaic)
            base4 = go + jnp.broadcast_to(ro, (rt, GPR)) + sm[0, 2].astype(
                jnp.float32)
            rank_lo = _expand_groups(base4) + plo
            rank_hi = _expand_groups(base4 + glo) + phi
            sm[0, 2] = sm[0, 2] + jnp.sum(tb).astype(jnp.int32)
            pack_write(gt_lo | ((eq_lo > 0) & (rank_lo < fill)),
                       gt_hi | ((eq_hi > 0) & (rank_hi < fill)))


@lru_cache(maxsize=64)
def _build4(rows: int, rt: int, k: int, interpret: bool):
    g_total = rows // rt
    return pl.pallas_call(
        partial(_kernel4, rt=rt, g_total=g_total, k=k),
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
        scratch_shapes=[pltpu.VMEM((rows // 4, 128), jnp.float32),
                        pltpu.VMEM((rows // 4, 128), jnp.float32),
                        pltpu.SMEM((1, 4), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def _geometry4(npad: int):
    if npad % (2 * ROW_BYTES):
        return None
    rows = npad // (2 * ROW_BYTES)
    if rows > MAX_ROWS4 or rows < 8:
        return None
    rt = next((r for r in (512, 256, 128, 64, 32, 16, 8)
               if rows % r == 0), None)
    if rt is None:
        return None
    return rows, rt


def threshold4_pallas_eligible(x, k: int) -> bool:
    from ..formats import QVec4
    return isinstance(x, QVec4) and _geometry4(x.length_pad) is not None


def threshold4_pallas(x, k: int):
    from ..formats import QVec4
    rows, rt = _geometry4(x.length_pad)
    call = _build4(rows, rt, int(k), pallas_interpret())
    out = call(x.codes.reshape(rows, ROW_BYTES),
               (x.scales / 7.0).reshape(rows, GPR))
    return QVec4(codes=out[:rows].reshape(-1), scales=x.scales,
                 length=x.length)


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# r5 hybrid building blocks: histogram + mask/pack streaming kernels at the
# full (rows, 128) byte layout (one row = GPR=4 blocks; the (nb, 32)
# one-block-per-row draft measured ~68 GB/s — quarter-lane width).
# Selection happens in XLA between them (ops/threshold._threshold4_hybrid).
# ---------------------------------------------------------------------------

def _unpack_row128(c_ref):
    xp = c_ref[:].astype(jnp.int32)
    lo = jnp.bitwise_and(xp, 15) - 8
    hi = jax.lax.shift_right_arithmetic(xp, 4)
    return lo, hi


def _group_indicator():
    """(128, GPR) f32: lane l -> 1 in column l // 32."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, GPR), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, GPR), 1)
    return jnp.where(r // 32 == c, 1.0, 0.0)


def _hist4_kernel(c_ref, h_ref):
    lo, hi = _unpack_row128(c_ref)
    alo, ahi = jnp.abs(lo), jnp.abs(hi)
    G = _group_indicator().astype(jnp.bfloat16)
    cols = []
    for c in range(8):
        ind = (jnp.where(alo == c, 1.0, 0.0)
               + jnp.where(ahi == c, 1.0, 0.0)).astype(jnp.bfloat16)
        # exact: 0/1/2 entries, counts <= 64, f32 accumulation
        cols.append(jax.lax.dot(ind, G,
                                preferred_element_type=jnp.float32))
    h_ref[:] = jnp.concatenate(cols, axis=1)      # (rt, 8*GPR), c-major


@lru_cache(maxsize=32)
def _build_hist4(rows: int, rt: int, interpret: bool):
    return pl.pallas_call(
        _hist4_kernel,
        grid=(rows // rt,),
        in_specs=[pl.BlockSpec((rt, ROW_BYTES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rt, 8 * GPR), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8 * GPR), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def hist4_geometry(npad: int):
    if npad % (2 * ROW_BYTES):
        return None
    rows = npad // (2 * ROW_BYTES)
    rt = next((r for r in (1024, 512, 256, 128, 64, 32, 16, 8)
               if rows % r == 0), None)
    return None if rt is None else (rows, rt)


def hist4_pallas(codes: jax.Array, npad: int) -> jax.Array:
    """Packed 4-bit codes -> (nb, 8) f32 per-block magnitude counts
    (column c = count of |code| == c).  One full-width stream pass; the
    compressed representation the r5 hybrid threshold selects tau on."""
    rows, rt = hist4_geometry(npad)
    h = _build_hist4(rows, rt, pallas_interpret())(
        codes.reshape(rows, ROW_BYTES))
    # kernel emits c-major lanes (c * GPR + g); block index = GPR*r + g
    return h.reshape(rows, 8, GPR).transpose(0, 2, 1).reshape(-1, 8)


def _rank_mats():
    """The three fixed 0/1 lane matrices that rank ties in ELEMENT order
    from (rows, 128)-layout nibble-plane masks.  Element order within a
    row: per 32-lane group g, lo elements (lanes 32g..32g+31) precede hi
    elements of the same group, then group g+1.

      rank_lo = tlo @ A + thi @ B;  rank_hi = tlo @ C + thi @ A
      A[j,l] = [gj <  gl] or [gj == gl and j < l]   (strict, same plane)
      B[j,l] = [gj <  gl]                           (earlier groups only)
      C[j,l] = [gj <= gl]                           (all lo precede hi)
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    gj, gl = j // 32, l // 32
    A = jnp.where((gj < gl) | ((gj == gl) & (j < l)), 1.0, 0.0)
    B = jnp.where(gj < gl, 1.0, 0.0)
    C = jnp.where(gj <= gl, 1.0, 0.0)
    bf = jnp.bfloat16
    return A.astype(bf), B.astype(bf), C.astype(bf)


def _expand_groups4(vals4):
    """(RT, GPR) f32 -> (RT, 128): 32-lane-group broadcast (HIGHEST
    exact: one nonzero 0/1 weight per output lane)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (GPR, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (GPR, 128), 1)
    E = jnp.where(c // 32 == r, 1.0, 0.0)
    return jax.lax.dot(vals4, E, precision=jax.lax.Precision.HIGHEST)


def _mask4_kernel(c_ref, ms_ref, tf_ref, o_ref, carry, *, rt):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry[0] = jnp.float32(0.0)

    lo, hi = _unpack_row128(c_ref)
    alo, ahi = jnp.abs(lo), jnp.abs(hi)
    # element |values| from the PRE-DIVIDED s/7 (same expression as the
    # wide-view ev: float(|code|) * (s/7) — bit-identical products)
    m = _expand_groups4(ms_ref[:])
    vlo = alo.astype(jnp.float32) * m
    vhi = ahi.astype(jnp.float32) * m
    tau = tf_ref[0, 0]
    fill = tf_ref[0, 1]
    tlo = jnp.where(vlo == tau, 1.0, 0.0)
    thi = jnp.where(vhi == tau, 1.0, 0.0)
    # golden tie order (|value| desc, index asc): exclusive prefix ranks
    # via fixed lane matmuls (exact: 0/1 entries, totals < 2^24)
    A, B, C = _rank_mats()
    bf = jnp.bfloat16
    pt = jnp.float32
    rlo = (jax.lax.dot(tlo.astype(bf), A, preferred_element_type=pt)
           + jax.lax.dot(thi.astype(bf), B, preferred_element_type=pt))
    rhi = (jax.lax.dot(tlo.astype(bf), C, preferred_element_type=pt)
           + jax.lax.dot(thi.astype(bf), A, preferred_element_type=pt))
    rowtot = jnp.sum(tlo + thi, axis=1, keepdims=True)
    rowoff = _row_prefix_excl_col(rowtot, rt) + carry[0]
    keep_lo = jnp.logical_or(
        vlo > tau, jnp.logical_and(tlo > 0.0, rlo + rowoff < fill))
    keep_hi = jnp.logical_or(
        vhi > tau, jnp.logical_and(thi > 0.0, rhi + rowoff < fill))
    carry[0] = carry[0] + jnp.sum(rowtot)
    klo = jnp.where(keep_lo, lo, 0)
    khi = jnp.where(keep_hi, hi, 0)
    o_ref[:] = (16 * khi + (klo + 8)).astype(jnp.int8)


@lru_cache(maxsize=32)
def _build_mask4(rows: int, rt: int, interpret: bool):
    vm = pltpu.VMEM
    return pl.pallas_call(
        partial(_mask4_kernel, rt=rt),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, ROW_BYTES), lambda g: (g, 0),
                         memory_space=vm),
            pl.BlockSpec((rt, GPR), lambda g: (g, 0), memory_space=vm),
            pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((rt, ROW_BYTES), lambda g: (g, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((rows, ROW_BYTES), jnp.int8),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # sequential: the tie-rank carry crosses grid steps
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


# mask tiles: per-step cost is dominated by fixed sequential-carry
# overheads at small rt and the (rt, rt) prefix build at large rt;
# 512 measured best at 2^20 (16.1 vs 17.5/21.8 us for 1024/2048)
_MASK_RT = (512, 1024, 256, 128, 64, 32, 16, 8)


def mask4_pallas(codes: jax.Array, m7: jax.Array, tau: jax.Array,
                 fill: jax.Array, npad: int) -> jax.Array:
    """Keep |value| > tau plus the first ``fill`` ties in golden order,
    over packed 4-bit codes, in ONE full-width stream pass.  ``m7``:
    (nb,) pre-divided scales/7 (the restore multiplier); tau/fill: f32
    scalars from the compressed-multiset selector."""
    rows = npad // (2 * ROW_BYTES)
    rt = next((r for r in _MASK_RT if rows % r == 0), None)
    if rt is None:
        rows, rt = hist4_geometry(npad)
    call = _build_mask4(rows, rt, pallas_interpret())
    tf = jnp.stack([tau, fill]).reshape(1, 2)
    out = call(codes.reshape(rows, ROW_BYTES), m7.reshape(rows, GPR), tf)
    return out.reshape(-1)
