"""Fused 8-bit hard-threshold kernel (reference: CloverVector8.h top-K,
same algorithm family as CloverVector4.h:1913-2060).

One pallas_call, two sequential grid phases over the codes:

* phase 0 streams each tile once and stashes every element's |value|
  bit pattern into VMEM scratch (the candidate multiset is the elements
  themselves — no 7-magnitude compression exists at 8 bits).
* at the start of phase 1 a scalar bisection over the candidate bit
  patterns finds the EXACT k-th largest |value| (TPU sorts cost ~1 ms
  at 10^5 elements; ``lax.top_k`` is sort-based — this kernel never
  sorts).  The range is seeded with the multiset max, so TEN nine-way
  levels cover the positive-float range (9^10 > 2^31).
* phase 1 re-streams each tile and keeps strictly-greater elements.
  Ties take a rank-free fast path (``pl.when``) whenever the tie count
  exactly fits the remaining slots — the generic case, since tau is one
  specific element's |code|*s/127 value; otherwise remaining slots fill
  from ties in golden order (|value| desc, index asc) via triangular-
  matmul prefix sums plus a running cross-tile tie counter in SMEM.

Tie values compare at the BIT level of the exact same f32 expression the
XLA path uses, so kernel and XLA results are identical.  The 4-bit
analog of this kernel was removed in r2: the rebuilt XLA candidate path
(ops/threshold.py:_threshold4_xla) beats it at every size.
Layout: codes as (rows, 128) int8 — one row = 2 blocks; scales (rows, 2).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret

# Coverage cap (measured r2): the fused kernel beats the dense-bisect
# XLA path up to 2^20 (its per-tile streams and in-kernel bisect stay
# VMEM-resident); past that the (rows, 128) int32 scratch and the
# serialized tie counter lose to XLA's pipelining.
MAX_ROWS8 = 8192


def _bisect9(count_gt, k: int, hi0):
    """k-th-largest bit pattern via 9-way bisection: eight INDEPENDENT
    pivot counts per level (Mosaic pipelines them — each cross-lane
    reduce is ~us latency, so sequential depth, not throughput, is the
    cost), 10 levels cover the max-seeded positive range (9^10 > 2^31)."""
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

    _, tau = jax.lax.fori_loop(0, 10, body, (jnp.int32(-1), hi0))
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


def _kernel8(codes_ref, scales_ref, out_ref, bits_s, sm, *,
             rt: int, k: int):
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
    out = call(x.codes.reshape(rows, 128), x.scales.reshape(rows, 2))
    return QVec8(codes=out[:rows].reshape(-1), scales=x.scales,
                 length=x.length)
