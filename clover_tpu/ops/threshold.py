"""Hard thresholding: keep the top-K elements by |value|, zero the rest.

Reference: CloverVector4.h:1913-2060 (min-heap streaming), ditto for 8/16/32.
Block scales are NOT updated (reference behavior: only ``setBits(i, 0)`` is
called; the scale array is untouched).  Ties break toward the lower index —
the reference's heap is order-dependent on ties, so we fix a deterministic
rule (its validation compares restored top-K sets at 10% tolerance,
test/validate/02_vector.cpp:449-554, which this satisfies).

TPU-native design: ``jax.lax.top_k`` over |restored| (a single fused
reduce), then a scatter mask over the codes.  The distributed version
(per-shard top-k + gathered merge) lives in clover_tpu.parallel — the same
two-phase algorithm as the reference's parallel heap merge
(CloverVector4.h:1975-2060) with ICI standing in for shared memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import (
    BLOCK, QVec4, QVec8, QVec16, QVec32, pack_nibbles, unpack_nibbles,
)
from .quantize import restore_vec


_CHUNK = 2048


def _top_k_idx(vals: jax.Array, k: int) -> jax.Array:
    """Indices of the top-k values; deterministic lower-index tie-break.

    For large vectors a two-stage select (per-2048-chunk top-k, then
    top-k over the C*k candidates) replaces the full-length sort — the
    global top-k is always a subset of the per-chunk top-k's, and
    ``lax.top_k``'s stable ordering preserves the lower-index tie-break
    through both stages (candidates stay in (chunk, rank) order)."""
    npad = vals.shape[-1]
    if npad % _CHUNK or npad // _CHUNK < 4 or k > _CHUNK:
        _, idx = jax.lax.top_k(vals, k)
        return idx
    c = npad // _CHUNK
    pv, pi = jax.lax.top_k(vals.reshape(c, _CHUNK), k)     # (c, k)
    base = (jnp.arange(c, dtype=jnp.int32) * _CHUNK)[:, None]
    gidx = (pi.astype(jnp.int32) + base).reshape(-1)
    _, sel = jax.lax.top_k(pv.reshape(-1), k)
    return gidx[sel]


def _tau_bisect(cand: jax.Array, counts: jax.Array, k: int):
    """(tau_bits, n_above): the bit pattern of the k-th largest element
    of the weighted candidate multiset (cand >= 0, f32), and the count
    strictly above it.

    9-way bisection on the non-negative-float bit ordering — TPU sorts
    cost ~1 ms at 10^5 elements.  Each level evaluates EIGHT pivots at
    once ((8, C) broadcast compare, independent reduces): the count
    passes are throughput-cheap but their cross-lane reduces are
    ~us-latency each, so sequential DEPTH is what matters — 12 nine-way
    levels replace 32 two-way steps (9^12 > 2^38 covers the int32
    range).  If the multiset has fewer than k entries the result
    degenerates to tau_bits = 0 / keep-everything, which is correct for
    thresholding (only zero codes are added to the kept set)."""
    bits = jax.lax.bitcast_convert_type(cand, jnp.int32)
    counts = counts.astype(jnp.int32)
    # materialize BEFORE the loop: without the barrier XLA fuses the
    # candidate/count computation into the while body and recomputes it
    # on every bisection step (measured 30x slowdown)
    bits, counts = jax.lax.optimization_barrier((bits, counts))

    def count_gt(t):
        return jnp.sum(jnp.where(bits > t, counts, 0))

    j8 = jnp.arange(1, 9, dtype=jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        # evenly-stepped pivots in (lo, hi]; step*j8 cannot overflow
        # (step <= (hi-lo)/9) and max(step,1) guarantees progress at
        # small widths, where the clamp to hi keeps pivots in range
        step = jnp.maximum((hi - lo) // 9, 1)
        mids = jnp.minimum(lo + step * j8, hi)           # (8,)
        cj = jnp.sum(jnp.where(bits[None, :] > mids[:, None],
                               counts[None, :], 0), axis=1)
        ge = cj >= k
        lo2 = jnp.max(jnp.where(ge, mids, lo))
        hi2 = jnp.min(jnp.where(ge, hi, mids))
        return lo2, hi2

    lo0 = jnp.int32(-1)
    hi0 = jnp.int32(2**31 - 2)   # > any finite f32 bits; hi-lo fits int32
    _, hi = jax.lax.fori_loop(0, 13, body, (lo0, hi0))
    return hi, count_gt(hi)


def _strict_upper(w: int) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    return jnp.where(r < c, 1.0, 0.0)


def _row_prefix_excl(m2: jax.Array) -> jax.Array:
    """(R, W) f32 int-valued -> exclusive prefix along rows, via one
    HIGHEST-precision triangular matmul (exact for sums < 2^24).  XLA's
    cumsum lowering measured ~10x slower on TPU."""
    w = m2.shape[-1]
    return jax.lax.dot(m2, _strict_upper(w),
                       precision=jax.lax.Precision.HIGHEST)


def _prefix_excl(v: jax.Array) -> jax.Array:
    """Exclusive prefix sum of an int-valued f32 vector (hierarchical
    128-wide triangular matmuls; exact while the total stays < 2^24)."""
    m = v.shape[0]
    if m <= 128:
        pad = 128 - m
        v2 = jnp.pad(v, (0, pad))[None, :]
        return _row_prefix_excl(v2)[0, :m]
    rows = -(-m // 128)
    v2 = jnp.pad(v, (0, rows * 128 - m)).reshape(rows, 128)
    intra = _row_prefix_excl(v2)
    off = _prefix_excl(jnp.sum(v2, axis=1))
    return (intra + off[:, None]).reshape(-1)[:m]


def _keep_mask(av: jax.Array, tau_bits, n_above, k: int, length: int):
    """gt-or-first-ties mask with the golden (lower index first) order.

    Tie ranks = per-64-block exclusive prefix (one triangular matmul)
    plus a hierarchical cross-block offset prefix — no full-length
    cumsum (XLA's lowering measured ~140 us at n=2^20)."""
    npad = av.shape[-1]
    bits = jax.lax.bitcast_convert_type(av, jnp.int32)
    gt = bits > tau_bits
    eq = bits == tau_bits
    if length < npad:
        eq = jnp.logical_and(eq, jnp.arange(npad) < length)
    eqf = eq.astype(jnp.float32).reshape(-1, BLOCK)
    intra = _row_prefix_excl(eqf)                      # (nb, 64)
    blk_off = _prefix_excl(jnp.sum(eqf, axis=1))       # (nb,)
    rank = (blk_off[:, None] + intra).reshape(-1)
    fill = (jnp.int32(k) - n_above).astype(jnp.float32)
    return jnp.logical_or(gt, jnp.logical_and(eq, rank < fill))


def _abs_restored(x) -> jax.Array:
    av = jnp.abs(restore_vec(x).values)
    npad = av.shape[-1]
    if x.length < npad:
        av = jnp.where(jnp.arange(npad) < x.length, av, -1.0)
    return av


def threshold(x, k: int):
    """Return x with all but its K largest-magnitude elements zeroed.

    Selection = exact k-th-value bisection over a compressed candidate
    multiset: for 4-bit, per-block counts of the 7 code magnitudes
    (the only values a block can take); for 8/16/32-bit, per-chunk
    top-k candidates.  No full-length sort or top-k ever runs — measured
    ~7x faster than the two-stage lax.top_k at n=2^20 (TPU top_k is
    sort-based).  Tie-break matches the golden oracle: |value| desc,
    index asc."""
    k = int(k)
    if k >= x.length:
        return x

    if isinstance(x, QVec4):
        from ..kernels import pallas_enabled
        from ..kernels.threshold import (
            threshold4_pallas, threshold4_pallas_eligible)
        if pallas_enabled() and threshold4_pallas_eligible(x, k):
            return threshold4_pallas(x, k)
        # XLA path: candidate compression — value a*s_b/7 with
        # multiplicity counts[b, a], a in 1..7 (~n/9 candidates), then
        # the exact bisection.  No top_k / sort anywhere.
        av = _abs_restored(x)
        codes = unpack_nibbles(x.codes)
        ca = jnp.abs(codes).astype(jnp.int32).reshape(-1, BLOCK)
        counts = jnp.stack(
            [jnp.sum(ca == a, axis=1) for a in range(1, 8)], axis=1)
        cand = (jnp.arange(1, 8, dtype=jnp.float32)[None, :]
                * (x.scales[:, None] / 7.0)).reshape(-1)
        tau_bits, n_above = _tau_bisect(cand, counts.reshape(-1), k)
        mask = _keep_mask(av, tau_bits, n_above, k, x.length)
        codes = jnp.where(mask, codes.reshape(-1), jnp.int8(0))
        return QVec4(codes=pack_nibbles(codes), scales=x.scales,
                     length=x.length)

    if isinstance(x, QVec8):
        from ..kernels import pallas_enabled
        from ..kernels.threshold import (
            threshold8_pallas, threshold8_pallas_eligible)
        if pallas_enabled() and threshold8_pallas_eligible(x, k):
            return threshold8_pallas(x, k)

    # 8/16/32-bit XLA path: two-stage chunked top_k + scatter (the
    # candidate space has no small compression; measured faster than
    # bisect+rank at these widths)
    vals = _abs_restored(x)
    keep_idx = _top_k_idx(vals, k)
    npad = vals.shape[-1]
    mask = jnp.zeros((npad,), jnp.bool_).at[keep_idx].set(True)
    if isinstance(x, QVec8):
        codes = jnp.where(mask, x.codes, jnp.int8(0))
        return QVec8(codes=codes, scales=x.scales, length=x.length)
    if isinstance(x, QVec16):
        return QVec16(values=jnp.where(mask, x.values, jnp.float16(0)),
                      length=x.length)
    return QVec32(values=jnp.where(mask, x.values, jnp.float32(0)),
                  length=x.length)
