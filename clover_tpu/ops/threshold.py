"""Hard thresholding: keep the top-K elements by |value|, zero the rest.

Reference: CloverVector4.h:1913-2060 (min-heap streaming), ditto for 8/16/32.
Block scales are NOT updated (reference behavior: only ``setBits(i, 0)`` is
called; the scale array is untouched).  Ties break toward the lower index —
the reference's heap is order-dependent on ties, so we fix a deterministic
rule (its validation compares restored top-K sets at 10% tolerance,
test/validate/02_vector.cpp:449-554, which this satisfies).

TPU-native design: sort-free exact k-th-value bisection over the
non-negative-float bit ordering (TPU sorts cost ~1 ms at 10^5 elements).
4-bit compresses the candidate multiset to per-(block, magnitude) counts
built by indicator matmuls on the MXU; 8/16/32-bit bisect the elements
directly.  Ties take a rank-free ``lax.cond`` fast path when they fit
the remaining slots exactly (the generic case).  The distributed version
(per-shard top-k + gathered merge) lives in clover_tpu.parallel — the
same two-phase algorithm as the reference's parallel heap merge
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

    Used by the sharded threshold merge (clover_tpu.parallel.ops), which
    needs shard-local INDICES to gather candidates across the mesh.  For
    large vectors a two-stage select (per-2048-chunk top-k, then top-k
    over the C*k candidates) replaces the full-length sort — the global
    top-k is always a subset of the per-chunk top-k's, and
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


# Bisection fan-out (pivots per level + 1).  Sequential DEPTH is what
# matters — each level's count pass is throughput-cheap but its
# cross-lane reduce is ~us latency — so a wider fan with fewer levels
# should win as long as the wider compare stays throughput-cheap.
# Module-level so the ablation harness can sweep it
# (doc/results/run_threshold_ablation_r3.py); _bisect_levels derives the
# guaranteed-exact depth for any fan.
BISECT_FAN = 9


def _bisect_levels(fan: int) -> int:
    """Levels guaranteeing exact resolution over the int32 bit range:
    each level leaves width <= floor(w/fan) + fan (remainder slack), so
    after ceil(log_fan(2^32)) levels the bracket is <= ~fan+1 wide; one
    step==1 level then covers fan-1 consecutive integers and one more
    resolves the remainder.  fan=9 -> 12 (the round-2 constant, verified
    by tests/test_ops.py::test_threshold_adjacent_bit_ties), fan=81 -> 7."""
    import math
    return math.ceil(math.log(2.0 ** 32) / math.log(fan)) + 2


def _tau_bisect(cand: jax.Array, counts: jax.Array, k: int,
                fan: int | None = None):
    """(tau_bits, n_above, n_eq): the bit pattern of the k-th largest
    element of the weighted candidate multiset (cand >= 0, f32), the
    count strictly above it, and the tie multiplicity at it.

    fan-way bisection on the non-negative-float bit ordering — TPU sorts
    cost ~1 ms at 10^5 elements.  Each level evaluates fan-1 pivots at
    once (broadcast compare, independent reduces); depth per
    _bisect_levels.  If the multiset has fewer than k entries the result
    degenerates to tau_bits = 0 / keep-everything, which is correct for
    thresholding (only zero codes are added to the kept set).
    cand/counts may be any (equal) shape; they are reduced over all
    axes."""
    fan = BISECT_FAN if fan is None else fan
    bits = jax.lax.bitcast_convert_type(cand, jnp.int32)
    counts = counts.astype(jnp.int32)
    # materialize BEFORE the loop: without the barrier XLA fuses the
    # candidate/count computation into the while body and recomputes it
    # on every bisection step (measured 30x slowdown)
    bits, counts = jax.lax.optimization_barrier((bits, counts))
    axes = tuple(range(1, bits.ndim + 1))
    jf = jnp.arange(1, fan, dtype=jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        # evenly-stepped pivots in (lo, hi]; step*jf cannot overflow
        # (step <= (hi-lo)/fan) and max(step,1) guarantees progress at
        # small widths, where the clamp to hi keeps pivots in range
        step = jnp.maximum((hi - lo) // fan, 1)
        mids = jnp.minimum(lo + step * jf, hi)           # (fan-1,)
        m8 = mids.reshape((fan - 1,) + (1,) * bits.ndim)
        cj = jnp.sum(jnp.where(bits[None] > m8, counts[None], 0),
                     axis=axes)
        ge = cj >= k
        lo2 = jnp.max(jnp.where(ge, mids, lo))
        hi2 = jnp.min(jnp.where(ge, hi, mids))
        return lo2, hi2

    lo0 = jnp.int32(-1)
    hi0 = jnp.max(bits)          # k >= 1 => k-th largest <= multiset max
    _, tau = jax.lax.fori_loop(0, _bisect_levels(fan), body, (lo0, hi0))
    n_above = jnp.sum(jnp.where(bits > tau, counts, 0))
    n_eq = jnp.sum(jnp.where(bits == tau, counts, 0))
    return tau, n_above, n_eq


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


def _rank_tie_mask(gt, eq, fill):
    """gt-or-first-ties mask in golden order (|value| desc, index asc):
    tie ranks come from a per-64-block exclusive prefix (one triangular
    matmul) plus hierarchical cross-block offsets — no full-length
    cumsum (XLA's lowering measured ~140 us at n=2^20).  Shared by the
    4-bit wide-view and 8/16/32 dense slow paths."""
    eqf = eq.astype(jnp.float32).reshape(-1, BLOCK)
    intra = _row_prefix_excl(eqf)                      # (nb, 64)
    blk_off = _prefix_excl(jnp.sum(eqf, axis=1))       # (nb,)
    rank = (blk_off[:, None] + intra).reshape(eq.shape)
    return jnp.logical_or(
        gt, jnp.logical_and(eq, rank < fill.astype(jnp.float32)))


# Use the block-max top_k hierarchy (instead of bisection) to find tau
# when k is at most this (gather + final top_k grow with k; measured
# crossover doc/results/threshold4_r4.md).
TAU_HIER_MAX_K = 1024


def _tau_blockmax(vals_b: jax.Array, k: int):
    """Exact k-th largest |value| via a two-level block-max hierarchy —
    no bisection, no full-length sort.

    ``vals_b`` is the (nb, B) per-block view of the non-negative element
    values.  Selection: top-k BLOCKS by per-block max, gather only those
    k blocks, and take the k-th largest of the gathered k*B values.

    Exactness: every element > tau lies in a block whose max is > tau,
    and there are fewer than k such elements, hence fewer than k such
    blocks — all inside the top-k-by-max set.  If ties at tau push the
    block count past k, then *every* block with max >= tau still fits
    inside the top-k (their total is < k + #tau-blocks and the strict
    ones number < k), so the gathered multiset contains at least
    (k - n_above) tau-valued elements and its k-th largest equals tau
    exactly.  lax.top_k's stable ordering keeps the choice
    deterministic.

    Replaces the fan-9 bisection for small k at large n: the bisection's
    ~12 sequential count-reduce levels cost ~4-5 us each regardless of
    fan (measured flat across fan 5/9/17 at n=2^20), while this path is
    two small top_ks and one k-row gather.
    """
    nb = vals_b.shape[0]
    M = jnp.max(vals_b, axis=1)                        # (nb,) block maxes
    ti = _top_k_idx(M, k)                              # k block indices
    gv = vals_b[ti]                                    # (k, B) gather
    topv, _ = jax.lax.top_k(gv.reshape(-1), k)
    return jax.lax.bitcast_convert_type(topv[k - 1], jnp.int32)


def _wide_cols(npad: int) -> int:
    """Element columns of the wide 2-D view (whole 64-blocks per row;
    npad is always a multiple of 128 so 128 always divides)."""
    for w in (1024, 512, 256, 128):
        if npad % w == 0:
            return w
    raise AssertionError(f"npad={npad} not a multiple of 128")


def _threshold4_xla(x, k: int):
    """4-bit XLA threshold: wide-view tau selection + mask.

    tau (the k-th largest |value| bit pattern) comes from one of two
    exact selectors:

    * k <= TAU_HIER_MAX_K: the block-max top_k hierarchy
      (_tau_blockmax) over the element values directly — two small
      top_ks + a k-row gather; no candidate build, no bisection levels.
      r4 addition: the bisection's ~12 sequential count-reduce levels
      are a ~50-60 us latency floor at any large n (fan sweep measured
      flat), which kept n=2^20 at ~15 GB/s.
    * larger k: the r2 candidate-multiset bisection — per-(block,
      magnitude) counts from seven indicator bf16 matmuls on the MXU
      (counts <= 64, exact), then fan-9 bisection.

    The mask stage is shared; ties take a rank-free fast path via
    ``lax.cond`` whenever the tie count exactly fits the remaining
    slots — the generic case."""
    npad = x.length_pad
    w = _wide_cols(npad)
    rows, gpr = npad // w, w // BLOCK
    nb = npad // BLOCK
    codes = unpack_nibbles(x.codes)
    ca = jnp.abs(codes).astype(jnp.float32).reshape(rows, w)
    m7 = (x.scales / 7.0).reshape(rows, gpr)   # same divide as restore

    # element |values| in the wide view: ca * (s/7) is bit-identical to
    # |restore| (sign-magnitude f32: |a*b| == |a|*|b| bitwise), and the
    # a == |code| multiset candidate below is the SAME f32 product
    me = jnp.repeat(m7, BLOCK, axis=1)
    ev = ca * me
    ebits = jax.lax.bitcast_convert_type(ev, jnp.int32)

    hier = k <= TAU_HIER_MAX_K and k <= nb
    if hier:
        tau = _tau_blockmax(ev.reshape(nb, BLOCK), k)
    else:
        r = jax.lax.broadcasted_iota(jnp.int32, (w, gpr), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (w, gpr), 1)
        G = jnp.where(r // BLOCK == c, 1.0, 0.0).astype(jnp.bfloat16)
        cnts, cands = [], []
        for a in range(1, 8):
            e = (ca == a).astype(jnp.bfloat16)
            cnts.append(jax.lax.dot(e, G,
                                    preferred_element_type=jnp.float32))
            cands.append(jnp.float32(a) * m7)
        counts = jnp.concatenate(cnts, axis=1)         # (rows, 7*gpr)
        cand = jnp.concatenate(cands, axis=1)
        tau, n_above, n_eq = _tau_bisect(cand, counts, k)

    gt = ebits > tau
    eq = ebits == tau
    if x.length < npad:
        eq = jnp.logical_and(
            eq, (jnp.arange(npad) < x.length).reshape(rows, w))
    if hier:
        # element-level counts (padding: ev == 0 is never > tau >= 0,
        # and eq was just masked) — the tie fast path is then valid even
        # at tau == 0, zero-valued ties being real elements here
        n_above = jnp.sum(gt.astype(jnp.int32))
        n_eq = jnp.sum(eq.astype(jnp.int32))
        fastp = n_eq == k - n_above
    else:
        # n_eq counts MULTISET ties; it equals the element-level tie
        # count whenever tau > 0 (zero codes are not in the multiset).
        # tau == 0 (fewer than k nonzeros) must rank zeros by index.
        fastp = jnp.logical_and(n_eq == k - n_above, tau > 0)
    fill = k - n_above

    def fast(_):
        return jnp.logical_or(gt, eq)

    def slow(_):
        return _rank_tie_mask(gt, eq, fill)

    mask = jax.lax.cond(fastp, fast, slow, None)
    kept = jnp.where(mask.reshape(-1), codes, jnp.int8(0))
    return QVec4(codes=pack_nibbles(kept), scales=x.scales,
                 length=x.length)


def _abs_restored(x) -> jax.Array:
    av = jnp.abs(restore_vec(x).values)
    npad = av.shape[-1]
    if x.length < npad:
        av = jnp.where(jnp.arange(npad) < x.length, av, -1.0)
    return av


def _dense_keep_mask(av: jax.Array, k: int) -> jax.Array:
    """Top-k keep mask over a padded |values| vector (padding = -1.0).

    Same exact-bisection structure as the 4-bit path but with the
    elements THEMSELVES as the weight-1 candidate multiset (no small
    compression exists at >= 8 bits).  Padding sentinels (-1.0) have
    negative bit patterns, below every pivot (pivots are >= 0), so they
    are never counted, never gt, and never tie.  The rank-free tie fast
    path is valid even at tau == 0 here: zero-valued ties ARE candidates
    (unlike the 4-bit multiset), so n_eq is the true tie count.
    Measured (v5e, n=2^21, 8-bit): 275 us vs 531 us for the two-stage
    chunked lax.top_k this replaces at large n."""
    npad = av.shape[-1]
    w = _wide_cols(npad)
    ev = av.reshape(npad // w, w)
    nb = npad // BLOCK
    if k <= TAU_HIER_MAX_K and k <= nb:
        # block-max top_k hierarchy (see _tau_blockmax): padding
        # sentinels (-1.0) sort below every real value in the float
        # top_ks and are never selected while >= k real elements exist
        tau = _tau_blockmax(av.reshape(nb, BLOCK), k)
        ebits = jax.lax.bitcast_convert_type(ev, jnp.int32)
        n_above = jnp.sum((ebits > tau).astype(jnp.int32))
        n_eq = jnp.sum((ebits == tau).astype(jnp.int32))
    else:
        tau, n_above, n_eq = _tau_bisect(ev, jnp.ones_like(ev, jnp.int32),
                                         k)
        ebits = jax.lax.bitcast_convert_type(ev, jnp.int32)
    gt = ebits > tau
    eq = ebits == tau
    fill = k - n_above

    def fast(_):
        return jnp.logical_or(gt, eq)

    def slow(_):
        return _rank_tie_mask(gt, eq, fill)

    return jax.lax.cond(n_eq == fill, fast, slow, None).reshape(-1)


def threshold(x, k: int):
    """Return x with all but its K largest-magnitude elements zeroed.

    Selection = exact k-th-value bisection: for 4-bit over a compressed
    candidate multiset (per-block counts of the 7 code magnitudes — the
    only values a block can take); for 8/16/32-bit over the elements
    themselves.  No full-length sort or top-k ever runs (TPU top_k is
    sort-based; measured 1.6-3.2x slower than the dense bisect at every
    size).  Tie-break matches the golden oracle: |value| desc, index
    asc."""
    k = int(k)
    if k >= x.length:
        return x

    if isinstance(x, QVec4):
        # candidate compression — value a*s_b/7 with multiplicity
        # counts[b, a], a in 1..7 (~n/9 candidates), then the exact
        # bisection.  No top_k / sort anywhere.  Below 2^18 the fused
        # Pallas kernel wins (13 vs 26 us at 2^16, interleaved A/B on
        # v5e); above, its quarter-width candidate arrays lose to this
        # wide-view XLA path (29 vs 57 us at 2^18).
        from ..kernels import pallas_enabled
        from ..kernels.threshold import (
            threshold4_pallas, threshold4_pallas_eligible)
        if pallas_enabled() and threshold4_pallas_eligible(x, k):
            return threshold4_pallas(x, k)
        return _threshold4_xla(x, k)

    if isinstance(x, QVec8):
        from ..kernels import pallas_enabled
        from ..kernels.threshold import (
            threshold8_pallas, threshold8_pallas_eligible)
        if pallas_enabled() and threshold8_pallas_eligible(x, k):
            return threshold8_pallas(x, k)

    # 8-bit past the kernel cap, and all 16/32-bit: exact dense
    # bisection (no sort; see _dense_keep_mask).  Beats the r1 two-stage
    # chunked lax.top_k at every size (32-bit: 11 vs 37 us at n=2^16,
    # 303 vs 552 us at 2^21 on v5e), so that path was removed.
    mask = _dense_keep_mask(_abs_restored(x), k)
    if isinstance(x, QVec8):
        codes = jnp.where(mask, x.codes, jnp.int8(0))
        return QVec8(codes=codes, scales=x.scales, length=x.length)
    if isinstance(x, QVec16):
        return QVec16(values=jnp.where(mask, x.values, jnp.float16(0)),
                      length=x.length)
    return QVec32(values=jnp.where(mask, x.values, jnp.float32(0)),
                  length=x.length)
