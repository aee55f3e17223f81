"""Whole-iteration fused IHT/GD kernel: both solver legs in ONE launch.

The solver iteration (models/solvers.py, reference loop
test/accuracy/02_iht_accuracy.h:79-95) is

    t2 = Q(y + (-1) * Q(Phi  @ x))      # leg A (fused MVM+AXPY)
    x' = Q(x +  mu  * Q(PhiT @ t2))     # leg B (fused MVM+AXPY)

Round 3's corrected floor probes (doc/results/iht_small_r3.md) showed
the small-problem regime is NOT launch-latency-bound (launch = 0.6 us,
small-tile stream = 740-780 GB/s): each leg pays a per-launch pipeline
ramp (the first tile's DMA overlaps nothing) plus per-launch in-kernel
prep, and the two-launch iteration adds inter-launch scheduling on top.
This kernel runs the WHOLE iteration as one pallas grid of gA + gB row
tiles: phase A (steps 0..gA-1) streams Phi and writes the requantized
t2 codes/scales into VMEM scratch — never to HBM; phase B (steps
gA..gA+gB-1) streams PhiT against weights built from that scratch.  The
ramp happens once (PhiT's first tile prefetches DURING phase A) and
there is nothing between the legs for the scheduler to stall on.

Numerics are BIT-IDENTICAL to the two-launch fused path
(kernels/mvm.mvm_axpy_pallas twice): phase A writes exactly the bytes
the first launch would have written to HBM, phase B consumes them
exactly as the second launch would have, and the SR noise draws use the
same per-op seeds and per-tile offsets (tests/test_kernels.py).

Eligible when both legs are single-k-tile (TK == cols) with 8-aligned
band counts, i.e. 512 <= m_pad, n_pad <= 8192 — precisely the latency
regime; larger solves keep the two-launch path, which is stream-bound
there.  Reference analog: none (the reference's iteration is five
OpenMP fork-joins); this is the TPU-native answer to its small-N
advantage (performance.txt:561-590).

Round 4 adds the CHAINED kernel (iteration_chain_pallas): TWO whole
iterations per launch, each closed by an in-kernel phase-C hard
threshold (element-level fan-9 bisection + golden tie ranking over the
whole x — a single tile at these sizes), with the thresholded
codes/scales parked in VMEM scratch feeding the next iteration's
phase-A weights and leg-B u operand.  Bit-identical on-chip to the
unchained [iteration_pallas -> ct.threshold] x 2 sequence (det + SR);
clean-window iteration time at 2048x4096 ~30 -> ~12.5 us (the r3
legs-floor: 12.3 us).  models/solvers._solve dispatches to it for
untraced solves (doc/results/run_chain_bench_r4.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QVec4, QVec8
from .dispatch import pallas_interpret, seed_from
from .mvm import (HALF, QMAX, _band_sr, _block_diag, _block_diag_i4, _mode,
                  _pick_geometry, _unoise, _unpack_x4, _write_codes)

# "4x4i4": the round-5 int4-array variant of the 4x4 legs — ONE int4
# MXU matmul per tile (kernels/mvm.py _kernel_4x4_i4), engaged when the
# solver passes prepared mat4_i4_stream views of Phi/PhiT.  The scale
# constant is the packed kernel's /16-free form; outputs bit-identical
# (power-of-two constant shift, same int32 dots).
_SCALE_CONST = {"4x4": 1.0 / (7.0 * 7.0 * 16.0),
                "4x4i4": 1.0 / (7.0 * 7.0),
                "4x8": 1.0 / (7.0 * 127.0),
                "8x8": 1.0 / (127.0 * 127.0)}

# single-weight-cache modes (one matmul per tile, no colsum)
_ONE_W = ("8x8", "4x4i4")


def _build_weights(mode: str, codes, nb: int, whi, wlo_or_mix, cs):
    """Fill a phase's weight caches from its vector codes (the same
    constructions as the per-mode MVM kernels, kernels/mvm.py)."""
    if mode == "4x4":
        xhi, xlo = _unpack_x4(codes)
        whi[:] = _block_diag(xhi, nb, HALF)
        wlo_or_mix[:] = _block_diag(16 * xlo - xhi, nb, HALF)
        cs[:] = jnp.sum(xlo, axis=1, keepdims=True).astype(jnp.float32).T
    elif mode == "4x4i4":
        xhi, xlo = _unpack_x4(codes)
        ecodes = jnp.concatenate([xlo, xhi], axis=1)    # element order
        whi[:] = _block_diag_i4(ecodes, nb, BLOCK)
    elif mode == "4x8":
        xlo = codes[:, :HALF]
        xhi = codes[:, HALF:]
        whi[:] = _block_diag(xhi, nb, HALF)
        wlo_or_mix[:] = _block_diag(xlo, nb, HALF)
        cs[:] = jnp.sum(xlo.astype(jnp.int32), axis=1,
                        keepdims=True).astype(jnp.float32).T
    else:
        whi[:] = _block_diag(codes, nb, BLOCK)


def _compute_t(mode: str, p, whi, wlo_or_mix, cs):
    """Exact blocked integer dot tile -> f32[tm, nb] (pre-scale-combine;
    same expressions as kernels/mvm.py so outputs match bit-for-bit)."""
    dn = (((1,), (0,)), ((), ()))
    if mode == "4x4i4":
        mm = jax.lax.dot_general(p, whi[:], dn,
                                 preferred_element_type=jnp.int32)
        return mm.astype(jnp.float32)
    if mode == "4x4":
        lou = jnp.bitwise_and(p, jnp.int8(0x0F))
        mm1 = jax.lax.dot_general(p, whi[:], dn,
                                  preferred_element_type=jnp.int32)
        mm2 = jax.lax.dot_general(lou, wlo_or_mix[:], dn,
                                  preferred_element_type=jnp.int32)
        return (mm1 + mm2).astype(jnp.float32) - 128.0 * cs[:]
    if mode == "4x8":
        hi16 = jnp.bitwise_and(p, jnp.int8(-16))
        lou = jnp.bitwise_and(p, jnp.int8(0x0F))
        mm_h = jax.lax.dot_general(hi16, whi[:], dn,
                                   preferred_element_type=jnp.int32)
        mm_l = jax.lax.dot_general(lou, wlo_or_mix[:], dn,
                                   preferred_element_type=jnp.int32)
        hh = jax.lax.shift_right_arithmetic(mm_h, 4)
        return (hh + mm_l).astype(jnp.float32) - 8.0 * cs[:]
    mm = jax.lax.dot_general(p, whi[:], dn,
                             preferred_element_type=jnp.int32)
    return mm.astype(jnp.float32)


def _decode_arr(p, out_bits: int):
    """Packed u codes (bands, pck) -> f32 code values (bands, 64) (same
    expressions as _requant_axpy_write)."""
    if out_bits == 4:
        lo = jnp.bitwise_and(p, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
        hi = jnp.bitwise_and(p, jnp.int8(-16)).astype(jnp.float32) / 16.0
        return jnp.concatenate([lo, hi], axis=1)
    return p.astype(jnp.float32)


def _decode_u(uc_ref, out_bits: int):
    """u operand codes -> f32 code values (same as _requant_axpy_write)."""
    return _decode_arr(uc_ref[0], out_bits)


def _leg(mode, out_bits, p, whi, wmix, cs, asc, xs, u_codes, us,
         acc_ref, alpha, seed_mvm, seed_axpy, noise, bands):
    """One fused MVM+AXPY row tile: Q(u + alpha * Q((M v)_tile)).

    ``u_codes``/``us`` are the u operand's f32 code values (bands, 64)
    and scales (bands, 1) — from HBM refs or (in the chained kernel)
    from the previous iteration's VMEM scratch.

    Returns (q2, s2): integer-valued f32 codes (bands, 64) + scales
    (bands, 1) — the caller writes them to HBM (phase B) or to the t2
    scratch (phase A).

    ``acc_ref`` is a (bands, 64, nb) VMEM scratch.  The scaled tile is
    MATERIALIZED there before the band sum, exactly like the two-launch
    kernel's k-accumulator (kernels/mvm.py): fusing the multiply into
    the reduction contracts differently and moves y2 by ~1 ulp — which a
    floor() boundary in the requant amplifies to a full quantization
    step in t2 (measured: 10/32 t2 scales off by up to 15% at
    2048x1024).  The materialization pins the fp result to the
    two-launch path's bit-for-bit."""
    qm = QMAX[out_bits]
    t = _compute_t(mode, p, whi, wmix, cs)
    combe = jnp.repeat(asc * xs * _SCALE_CONST[mode], BLOCK, axis=0)
    acc_ref[:] = (t * combe).reshape(bands, BLOCK, -1)
    y2 = jnp.sum(acc_ref[:], axis=2)
    q1, s1 = _band_sr(y2, qm, _unoise(seed_mvm, y2.shape, noise[0]))
    # same expression shape as _requant_axpy_write / _axpy_kernel so the
    # compiler contracts the dequant-fma identically everywhere
    xv = u_codes * (us / qm) + alpha * (q1 * (s1 / qm))
    return _band_sr(xv, qm, _unoise(seed_axpy, xv.shape, noise[1]))


def _iter_kernel(seed_ref, mu_ref, aA_ref, xcA_ref, ascA_ref, xscA_ref,
                 ucA_ref, usA_ref, aB_ref, ascB_ref, ucB_ref, usB_ref,
                 oc_ref, os_ref, *scratch,
                 mode, gA, nbA, nbB, bandsA, bandsB, out_bits, noise):
    if mode in _ONE_W:
        wAhi, wBhi, accA, accB, t2c, t2s = scratch
        wAmix = wBmix = csA = csB = None
    else:
        wAhi, wAmix, csA, wBhi, wBmix, csB, accA, accB, t2c, t2s = scratch
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _build_weights(mode, xcA_ref[:], nbA, wAhi, wAmix, csA)

    @pl.when(i < gA)
    def _():
        q2, s2 = _leg(mode, out_bits, aA_ref[:], wAhi, wAmix, csA,
                      ascA_ref[:], xscA_ref[:],
                      _decode_u(ucA_ref, out_bits), usA_ref[0], accA,
                      jnp.float32(-1.0), seed_ref[0] + i, seed_ref[1] + i,
                      noise[:2], bandsA)
        if out_bits == 4:
            packed = (16.0 * q2[:, HALF:] + (q2[:, :HALF] + 8.0)
                      ).astype(jnp.int8)
        else:
            packed = q2.astype(jnp.int8)
        t2c[pl.ds(i * bandsA, bandsA)] = packed
        t2s[pl.ds(i * bandsA, bandsA)] = s2

    @pl.when(i == gA)
    def _():
        _build_weights(mode, t2c[:], nbB, wBhi, wBmix, csB)

    @pl.when(i >= gA)
    def _():
        j = i - gA
        q2, s2 = _leg(mode, out_bits, aB_ref[:], wBhi, wBmix, csB,
                      ascB_ref[:], t2s[:].T,
                      _decode_u(ucB_ref, out_bits), usB_ref[0], accB,
                      mu_ref[0], seed_ref[2] + j, seed_ref[3] + j,
                      noise[2:], bandsB)
        _write_codes(oc_ref, q2, out_bits)
        os_ref[0] = s2


def _geom(mode: str, m_pad: int, n_pad: int):
    """Both legs' (tm, tk) if each is single-k-tile + flat-scales, else
    None.  Leg A: (m_pad, n_pad); leg B: the transposed matrix.

    Bands per row tile must be a multiple of 8: the t2/x scratch stores
    at dynamic offsets ``i * bands`` need sublane-tile-aligned strides
    (Mosaic: "cannot statically prove that index in dimension 0 is a
    multiple of 4" for the int8 stash at bands=2 — found by the r4 TPU
    -v run at 128x128).  Sub-512-row matrices fall back to the
    two-launch path, where the fusion gains nothing anyway."""
    out = []
    for (mp, np_) in ((m_pad, n_pad), (n_pad, m_pad)):
        g = _pick_geometry(mp, np_, mode)
        if g is None or g[1] != np_:
            return None
        tm = g[0]
        if (tm // BLOCK) % 8:
            return None            # flat-scales + aligned stash strides
        out.append(g)
    return tuple(out)


@lru_cache(maxsize=32)
def _build_iter_call(mode: str, m_pad: int, n_pad: int, out_bits: int,
                     noise, interpret: bool):
    (tmA, tkA), (tmB, tkB) = _geom(mode, m_pad, n_pad)
    gA, gB = m_pad // tmA, n_pad // tmB
    nbA, nbB = tkA // BLOCK, tkB // BLOCK
    bandsA, bandsB = tmA // BLOCK, tmB // BLOCK
    packed_mat = mode in ("4x4", "4x8")        # int8 bytes; i4 = elements
    kaA = tkA // 2 if packed_mat else tkA
    kaB = tkB // 2 if packed_mat else tkB
    wx = HALF if mode in ("4x4", "4x4i4") else BLOCK   # x codes tile width
    pck = HALF if out_bits == 4 else BLOCK     # codes per 64-out block

    def ia(i, *_):                             # leg-A row tile, clamped
        return (jnp.minimum(i, gA - 1), 0)

    def ib(i, *_):                             # leg-B row tile, clamped
        return (jnp.clip(i - gA, 0, gB - 1), 0)

    def ia3(i, *_):
        return (jnp.minimum(i, gA - 1), 0, 0)

    def ib3(i, *_):
        return (jnp.clip(i - gA, 0, gB - 1), 0, 0)

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((tmA, kaA), ia, memory_space=vm),            # Phi
        pl.BlockSpec((nbA, wx), lambda i, *_: (0, 0),
                     memory_space=vm),                            # x codes
        pl.BlockSpec((bandsA, nbA), ia, memory_space=vm),         # Phi sc
        pl.BlockSpec((1, nbA), lambda i, *_: (0, 0),
                     memory_space=vm),                            # x sc
        pl.BlockSpec((1, bandsA, pck), ia3, memory_space=vm),     # y codes
        pl.BlockSpec((1, bandsA, 1), ia3, memory_space=vm),       # y sc
        pl.BlockSpec((tmB, kaB), ib, memory_space=vm),            # PhiT
        pl.BlockSpec((bandsB, nbB), ib, memory_space=vm),         # PhiT sc
        pl.BlockSpec((1, bandsB, pck), ib3, memory_space=vm),     # x codes(u)
        pl.BlockSpec((1, bandsB, 1), ib3, memory_space=vm),       # x sc (u)
    ]
    out_specs = [
        pl.BlockSpec((1, bandsB, pck), ib3, memory_space=vm),
        pl.BlockSpec((1, bandsB, 1), ib3, memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((gB, bandsB, pck), jnp.int8),
        jax.ShapeDtypeStruct((gB, bandsB, 1), jnp.float32),
    ]

    t2c = pltpu.VMEM((nbB, pck), jnp.int8)
    t2s = pltpu.VMEM((nbB, 1), jnp.float32)
    accA = pltpu.VMEM((bandsA, BLOCK, nbA), jnp.float32)
    accB = pltpu.VMEM((bandsB, BLOCK, nbB), jnp.float32)
    if mode == "4x4i4":
        scratch = [pltpu.VMEM((kaA, nbA), jnp.int4),
                   pltpu.VMEM((kaB, nbB), jnp.int4), accA, accB, t2c, t2s]
    elif mode == "8x8":
        scratch = [pltpu.VMEM((kaA, nbA), jnp.int8),
                   pltpu.VMEM((kaB, nbB), jnp.int8), accA, accB, t2c, t2s]
    else:
        scratch = [pltpu.VMEM((kaA, nbA), jnp.int8),
                   pltpu.VMEM((kaA, nbA), jnp.int8),
                   pltpu.VMEM((1, nbA), jnp.float32),
                   pltpu.VMEM((kaB, nbB), jnp.int8),
                   pltpu.VMEM((kaB, nbB), jnp.int8),
                   pltpu.VMEM((1, nbB), jnp.float32), accA, accB, t2c, t2s]

    kernel = partial(_iter_kernel, mode=mode, gA=gA, nbA=nbA, nbB=nbB,
                     bandsA=bandsA, bandsB=bandsB, out_bits=out_bits,
                     noise=noise)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(gA + gB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # phase B reads phase A's scratch: the grid is sequential
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, (tmA, tkA), (tmB, tkB)


# ---------------------------------------------------------------------------
# Chained kernel: TWO whole iterations + in-kernel thresholds, one launch
# ---------------------------------------------------------------------------

def _rank_tie_keep(gt, eq, fill):
    """Keep mask in golden tie order (|value| desc, index asc) over a
    (R, 64) element array whose index order is row-major.  Always ranks
    (no fast-path split): when the tie count equals ``fill`` the rank
    rule keeps every tie — identical to the fast path — and the two
    small triangular matmuls are negligible at R <= 128."""
    R = gt.shape[0]
    eqf = eq.astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    U = jnp.where(r < c, 1.0, 0.0).astype(jnp.bfloat16)
    intra = jax.lax.dot(eqf.astype(jnp.bfloat16), U,
                        preferred_element_type=jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    L = jnp.where(cc < rr, 1.0, 0.0).astype(jnp.bfloat16)
    rowtot = jnp.sum(eqf, axis=1, keepdims=True)
    rowoff = jax.lax.dot(L, rowtot.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    rank = rowoff + intra
    return jnp.logical_or(gt, jnp.logical_and(eq, rank < fill))


def _chain_kernel(seed_ref, mu_ref, aA_ref, xcA_ref, ascA_ref, xscA_ref,
                  ucA_ref, usA_ref, aB_ref, ascB_ref, ucB_ref, usB_ref,
                  oc_ref, os_ref, *scratch,
                  mode, gA, gB, nbA, nbB, bandsA, bandsB, out_bits,
                  noise, thr_k, chain):
    """``chain`` solver iterations in ONE launch.  Each iteration is the
    A/B phase pair of _iter_kernel plus a phase C that hard-thresholds
    the new x IN-KERNEL (element-level bisection + golden tie ranking
    over the whole x — a single (n/64, 64) tile at the eligible sizes)
    and parks the thresholded codes/scales in VMEM scratch, from which
    the next iteration's phase A weights and leg-B u operand are built.
    x never touches HBM between iterations.

    Tie-bit note (ADVICE r4): phase C divides s/qm in-kernel, while the
    standalone threshold kernels consume an XLA-pre-divided s/qm.
    Measured on this chip (r5): Mosaic's f32 divide is bit-equal to
    XLA's, including the exact `abs(q) * (s / qm)` expression shape vs
    XLA-prediv + in-kernel multiply — so the tie bits are identical and
    chained/unchained solves agree unconditionally.  The -v validation
    mode asserts chain-vs-unchained solve parity on-chip
    (harness/validate.py solver_chain) to keep this pinned."""
    from .threshold import _bisect9
    if mode in _ONE_W:
        (wAhi, wBhi, accA, accB, t2c, t2s, xq, xs2, xpk, xscn) = scratch
        wAmix = wBmix = csA = csB = None
    else:
        (wAhi, wAmix, csA, wBhi, wBmix, csB, accA, accB, t2c, t2s,
         xq, xs2, xpk, xscn) = scratch
    L = gA + gB + 1
    i = pl.program_id(0)
    it = i // L
    ph = i - it * L
    qm = QMAX[out_bits]
    first = it == 0
    sbase = 4 * it

    def seed(j, off):
        return seed_ref[sbase + j] + off

    @pl.when(ph == 0)
    def _():
        cod = jnp.where(first, xcA_ref[:], xpk[:])
        _build_weights(mode, cod, nbA, wAhi, wAmix, csA)

    @pl.when(ph < gA)
    def _():
        xsel = jnp.where(first, xscA_ref[:], xscn[:])
        q2, s2 = _leg(mode, out_bits, aA_ref[:], wAhi, wAmix, csA,
                      ascA_ref[:], xsel,
                      _decode_u(ucA_ref, out_bits), usA_ref[0], accA,
                      jnp.float32(-1.0), seed(0, ph), seed(1, ph),
                      noise[:2], bandsA)
        if out_bits == 4:
            packed = (16.0 * q2[:, HALF:] + (q2[:, :HALF] + 8.0)
                      ).astype(jnp.int8)
        else:
            packed = q2.astype(jnp.int8)
        t2c[pl.ds(ph * bandsA, bandsA)] = packed
        t2s[pl.ds(ph * bandsA, bandsA)] = s2

    @pl.when(ph == gA)
    def _():
        _build_weights(mode, t2c[:], nbB, wBhi, wBmix, csB)

    @pl.when((ph >= gA) & (ph < gA + gB))
    def _():
        j = ph - gA
        u_hbm = _decode_u(ucB_ref, out_bits)
        u_scr = _decode_arr(xpk[pl.ds(j * bandsB, bandsB), :], out_bits)
        u_codes = jnp.where(first, u_hbm, u_scr)
        us = jnp.where(first, usB_ref[0],
                       xs2[pl.ds(j * bandsB, bandsB)])
        q2, s2 = _leg(mode, out_bits, aB_ref[:], wBhi, wBmix, csB,
                      ascB_ref[:], t2s[:].T, u_codes, us, accB,
                      mu_ref[0], seed(2, j), seed(3, j),
                      noise[2:], bandsB)
        xq[pl.ds(j * bandsB, bandsB)] = q2.astype(jnp.int8)
        xs2[pl.ds(j * bandsB, bandsB)] = s2

    @pl.when(ph == L - 1)
    def _():
        q = xq[:].astype(jnp.float32)                # (R, 64)
        s = xs2[:]                                   # (R, 1)
        if thr_k is not None:
            # element |values|: |code| * (s/qm) — sign-magnitude f32
            # makes this bit-identical to |restore|
            v = jnp.abs(q) * (s / qm)
            bits = jax.lax.bitcast_convert_type(v, jnp.int32)

            def count_gt(t):
                return jnp.sum(jnp.where(bits > t, 1, 0))

            tau = _bisect9(count_gt, thr_k, jnp.max(bits))
            gt = bits > tau
            eq = bits == tau
            fill = (jnp.float32(thr_k)
                    - count_gt(tau).astype(jnp.float32))
            keep = _rank_tie_keep(gt, eq, fill)
            q = jnp.where(keep, q, 0.0)
        if out_bits == 4:
            packed = (16.0 * q[:, HALF:] + (q[:, :HALF] + 8.0)
                      ).astype(jnp.int8)
        else:
            packed = q.astype(jnp.int8)
        xpk[:] = packed
        xscn[:] = s.T

        @pl.when(it == chain - 1)
        def _():
            oc_ref[...] = packed.reshape(oc_ref.shape)
            os_ref[...] = s.reshape(os_ref.shape)


@lru_cache(maxsize=32)
def _build_chain_call(mode: str, m_pad: int, n_pad: int, out_bits: int,
                      noise, thr_k, chain: int, interpret: bool):
    (tmA, tkA), (tmB, tkB) = _geom(mode, m_pad, n_pad)
    gA, gB = m_pad // tmA, n_pad // tmB
    nbA, nbB = tkA // BLOCK, tkB // BLOCK
    bandsA, bandsB = tmA // BLOCK, tmB // BLOCK
    packed_mat = mode in ("4x4", "4x8")        # int8 bytes; i4 = elements
    kaA = tkA // 2 if packed_mat else tkA
    kaB = tkB // 2 if packed_mat else tkB
    wx = HALF if mode in ("4x4", "4x4i4") else BLOCK
    pck = HALF if out_bits == 4 else BLOCK
    L = gA + gB + 1
    R = gB * bandsB                                  # = n_pad // 64

    def ia(i, *_):
        return (jnp.minimum(i % L, gA - 1), 0)

    def ib(i, *_):
        return (jnp.clip(i % L - gA, 0, gB - 1), 0)

    def ia3(i, *_):
        return (jnp.minimum(i % L, gA - 1), 0, 0)

    def ib3(i, *_):
        return (jnp.clip(i % L - gA, 0, gB - 1), 0, 0)

    def pin(i, *_):
        return (0, 0)

    def pin3(i, *_):
        return (0, 0, 0)

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((tmA, kaA), ia, memory_space=vm),            # Phi
        pl.BlockSpec((nbA, wx), pin, memory_space=vm),            # x codes
        pl.BlockSpec((bandsA, nbA), ia, memory_space=vm),         # Phi sc
        pl.BlockSpec((1, nbA), pin, memory_space=vm),             # x sc
        pl.BlockSpec((1, bandsA, pck), ia3, memory_space=vm),     # y codes
        pl.BlockSpec((1, bandsA, 1), ia3, memory_space=vm),       # y sc
        pl.BlockSpec((tmB, kaB), ib, memory_space=vm),            # PhiT
        pl.BlockSpec((bandsB, nbB), ib, memory_space=vm),         # PhiT sc
        pl.BlockSpec((1, bandsB, pck), ib3, memory_space=vm),     # x codes(u)
        pl.BlockSpec((1, bandsB, 1), ib3, memory_space=vm),       # x sc (u)
    ]
    out_specs = [
        pl.BlockSpec((gB, bandsB, pck), pin3, memory_space=vm),
        pl.BlockSpec((gB, bandsB, 1), pin3, memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((gB, bandsB, pck), jnp.int8),
        jax.ShapeDtypeStruct((gB, bandsB, 1), jnp.float32),
    ]
    if mode in _ONE_W:
        wdt = jnp.int4 if mode == "4x4i4" else jnp.int8
        scratch = [pltpu.VMEM((kaA, nbA), wdt),
                   pltpu.VMEM((kaB, nbB), wdt)]
    else:
        scratch = [pltpu.VMEM((kaA, nbA), jnp.int8),
                   pltpu.VMEM((kaA, nbA), jnp.int8),
                   pltpu.VMEM((1, nbA), jnp.float32),
                   pltpu.VMEM((kaB, nbB), jnp.int8),
                   pltpu.VMEM((kaB, nbB), jnp.int8),
                   pltpu.VMEM((1, nbB), jnp.float32)]
    scratch += [
               pltpu.VMEM((bandsA, BLOCK, nbA), jnp.float32),
               pltpu.VMEM((bandsB, BLOCK, nbB), jnp.float32),
               pltpu.VMEM((nbB, pck), jnp.int8),        # t2c
               pltpu.VMEM((nbB, 1), jnp.float32),       # t2s
               pltpu.VMEM((R, BLOCK), jnp.int8),        # xq
               pltpu.VMEM((R, 1), jnp.float32),         # xs2
               pltpu.VMEM((R, pck), jnp.int8),          # xpk
               pltpu.VMEM((1, R), jnp.float32)]         # xscn

    kernel = partial(_chain_kernel, mode=mode, gA=gA, gB=gB, nbA=nbA,
                     nbB=nbB, bandsA=bandsA, bandsB=bandsB,
                     out_bits=out_bits, noise=noise, thr_k=thr_k,
                     chain=chain)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chain * L,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, (tmA, tkA), (tmB, tkB)


def iteration_chain_pallas_eligible(Phi, PhiT, y, x, k) -> bool:
    """Chained launch eligibility: the single-iteration conditions plus
    an in-kernel-thresholdable x (whole vector in one tile)."""
    if not iteration_pallas_eligible(Phi, PhiT, y, x):
        return False
    if k is not None and not (0 < int(k) < Phi.cols):
        return False
    return Phi.cols_pad // BLOCK <= 128


def iteration_chain_pallas(Phi, PhiT, y, x, mu, k, seeds8, chain=2,
                           a_i4s=(None, None)):
    """``chain`` full IHT/GD iterations (threshold included when k is
    given) in ONE launch.  ``seeds8``: 4 per-op seeds per iteration
    (models/solvers._op_seeds per iteration), or Nones.  The per-leg
    requant numerics are bit-identical to the unchained
    iteration_pallas; the in-kernel threshold matches ops.threshold up
    to the phase-C tie-bit caveat (docstring).  ``a_i4s``: prepared
    int4 stream views of (Phi, PhiT) — 4x4 solves then run each leg as
    ONE int4 matmul per tile (bit-identical)."""
    mode = _mode(Phi, x)
    out_bits = 4 if mode == "4x4" else 8
    use_i4 = mode == "4x4" and a_i4s[0] is not None and a_i4s[1] is not None
    kmode = "4x4i4" if use_i4 else mode
    sn = [seed_from(kk) for kk in seeds8]
    seedv = jnp.concatenate([s for s, _ in sn])
    noise = tuple(n for _, n in sn)
    assert all(noise[4 * i:4 * i + 4] == noise[:4]
               for i in range(int(chain))), \
        "chained iterations must share SR mode"
    call, (tmA, tkA), (tmB, tkB) = _build_chain_call(
        kmode, Phi.rows_pad, Phi.cols_pad, out_bits, noise[:4],
        None if k is None else int(k), int(chain), pallas_interpret())
    nbA, nbB = tkA // BLOCK, tkB // BLOCK
    bandsA, bandsB = tmA // BLOCK, tmB // BLOCK
    gA, gB = Phi.rows_pad // tmA, Phi.cols_pad // tmB
    wx = HALF if mode == "4x4" else BLOCK
    pck = HALF if out_bits == 4 else BLOCK

    yc, ys = call(
        seedv, jnp.asarray([mu], jnp.float32),
        a_i4s[0] if use_i4 else Phi.codes, x.codes.reshape(nbA, wx),
        Phi.scales, x.scales.reshape(1, nbA),
        y.codes.reshape(gA, bandsA, pck), y.scales.reshape(gA, bandsA, 1),
        a_i4s[1] if use_i4 else PhiT.codes, PhiT.scales,
        x.codes.reshape(gB, bandsB, pck), x.scales.reshape(gB, bandsB, 1),
    )
    out_cls = QVec4 if out_bits == 4 else QVec8
    return out_cls(codes=yc.reshape(-1), scales=ys.reshape(-1),
                   length=Phi.cols)


def iteration_pallas_eligible(Phi, PhiT, y, x) -> bool:
    import os
    if os.environ.get("CLOVER_ITER_FUSED", "1") != "1":
        return False
    mode = _mode(Phi, x)
    if mode is None or _mode(PhiT, y) != mode:
        return False
    # 4-bit matrix streams only: that is the latency-exposed case the
    # fusion targets (run_iter_fused_bench_r3.py: 4x4/4x8 win up to
    # 1.37x and never lose beyond drift; 8x8 is already stream-bound at
    # its two-launch floor and measured 0.60x fused at 1024x2048 in the
    # cleanest window).
    if mode == "8x8":
        return False
    if not (isinstance(PhiT, type(Phi))
            and PhiT.rows_pad == Phi.cols_pad
            and PhiT.cols_pad == Phi.rows_pad):
        return False
    out_cls = QVec4 if mode == "4x4" else QVec8
    if not (isinstance(y, out_cls) and isinstance(x, out_cls)
            and y.length == Phi.rows and x.length == Phi.cols):
        return False
    return _geom(mode, Phi.rows_pad, Phi.cols_pad) is not None


def iteration_pallas(Phi, PhiT, y, x, mu, seeds=(None,) * 4,
                     a_i4s=(None, None)):
    """x' = Q(x + mu * Q(PhiT @ Q(y - Q(Phi @ x)))) in ONE launch.

    ``seeds``: the iteration's four per-op SR seeds (legA mvm/axpy,
    legB mvm/axpy — models/solvers._op_seeds); None entries run that
    requant deterministically.  Bit-identical to the two-launch
    mvm_axpy_pallas sequence for the same seeds.  ``a_i4s``: prepared
    int4 stream views of (Phi, PhiT) for the 4x4 single-matmul legs."""
    mode = _mode(Phi, x)
    out_bits = 4 if mode == "4x4" else 8
    use_i4 = mode == "4x4" and a_i4s[0] is not None and a_i4s[1] is not None
    kmode = "4x4i4" if use_i4 else mode
    sn = [seed_from(k) for k in seeds]
    seed4 = jnp.concatenate([s for s, _ in sn])
    noise = tuple(n for _, n in sn)
    call, (tmA, tkA), (tmB, tkB) = _build_iter_call(
        kmode, Phi.rows_pad, Phi.cols_pad, out_bits, noise,
        pallas_interpret())
    nbA, nbB = tkA // BLOCK, tkB // BLOCK
    bandsA, bandsB = tmA // BLOCK, tmB // BLOCK
    gA, gB = Phi.rows_pad // tmA, Phi.cols_pad // tmB
    wx = HALF if mode == "4x4" else BLOCK
    pck = HALF if out_bits == 4 else BLOCK

    yc, ys = call(
        seed4, jnp.asarray([mu], jnp.float32),
        a_i4s[0] if use_i4 else Phi.codes, x.codes.reshape(nbA, wx),
        Phi.scales, x.scales.reshape(1, nbA),
        y.codes.reshape(gA, bandsA, pck), y.scales.reshape(gA, bandsA, 1),
        a_i4s[1] if use_i4 else PhiT.codes, PhiT.scales,
        x.codes.reshape(gB, bandsB, pck), x.scales.reshape(gB, bandsB, 1),
    )
    out_cls = QVec4 if out_bits == 4 else QVec8
    return out_cls(codes=yc.reshape(-1), scales=ys.reshape(-1),
                   length=Phi.cols)
