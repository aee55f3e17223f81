"""Pallas quantize / AXPY kernels (streaming, SR from the on-core PRNG).

Reference counterparts: vector quantize (CloverVector4.h:605-805,
CloverVector8.h:393-606), matrix quantize (CloverMatrix4.h:512-777,
CloverMatrix8.h:203-265), and the fused dequant-FMA-requant scaleAndAdd
(CloverVector4.h:1196-1517, CloverVector8.h:1089-1386).

The XLA paths in ops/ are semantically identical but draw SR noise from
threefry (many ops/element); these kernels use ``pltpu.prng_random_bits``
(hardware PRNG) and fuse absmax/SR/packing into one pass over the data.
Measured v5e (SR on, honest protocol): quantize ~400-450 GB/s (~50% of
the HBM spec — VPU-compute-bound, not bandwidth-bound), AXPY ~130 GB/s
4-bit / ~200 GB/s 8-bit (1.36x / 1.12x over the fp32 ring baseline on
time).  The floor is the f32 dequant/requant VPU op count, not
bandwidth: a byte-passthrough kernel through the same tiles measures
~720 GB/s, the dequant phase alone (scalar scales) ~280 GB/s, and the
exact per-block absmax is the largest irreducible requant cost — the
full strategy space (slice reduces, roll trees, segmented broadcasts,
reduce_window, strided slices) is measured or shown unsupported in
doc/results/axpy_ablation_r4.md.

Layout convention: quantize processes a padded vector as a 2-D
(n/512, 512) view — EIGHT blocks per row so tiles span all 128 lanes (a
(n/64, 64) layout runs the VPU at half width and was measured ~4x
slower); AXPY widens further to up to 64 blocks/row (_axpy_grp).  All
arithmetic (dequant, FMA, SR) runs WHOLE-TILE: per-block scales are
expanded to full lane width by exact chained selects (`_expand_scales`)
and, for 4-bit, the packed hi/lo nibble planes are processed as two
full-width f32 arrays (no int32 widening, no lane concats — measured
~4x over per-block 64-lane slicing).  Only per-block absmax and the
4-bit nibble pack touch 64-lane slices.  Scale I/O uses lane-major
layouts ((blocks,1)-shaped streams degrade the DMA ~100x).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QMat4, QMat8, QVec4, QVec8
from .dispatch import pallas_interpret, seed_from

HALF = BLOCK // 2
QMAX = {4: 7, 8: 127}


def _noise_u(shape, seed_ref, salt, noise: bool):
    if not noise:
        return 0.0
    pltpu.prng_seed(seed_ref[0] + salt)
    bits = pltpu.prng_random_bits(shape)
    return (jnp.bitwise_and(bits, 0x00FFFFFF).astype(jnp.float32)
            * (1.0 / (1 << 24)))


def _sr(x, mult, qm: int, u):
    """f32 -> INTEGER-VALUED f32 code in [-qm, qm] (SR floor on |x|).

    Stays in f32 end-to-end: floor yields an exact integer f32, the min
    clamp and sign reapplication are one pass each, and the packing
    below consumes integer f32 directly — the old int32 round trip
    (astype int32, bitwise pack, astype int8) cost ~5 extra full-tile
    passes per plane.  The clamp DOES bind in the worst case: for the
    absmax element |x|*mult can round to qm*(1+2^-23) and u can reach
    1 - 2^-24, putting the sum just past qm+1."""
    qab = jnp.minimum(jnp.floor(jnp.abs(x) * mult + u), jnp.float32(qm))
    return jnp.where(x < 0.0, -qab, qab)


def _pack_cols(q):
    """Integer-valued f32[..., 64] codes -> packed int8[..., 32].

    byte = 16*hi + (lo+8) lands in [-127, 127] for hi in [-8,7] and
    lo in [-7,7], so the packed int8 is ONE f32 FMA + ONE f32->int8
    convert — no two's-complement masking, no shifts (Mosaic has no
    int8 shifts anyway; the old form masked/shifted in int32)."""
    return (16.0 * q[..., HALF:] + (q[..., :HALF] + 8.0)).astype(jnp.int8)


def _expand_scales(s, w: int):
    """Exact lane expansion (RT, nbpr) -> (RT, nbpr*w): lane l gets
    s[:, l // w].  Strategy by group width (both measured r4,
    doc/results/axpy_ablation_r4.md):

    * w >= 64 (8-bit AXPY, vec/mat quantize): concat of per-block
      lane-broadcasts — every output lane is a bit-exact COPY written
      once, ~one full-width VPU data pass independent of nbpr.  Replaced
      the r2/r3 HIGHEST indicator matmul whose MXU work grows with nbpr
      (at the AXPY's nbpr=64 the three expansions cost more than the
      rest of the kernel): 8-bit AXPY 130 -> ~200 GB/s, bit-identical.
    * w < 64 (the 4-bit AXPY's 32-lane nibble planes): a manual 3-way
      bf16-split indicator matmul (3 plain MXU matmuls; the r2/r3
      HIGHEST form lowers to 6).  At w=32 the concat pieces run the VPU
      quarter-width while the kernel is VPU-bound with an IDLE MXU, so
      the matmul expansions are nearly free in context: 4-bit AXPY
      ~107 -> ~129 GB/s.  The 3-way split reconstructs any f32 whose
      2^-16-relative residual stays normal; below s ~ 1e-33 the bf16
      conversion loses the subnormal residual (<= 2^-16 relative error)
      — the IDENTICAL envelope as the r2/r3 HIGHEST lowering (measured:
      both flush the same cases), so this is no exactness regression.

    (pltpu.repeat is not usable here: it tiles [s0..sg, s0..sg, ...],
    not element-repeat.  pltpu.roll costs ~13 us per full-width pass at
    n=2^24 — roll trees measured strictly slower.)"""
    rt, nbpr = s.shape
    if nbpr == 1:
        return jnp.broadcast_to(s, (rt, w))
    if w >= 64:
        return jnp.concatenate(
            [jax.lax.broadcast_in_dim(s[:, b:b + 1], (rt, w), (0, 1))
             for b in range(nbpr)], axis=1)
    hi = s.astype(jnp.bfloat16)
    r1 = s - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    r = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 1)
    E = jnp.where(c // w == r, 1.0, 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot(hi, E, preferred_element_type=jnp.float32)
    out += jax.lax.dot(mid, E, preferred_element_type=jnp.float32)
    out += jax.lax.dot(lo, E, preferred_element_type=jnp.float32)
    return out


def _block_absmax(x, w: int):
    """(RT, nbpr*w) -> (RT, nbpr) per-w-lane-group absmax (zero -> 1.0)."""
    nbpr = x.shape[1] // w
    s = jnp.concatenate(
        [jnp.max(x[:, b * w:(b + 1) * w], axis=1, keepdims=True)
         for b in range(nbpr)], axis=1)
    return jnp.where(s == 0.0, 1.0, s)


# ---------------------------------------------------------------------------
# Vector quantize
# ---------------------------------------------------------------------------

GRP = 8                      # blocks per tile row (8 * 64 = 512 lanes)


def _qvec_kernel(seed_ref, x_ref, codes_ref, scales_ref, *, bits, noise):
    """Whole-tile quantize: absmax/SR run at full lane width; only the
    4-bit nibble pack slices per block (interleaved lo/hi 32-groups)."""
    i = pl.program_id(0)
    x = x_ref[:]                                     # f32[RT, 512]
    qm = QMAX[bits]
    s = _block_absmax(jnp.abs(x), BLOCK)             # (RT, 8)
    me = _expand_scales(qm / s, BLOCK)               # (RT, 512)
    q = _sr(x, me, qm, _noise_u(x.shape, seed_ref, i, noise))
    if bits == 4:
        codes_ref[:] = jnp.concatenate(
            [_pack_cols(q[:, b * BLOCK:(b + 1) * BLOCK])
             for b in range(GRP)], axis=1)           # (RT, 256)
    else:
        codes_ref[:] = q.astype(jnp.int8)            # (RT, 512)
    scales_ref[:] = s


def _pick_rt(rows: int) -> int:
    """rows = n / 512 tile rows per step."""
    return next(r for r in (1024, 512, 256, 128, 64, 32, 16, 8, rows)
                if rows % r == 0)


@lru_cache(maxsize=64)
def _build_qvec(n_pad: int, bits: int, noise: bool, interpret: bool):
    rows = n_pad // (8 * BLOCK)
    rt = _pick_rt(rows)
    w = (HALF if bits == 4 else BLOCK) * 8
    return pl.pallas_call(
        partial(_qvec_kernel, bits=bits, noise=noise),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // rt,),
            in_specs=[pl.BlockSpec((rt, 8 * BLOCK), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((rt, w), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, w), jnp.int8),
            jax.ShapeDtypeStruct((rows, 8), jnp.float32),
        ],
        interpret=interpret,
    )


def quantize_vec_pallas(xp: jax.Array, length: int, bits: int, key=None):
    """Padded f32[n_pad] -> QVec4/QVec8 via one fused kernel pass."""
    n_pad = xp.shape[-1]
    seed, noise = seed_from(key)
    call = _build_qvec(n_pad, bits, noise, pallas_interpret())
    codes, scales = call(seed, xp.reshape(n_pad // (8 * BLOCK), 8 * BLOCK))
    cls = QVec4 if bits == 4 else QVec8
    return cls(codes=codes.reshape(-1), scales=scales.reshape(-1),
               length=length)


def quantize_vec_pallas_eligible(n_pad: int) -> bool:
    return n_pad % (8 * BLOCK) == 0


# ---------------------------------------------------------------------------
# Matrix quantize
# ---------------------------------------------------------------------------

def _qmat_kernel(seed_ref, a_ref, codes_ref, scales_ref, *, tm, tn,
                 bits, noise):
    # Mosaic cannot split the lane (last) dim in a reshape, so all per-
    # 64-column-block work uses STATIC lane slices (tn/64 is small).
    i, j = pl.program_id(0), pl.program_id(1)
    a = a_ref[:]                                     # f32[TM, TN]
    tnb = tn // BLOCK
    qm = QMAX[bits]
    # rowwise 64-group reduce via a sublane reshape (supported), then
    # per-block lane maxes; SR runs whole-tile with the multiplier
    # expanded exactly along both dims (sublane repeat + lane selects)
    r1 = jnp.max(jnp.abs(a).reshape(tm // BLOCK, BLOCK, tn), axis=1)
    s = _block_absmax(r1, BLOCK)                     # (TM/64, TN/64)
    me = jnp.repeat(_expand_scales(qm / s, BLOCK), BLOCK, axis=0)
    u = _noise_u(a.shape, seed_ref, i * pl.num_programs(1) + j, noise)
    q = _sr(a, me, qm, u)                      # (TM, TN) integer f32
    if bits == 4:
        codes_ref[:] = jnp.concatenate(
            [_pack_cols(q[:, b * BLOCK:(b + 1) * BLOCK])
             for b in range(tnb)], axis=1)           # (TM, TN/2)
    else:
        codes_ref[:] = q.astype(jnp.int8)            # (TM, TN)
    scales_ref[0, 0] = s


@lru_cache(maxsize=64)
def _build_qmat(m_pad: int, n_pad: int, bits: int, noise: bool,
                interpret: bool):
    tm = next(t for t in (512, 256, 128) if m_pad % t == 0)
    tn = n_pad if n_pad <= 1024 else next(
        t for t in (1024, 512, 256) if n_pad % t == 0)
    gm, gn = m_pad // tm, n_pad // tn
    w = tn // 2 if bits == 4 else tn
    call = pl.pallas_call(
        partial(_qmat_kernel, tm=tm, tn=tn, bits=bits, noise=noise),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gm, gn),
            in_specs=[pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tm, w), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tm // BLOCK, tn // BLOCK),
                             lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, n_pad // 2 if bits == 4 else n_pad),
                                 jnp.int8),
            jax.ShapeDtypeStruct((gm, gn, tm // BLOCK, tn // BLOCK),
                                 jnp.float32),
        ],
        interpret=interpret,
    )
    return call, tm, tn


def quantize_mat_pallas(ap: jax.Array, rows: int, cols: int, bits: int,
                        key=None):
    m_pad, n_pad = ap.shape
    seed, noise = seed_from(key)
    call, tm, tn = _build_qmat(m_pad, n_pad, bits, noise, pallas_interpret())
    codes, s4 = call(seed, ap)
    gm, gn = m_pad // tm, n_pad // tn
    scales = (s4.transpose(0, 2, 1, 3)
              .reshape(m_pad // BLOCK, n_pad // BLOCK))
    cls = QMat4 if bits == 4 else QMat8
    return cls(codes=codes, scales=scales, rows=rows, cols=cols)


def quantize_mat_pallas_eligible(m_pad: int, n_pad: int) -> bool:
    if m_pad % 128 or n_pad % 128:
        return False
    if n_pad > 1024 and all(n_pad % t for t in (1024, 512, 256)):
        return False
    return True


# ---------------------------------------------------------------------------
# Fused AXPY: r = Q(restore(u) + a * restore(v)) at u's precision
# ---------------------------------------------------------------------------

def _axpy_kernel(seed_ref, alpha_ref, uc_ref, us_ref, vc_ref, vs_ref,
                 codes_ref, scales_ref, *, bits, noise):
    """Whole-tile, plane-wise AXPY: for 4-bit the packed hi/lo nibble
    planes are processed as two full-lane-width f32 arrays (no int32
    widening, no lane concat — measured ~4x over the per-block-slice
    form).  Product order matches the golden oracle:
    u_hat + alpha * (codes * (scale/qmax))."""
    i = pl.program_id(0)
    qm = QMAX[bits]
    alpha = alpha_ref[0]
    w = HALF if bits == 4 else BLOCK
    mu = _expand_scales(us_ref[:] / qm, w)
    mv = _expand_scales(vs_ref[:] / qm, w)
    if bits == 4:
        pu, pv = uc_ref[:], vc_ref[:]                # (RT, GRP*32) int8
        hu = jnp.bitwise_and(pu, jnp.int8(-16)).astype(jnp.float32) / 16.0
        hv = jnp.bitwise_and(pv, jnp.int8(-16)).astype(jnp.float32) / 16.0
        lu = jnp.bitwise_and(pu, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
        lv = jnp.bitwise_and(pv, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
        x_lo = lu * mu + alpha * (lv * mv)
        x_hi = hu * mu + alpha * (hv * mv)
        s = _block_absmax(jnp.maximum(jnp.abs(x_lo), jnp.abs(x_hi)), HALF)
        me = _expand_scales(qm / s, HALF)
        # ONE draw feeds both planes: two 8-bit noise samples per 32-bit
        # word (the reference's own SR granularity — one 256-bit draw
        # yields 32 8-bit noises, CloverVector4.h:690-705)
        if noise:
            pltpu.prng_seed(seed_ref[0] + i)
            bits = pltpu.prng_random_bits(x_lo.shape)
            u_lo = (jnp.bitwise_and(bits, 0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
            u_hi = (jnp.bitwise_and(jax.lax.shift_right_logical(bits, 8),
                                    0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
        else:
            u_lo = u_hi = 0.0
        q_lo = _sr(x_lo, me, qm, u_lo)
        q_hi = _sr(x_hi, me, qm, u_hi)
        # plane layout packs in place: byte = 16*hi + lo + 8 (exact f32)
        codes_ref[:] = (16.0 * q_hi + (q_lo + 8.0)).astype(jnp.int8)
    else:
        uf = uc_ref[:].astype(jnp.float32)
        vf = vc_ref[:].astype(jnp.float32)
        x = uf * mu + alpha * (vf * mv)
        s = _block_absmax(jnp.abs(x), BLOCK)
        me = _expand_scales(qm / s, BLOCK)
        q = _sr(x, me, qm, _noise_u(x.shape, seed_ref, i, noise))
        codes_ref[:] = q.astype(jnp.int8)
    scales_ref[:] = s


def _axpy_grp(n_pad: int) -> int:
    """Widest code tile that divides the vector: 64 blocks/row makes the
    4-bit plane arrays 2048 f32 lanes wide.  Measured n=2^24 v5e (bit-
    identical outputs at every width): 4-bit 96 -> 115 GB/s and 8-bit
    sweeps likewise — narrow (rt, 256) tiles leave the VPU underfed."""
    return next(g for g in (64, 32, 16, 8) if n_pad % (g * BLOCK) == 0)


@lru_cache(maxsize=64)
def _build_axpy(n_pad: int, bits: int, noise: bool, interpret: bool,
                grp: int = GRP, rt: int | None = None):
    rows = n_pad // (grp * BLOCK)
    if rt is None:
        cap = max(8192 // grp, 8)
        rt = next(r for r in (cap, 512, 256, 128, 64, 32, 16, 8, rows)
                  if r <= cap and rows % r == 0)
    w = (HALF if bits == 4 else BLOCK) * grp
    cspec = pl.BlockSpec((rt, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((rt, grp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_axpy_kernel, bits=bits, noise=noise),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,        # seed, alpha
            grid=(rows // rt,),
            in_specs=[cspec, sspec, cspec, sspec],
            out_specs=[cspec, sspec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, w), jnp.int8),
            jax.ShapeDtypeStruct((rows, grp), jnp.float32),
        ],
        interpret=interpret,
    )


def axpy_pallas(u, v, alpha, key=None, grp: int | None = None,
                rt: int | None = None):
    """r = Q(restore(u) + alpha*restore(v)), u/v QVec4 or QVec8 alike."""
    assert type(u) is type(v)
    bits = u.bits
    n_pad = u.length_pad
    if grp is None:
        grp = _axpy_grp(n_pad)
    nb = n_pad // BLOCK
    w = HALF if bits == 4 else BLOCK
    seed, noise = seed_from(key)
    alpha = jnp.asarray([alpha], jnp.float32)
    call = _build_axpy(n_pad, bits, noise, pallas_interpret(), grp, rt)
    rows = n_pad // (grp * BLOCK)
    wg = w * grp
    codes, scales = call(
        seed, alpha,
        u.codes.reshape(rows, wg), u.scales.reshape(rows, grp),
        v.codes.reshape(rows, wg), v.scales.reshape(rows, grp))
    return type(u)(codes=codes.reshape(-1), scales=scales.reshape(-1),
                   length=u.length)


def axpy_pallas_eligible(u, v) -> bool:
    return (type(u) is type(v) and isinstance(u, (QVec4, QVec8))
            and u.length_pad == v.length_pad
            and u.length_pad % (GRP * BLOCK) == 0)
