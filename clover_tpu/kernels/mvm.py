"""Fused quantized MVM Pallas kernels (the framework's hot path).

Re-creates the reference's defining performance feature — MVM with
blockwise output requantization, never materializing the f32 result in
main memory (CloverMatrix4.h:777-1083 pure 4-bit, :1093-1449 mixed 4x8,
CloverMatrix8.h:481-1299 pure 8-bit) — as a single Pallas kernel that
streams the packed matrix HBM->VMEM once and keeps all arithmetic on the
MXU.

TPU-native design (nothing like the AVX2 ``maddubs`` pipeline):

* The per-64-block integer dot is expressed as an int8 MXU matmul against
  a *block-diagonal weight matrix* built from the vector's codes: column
  ``b`` holds x's codes for block ``b`` and zeros elsewhere, so one
  ``(TM, TK/2) @ (TK/2, NB)`` matmul yields all per-(row, block) partial
  sums exactly in int32.  The weights are constructed IN-KERNEL from the
  raw x codes with one iota-mask select (x is tiny; the matrix stream is
  the cost), so an MVM is exactly one kernel launch however often the
  vector changes — crucial inside solver loops.
* 4-bit matrices are consumed PACKED.  With the biased-nibble format
  (formats.py: byte = 16*hi + (lo+8) as int8), two matmuls recover the
  exact blocked dot with a single int8 mask as the only elementwise VPU
  op over the matrix tile:

      mm1 = p @ W_hi                     # p = packed bytes
      mm2 = (p & 15) @ W_mix             # W_mix built from 16*lo - hi codes
      T_b = (mm1 + mm2)/16 - 8*colsum(x_lo)_b        [pure 4x4]

  (Mosaic on this TPU has no int8 shift/sub/mul; it does have int8 AND,
  select, and int8 MXU matmuls — measured ~88% of HBM roofline.)
* Per-tile combined scales ``(s_A/qA)*(s_x/qx)`` are applied per (64-row
  band, 64-col block) in f32 and accumulated across k-tiles in VMEM
  scratch.
* On the final k step each 64-row band is absmax'd and requantized with
  stochastic rounding from the on-core PRNG (``pltpu.prng_random_bits``),
  then nibble-packed in-register — the TPU analog of the reference's
  in-register band requantization (CloverMatrix4.h:788-1083).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QMat4, QMat8, QVec4, QVec8, unpack_nibbles
from .dispatch import pallas_interpret, seed_from

QMAX = {4: 7.0, 8: 127.0}
HALF = BLOCK // 2

# VMEM-friendly tile bounds (A tile <= 4 MB double-buffered).
_TK_MAX_SINGLE = 8192           # use TK = n_pad when n_pad <= this
_TK_CHOICES = (8192, 4096, 2048, 1024, 512)


def _pick_geometry(m_pad: int, n_pad: int, mode: str):
    """Choose (TM, TK) under VMEM budgets.

    Measured rule (v5e sweep, doc/results): TM=1024 with the largest TK
    that keeps the A tile at <= 4 MB wins across modes and sizes —
    4x4 n=16K: (1024, 8192) 80.6% of roofline vs (2048, 4096) 75.6%,
    (512, 8192) 71%; 8x8 n=16K: (1024, 4096) 90.6%.  Budgets: A tile
    (TM x TK/pack) <= 4 MB double-buffered (bigger tiles need the raised
    vmem_limit_bytes and compile 5-10x slower for ~no gain); block-
    diagonal weight cache (built once per k on the first row sweep,
    reused for every other row tile) <= ~4 MB.

    Why 4x4 tops out ~5-10 points below 8x8 (ablations, v5e n=16K):
    each packed byte needs TWO linear functionals (hi/lo nibble planes),
    and an MXU pass costs 128 lane-slots per LHS row however many are
    useful, so ANY block-diagonal formulation pays 2 x 128 MAC-slots
    per byte — geometry-independent.  That MXU floor (~175 us at n=16K,
    ~767 GB/s) sits just below the DMA floor; dropping one matmul
    measures 755 GB/s (92%) vs ~640 (78%) for both, the full-tile int8
    AND is free, and a single K-concatenated matmul is not faster.
    Range analysis kills the escape hatches: packing two 64-blocks per
    int8 weight column needs a 2^13 separation (int8 max 2^7), and the
    bf16-with-2^12-separation variant halves the MXU rate for exactly
    the slot saving it buys.
    """
    import os
    pack = 2 if mode in ("4x4", "4x8", "4x4i4") else 1
    env_tm = os.environ.get("CLOVER_MVM_TM")
    env_tk = os.environ.get("CLOVER_MVM_TK")
    if env_tm and env_tk:
        return int(env_tm), int(env_tk)          # trust full overrides

    tm_choices = ((int(env_tm),) if env_tm
                  else (1024, 512, 2048, 256, 4096, 128))
    tm = next((t for t in tm_choices if m_pad % t == 0), None)
    if tm is None:
        return None

    def ok(tk):
        if n_pad % tk or (tk % 256 and tk != n_pad):
            return False
        if env_tk and tk == int(env_tk):
            return True                          # trust the override
        if tm * tk // pack > (4 << 20):          # A tile
            return False
        if n_pad * tk // 64 > (4 << 20):         # W scratch cache
            return False
        return True

    tk_choices = ((int(env_tk),) if env_tk else ())
    if n_pad <= _TK_MAX_SINGLE:
        tk_choices += (n_pad,)
    tk_choices += _TK_CHOICES
    tk = next((t for t in tk_choices if ok(t)), None)
    if tk is None:
        return None
    return tm, tk


def _mode(A, x) -> str | None:
    if isinstance(A, QMat4) and isinstance(x, QVec4):
        return "4x4"
    if isinstance(A, QMat4) and isinstance(x, QVec8):
        return "4x8"
    if isinstance(A, QMat8) and isinstance(x, QVec8):
        return "8x8"
    return None


def mvm_pallas_eligible(A, x) -> bool:
    mode = _mode(A, x)
    if mode is None:
        return False
    return _pick_geometry(A.rows_pad, A.cols_pad, mode) is not None


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _block_diag(codes, nb: int, width: int):
    """(NB, width) int8 codes -> (NB*width, NB) block-diagonal weights.

    W[b*width + j, b'] = codes[b, j] if b == b' else 0.
    """
    row_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 2)
    # Mosaic cannot reshape int8 (nb, w) -> (nb, w, 1); do the broadcast
    # and select at int32 (x is tiny) and convert after the 2-D collapse.
    cb = jax.lax.broadcast_in_dim(codes.astype(jnp.int32),
                                  (nb, width, nb), (0, 1))
    w3 = jnp.where(row_b == col_b, cb, 0)
    return w3.reshape(nb * width, nb).astype(jnp.int8)


def _unoise(seed, shape, noise: bool):
    if not noise:
        return 0.0
    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)
    return (jnp.bitwise_and(bits, 0x00FFFFFF).astype(jnp.float32)
            * (1.0 / (1 << 24)))


def _band_sr(y2, qm: float, u):
    """Band absmax + SR -> (integer-valued f32 codes, scales)."""
    s = jnp.max(jnp.abs(y2), axis=1, keepdims=True)
    s = jnp.where(s == 0.0, 1.0, s)
    qab = jnp.minimum(jnp.floor(jnp.abs(y2) * (qm / s) + u),
                      jnp.float32(qm))
    return jnp.where(y2 < 0.0, -qab, qab), s


def _write_codes(ycodes_ref, q, out_bits: int):
    if out_bits == 4:
        # byte = 16*hi + lo + 8 always fits int8 (see kernels/quantize)
        ycodes_ref[0] = (16.0 * q[:, HALF:] + (q[:, :HALF] + 8.0)
                         ).astype(jnp.int8)
    else:
        ycodes_ref[0] = q.astype(jnp.int8)


def _requant_write(seed_ref, ycodes_ref, yscales_ref, y2, out_bits, noise, i):
    """Band absmax -> SR quantize -> (pack) -> write outputs.

    y2: f32[TM//64, 64] of band values (one row per output block).
    """
    if out_bits == 32:
        ycodes_ref[0] = y2
        yscales_ref[0] = jnp.ones_like(yscales_ref[0])
        return
    qm = QMAX[out_bits]
    q, s = _band_sr(y2, qm, _unoise(seed_ref[0] + i, y2.shape, noise))
    _write_codes(ycodes_ref, q, out_bits)
    yscales_ref[0] = s


def _requant_axpy_write(seed_ref, alpha_ref, uc_ref, us_ref,
                        ycodes_ref, yscales_ref, y2, out_bits, noise, i):
    """Fused epilogue: r = Q(u_hat + alpha * t1_hat) where t1 = Q(y2).

    The reference's scaleAndAdd (CloverVector4.h:1196-1517) folded behind
    the MVM's band requant: t1 is requantized IN-REGISTER (preserving the
    unfused mvm -> scaleAndAdd numerics exactly in deterministic mode —
    the intermediate quantization is NOT skipped) but never written to
    HBM, and the AXPY costs zero extra kernel launches.  Output blocks
    coincide with the 64-row bands, so the AXPY's blockwise requant is
    just a second band requant.

    ``noise`` is a static (mvm_leg, axpy_leg) pair so e.g. a
    deterministic MVM + SR AXPY keeps the unfused semantics of
    mvm(key=None) -> scale_and_add(key=k).
    """
    qm = QMAX[out_bits]
    # leg 1: the MVM's own band requant (same op order as _requant_write)
    q1, s1 = _band_sr(y2, qm, _unoise(seed_ref[0] + i, y2.shape, noise[0]))
    # leg 2: scaleAndAdd in the oracle's op order:
    # x = u_code*(us/qm) + alpha * (t1_code*(s1/qm))
    if out_bits == 4:
        p = uc_ref[0]
        lo = jnp.bitwise_and(p, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
        hi = jnp.bitwise_and(p, jnp.int8(-16)).astype(jnp.float32) / 16.0
        u_codes = jnp.concatenate([lo, hi], axis=1)
    else:
        u_codes = uc_ref[0].astype(jnp.float32)
    # Same expression shape as the standalone AXPY kernel
    # (kernels/quantize.py _axpy_kernel) so the compiler applies the SAME
    # fma contraction to both: fused is bit-identical to the unfused
    # mvm_pallas -> axpy_pallas sequence.  (vs the eager XLA path the
    # contraction costs <=1 output LSB — the axpy kernel's own tolerance.)
    x = u_codes * (us_ref[0] / qm) + alpha_ref[0] * (q1 * (s1 / qm))
    q2, s2 = _band_sr(x, qm, _unoise(seed_ref[1] + i, x.shape, noise[1]))
    _write_codes(ycodes_ref, q2, out_bits)
    yscales_ref[0] = s2


def _combe(ascales_ref, xscales_ref, scale_const: float, flat: bool):
    """(TM/64, NB) x (1, NB) tile scales -> f32[TM, NB] per-element combine.

    ``flat``: scales arrive as plain 2-D arrays block-indexed by (i, k)
    (legal when NB % 128 == 0 or gk == 1 — zero host-side prep);
    otherwise as the 4-D/3-D pre-tiled layouts.
    """
    asc = ascales_ref[:] if flat else ascales_ref[0, 0]
    xs = xscales_ref[:] if flat else xscales_ref[0]
    c = asc * xs * scale_const                       # (TM/64,nb)*(1,nb)
    return jnp.repeat(c, BLOCK, axis=0)


# ---------------------------------------------------------------------------
# Kernel bodies (one per precision mode)
# ---------------------------------------------------------------------------

def _epilogue(seed_ref, alpha_ref, uc_ref, us_ref, ycodes_ref, yscales_ref,
              acc_ref, out_bits, noise, i):
    y2 = jnp.sum(acc_ref[:], axis=2)
    if uc_ref is None:
        _requant_write(seed_ref, ycodes_ref, yscales_ref, y2,
                       out_bits, noise, i)
    else:
        _requant_axpy_write(seed_ref, alpha_ref, uc_ref, us_ref,
                            ycodes_ref, yscales_ref, y2, out_bits, noise, i)


def _kernel_4x8(seed_ref, a_ref, xc_ref, ascales_ref, xscales_ref,
                ycodes_ref, yscales_ref, acc_ref, whi_c, wlo_c, *,
                nb, tm, out_bits, noise, flat,
                alpha_ref=None, uc_ref=None, us_ref=None):
    """Mixed 4-bit matrix x 8-bit vector (CloverMatrix4.h:1093-1449).
    x arrives as int8 codes (NB, 64); hi/lo-position halves are static
    lane slices."""
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xlo = xc_ref[:, :HALF]
    xhi = xc_ref[:, HALF:]

    @pl.when(i == 0)          # build the weight cache on the first row sweep
    def _():
        whi_c[k] = _block_diag(xhi, nb, HALF)
        wlo_c[k] = _block_diag(xlo, nb, HALF)

    p = a_ref[:]
    # two masked planes -> two matmuls (vs p/lou/lou x three):
    # (p & 0xF0) = 16*h exactly, so hi16 @ W_hi = 16 * sum(h * x_hi)
    hi16 = jnp.bitwise_and(p, jnp.int8(-16))
    lou = jnp.bitwise_and(p, jnp.int8(0x0F))
    dn = (((1,), (0,)), ((), ()))
    mm_h = jax.lax.dot_general(hi16, whi_c[k], dn,
                               preferred_element_type=jnp.int32)
    mm_l = jax.lax.dot_general(lou, wlo_c[k], dn,
                               preferred_element_type=jnp.int32)
    hh = jax.lax.shift_right_arithmetic(mm_h, 4)            # sum h * x_hi
    colsum = jnp.sum(xlo.astype(jnp.int32), axis=1).astype(jnp.float32)
    t = (hh + mm_l).astype(jnp.float32) - 8.0 * colsum[None, :]
    combe = _combe(ascales_ref, xscales_ref, 1.0 / (7.0 * 127.0), flat)
    acc_ref[:] += (t * combe).reshape(tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        _epilogue(seed_ref, alpha_ref, uc_ref, us_ref, ycodes_ref,
                  yscales_ref, acc_ref, out_bits, noise, i)


def _kernel_8x8(seed_ref, a_ref, xc_ref, ascales_ref, xscales_ref,
                ycodes_ref, yscales_ref, acc_ref, w_c, *,
                nb, tm, out_bits, noise, flat,
                alpha_ref=None, uc_ref=None, us_ref=None):
    """Pure 8-bit (CloverMatrix8.h:481-1299): codes hit the MXU directly."""
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        w_c[k] = _block_diag(xc_ref[:], nb, BLOCK)

    dn = (((1,), (0,)), ((), ()))
    mm = jax.lax.dot_general(a_ref[:], w_c[k], dn,
                             preferred_element_type=jnp.int32)
    combe = _combe(ascales_ref, xscales_ref, 1.0 / (127.0 * 127.0), flat)
    acc_ref[:] += (mm.astype(jnp.float32) * combe).reshape(
        tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        _epilogue(seed_ref, alpha_ref, uc_ref, us_ref, ycodes_ref,
                  yscales_ref, acc_ref, out_bits, noise, i)


def _unpack_x4(xc_ref):
    """Packed x codes (NB, 32) -> (xhi, xlo) int32 code tiles."""
    xp = xc_ref[:].astype(jnp.int32)
    xhi = jax.lax.shift_right_arithmetic(xp, 4)
    xlo = jnp.bitwise_and(xp, 15) - 8
    return xhi, xlo


def _kernel_4x4_i4(seed_ref, a_ref, xc_ref, ascales_ref, xscales_ref,
                   ycodes_ref, yscales_ref, acc_ref, w4_c, *,
                   nb, tm, out_bits, noise, flat,
                   alpha_ref=None, uc_ref=None, us_ref=None):
    """Pure 4-bit MVM consuming A as an int4 ELEMENT array: one int4 MXU
    matmul per tile (the v5e MXU contracts int4 at 2x the int8 element
    rate — measured ratio 0.516, doc/results/mvm_i4_ablation_r5.md), so
    the MXU floor is HALF the packed-int8 kernel's two-plane-matmul
    formulation (CloverMatrix4.h:777-1083 analog).  No int8 AND, no
    colsum correction, no plane add: the compute mix per streamed byte
    drops below the 8-bit kernel's, which is what keeps the rate at the
    DMA floor under degraded chip tenancy (VERDICT r4 #1).

    Requires ``A`` prepared via :func:`mat4_i4_stream` (a one-time XLA
    relayout cached per matrix, like the reference materializing PhiT —
    test/accuracy/02_iht_accuracy.h:72).  Scale-combine constant is
    1/(7*7) vs the packed kernel's 1/(7*7*16); the int32 block dots are
    identical and the constants differ by a power of two, so outputs are
    bit-identical to the packed kernel (verified on-chip, det + SR)."""
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)          # int4 weight cache, once per k-tile
    def _():
        xhi, xlo = _unpack_x4(xc_ref)
        # natural element order: block elements [0,32) are low nibbles,
        # [32,64) high nibbles (formats.pack_nibbles)
        ecodes = jnp.concatenate([xlo, xhi], axis=1)
        w4_c[k] = _block_diag_i4(ecodes, nb, BLOCK)

    dn = (((1,), (0,)), ((), ()))
    mm = jax.lax.dot_general(a_ref[:], w4_c[k], dn,
                             preferred_element_type=jnp.int32)
    combe = _combe(ascales_ref, xscales_ref, 1.0 / (7.0 * 7.0), flat)
    acc_ref[:] += (mm.astype(jnp.float32) * combe).reshape(
        tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        _epilogue(seed_ref, alpha_ref, uc_ref, us_ref, ycodes_ref,
                  yscales_ref, acc_ref, out_bits, noise, i)


def _block_diag_i4(codes, nb: int, width: int):
    """Like :func:`_block_diag` but emitting int4 weights (in-kernel
    int32 -> int4 convert is supported by Mosaic; int8 -> int4 lane-
    expanding bitcast is not)."""
    row_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 2)
    cb = jax.lax.broadcast_in_dim(codes, (nb, width, nb), (0, 1))
    w3 = jnp.where(row_b == col_b, cb, 0)
    return w3.reshape(nb * width, nb).astype(jnp.int4)


def _kernel_4x4(seed_ref, a_ref, xc_ref, ascales_ref,
                xscales_ref, ycodes_ref, yscales_ref, acc_ref, whi_c, wmix_c,
                colsum_c, *, nb, tm, out_bits, noise, flat,
                alpha_ref=None, uc_ref=None, us_ref=None):
    """Pure 4-bit x 4-bit (CloverMatrix4.h:777-1083).  x arrives PACKED
    (one 32-byte row per block); unpack is a few int32 ops on a tiny
    tile, done in-kernel so an MVM needs zero host-side prep of x."""
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)          # unpack x + build caches once per k-tile
    def _():
        xhi, xlo = _unpack_x4(xc_ref)
        whi_c[k] = _block_diag(xhi, nb, HALF)
        wmix_c[k] = _block_diag(16 * xlo - xhi, nb, HALF)
        colsum_c[k] = jnp.sum(xlo, axis=1,
                              keepdims=True).astype(jnp.float32).T

    p = a_ref[:]
    lou = jnp.bitwise_and(p, jnp.int8(0x0F))
    dn = (((1,), (0,)), ((), ()))
    mm1 = jax.lax.dot_general(p, whi_c[k], dn,
                              preferred_element_type=jnp.int32)
    mm2 = jax.lax.dot_general(lou, wmix_c[k], dn,
                              preferred_element_type=jnp.int32)
    # mm1 + mm2 == 16 * (T_b + 8*colsum(x_lo))
    t = (mm1 + mm2).astype(jnp.float32) - 128.0 * colsum_c[k]
    combe = _combe(ascales_ref, xscales_ref, 1.0 / (7.0 * 7.0 * 16.0), flat)
    acc_ref[:] += (t * combe).reshape(tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        _epilogue(seed_ref, alpha_ref, uc_ref, us_ref, ycodes_ref,
                  yscales_ref, acc_ref, out_bits, noise, i)


# ---------------------------------------------------------------------------
# pallas_call factories (cached per static geometry)
# ---------------------------------------------------------------------------

def _fused_wrap(core):
    """Positional-ref adapter for the fused MVM+AXPY variant: scalar
    prefetch grows to (seed, alpha) and two u-operand inputs follow the
    scale inputs; the core kernels receive them as keywords."""
    def k(seed_ref, alpha_ref, a_ref, xc_ref, asc_ref, xsc_ref,
          uc_ref, us_ref, ycodes_ref, yscales_ref, *scratch, **kw):
        core(seed_ref, a_ref, xc_ref, asc_ref, xsc_ref,
             ycodes_ref, yscales_ref, *scratch,
             alpha_ref=alpha_ref, uc_ref=uc_ref, us_ref=us_ref, **kw)
    return k


@lru_cache(maxsize=64)
def _build_call(mode: str, m_pad: int, n_pad: int, out_bits: int,
                noise, interpret: bool, fused: bool = False):
    # ``noise``: bool for the plain MVM; a static (mvm_leg, axpy_leg)
    # bool pair for the fused MVM+AXPY (both are hashable cache keys).
    geo_mode = "4x4" if mode == "4x4i4" else mode
    tm, tk = _pick_geometry(m_pad, n_pad, geo_mode)
    nb = tk // BLOCK
    gm, gk = m_pad // tm, n_pad // tk
    # A tile k width: packed bytes for 4-bit int8 modes, elements for the
    # int4-array mode (same bytes either way)
    ka = tk // 2 if mode in ("4x4", "4x8") else tk
    pck = BLOCK // 2 if out_bits == 4 else BLOCK        # codes per out block

    a_spec = pl.BlockSpec((tm, ka), lambda i, k, *_: (i, k),
                          memory_space=pltpu.VMEM)
    # flat scales: ascales block (tm/64, nb) must be tile-legal both ways
    flat = ((gk == 1) or (nb % 128 == 0)) and (
        (tm // BLOCK) % 8 == 0 or gm == 1)
    if flat:
        # scales consumed as plain 2-D arrays — zero host-side prep
        ascales_spec = pl.BlockSpec((tm // BLOCK, nb),
                                    lambda i, k, *_: (i, k),
                                    memory_space=pltpu.VMEM)
        xscales_spec = pl.BlockSpec((1, nb), lambda i, k, *_: (0, k),
                                    memory_space=pltpu.VMEM)
    else:
        ascales_spec = pl.BlockSpec((1, 1, tm // BLOCK, nb),
                                    lambda i, k, *_: (i, k, 0, 0),
                                    memory_space=pltpu.VMEM)
        xscales_spec = pl.BlockSpec((1, 1, nb), lambda i, k, *_: (k, 0, 0),
                                    memory_space=pltpu.VMEM)

    def xc_spec(width):
        return pl.BlockSpec((nb, width), lambda i, k, *_: (k, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, tm // BLOCK, pck), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm // BLOCK, 1), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (gm, tm // BLOCK, pck),
            jnp.float32 if out_bits == 32 else jnp.int8),
        jax.ShapeDtypeStruct((gm, tm // BLOCK, 1), jnp.float32),
    ]

    # 3-D accumulator (bands, 64, nb): the final band reduce is a lane
    # reduction instead of a 1-D sublane/lane relayout of (tm,)
    acc_scratch = pltpu.VMEM((tm // BLOCK, BLOCK, nb), jnp.float32)
    w_scratch = pltpu.VMEM((gk, ka, nb), jnp.int8)

    common = dict(nb=nb, tm=tm, out_bits=out_bits, noise=noise,
                  flat=flat)
    core = {"4x4": _kernel_4x4, "4x8": _kernel_4x8,
            "8x8": _kernel_8x8, "4x4i4": _kernel_4x4_i4}[mode]
    kernel = partial(_fused_wrap(core) if fused else core, **common)
    if mode == "4x4i4":
        in_specs = [a_spec, xc_spec(HALF), ascales_spec, xscales_spec]
        scratch = [acc_scratch, pltpu.VMEM((gk, tk, nb), jnp.int4)]
    elif mode == "4x4":
        in_specs = [a_spec, xc_spec(HALF), ascales_spec, xscales_spec]
        scratch = [acc_scratch, w_scratch, w_scratch,
                   pltpu.VMEM((gk, 1, nb), jnp.float32)]
    elif mode == "4x8":
        in_specs = [a_spec, xc_spec(BLOCK), ascales_spec, xscales_spec]
        scratch = [acc_scratch, w_scratch, w_scratch]
    else:
        in_specs = [a_spec, xc_spec(BLOCK), ascales_spec, xscales_spec]
        scratch = [acc_scratch, w_scratch]
    if fused:
        # u operand (the AXPY's first input) rides the same per-row-tile
        # block layout as the outputs
        in_specs += [
            pl.BlockSpec((1, tm // BLOCK, pck), lambda i, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm // BLOCK, 1), lambda i, k, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    # Row-grid dimension semantics: each i owns its output tile (only
    # the k dimension carries the accumulator), so the row grid is
    # parallel-safe.  Declaring it "parallel" measured faster on the
    # full kernel at both sizes (v5e, doc/results/mvm_dossier_r3.md:
    # 199.6 vs 202.3 us at n=16K, 738.1 vs 756.6 us at n=32K) — round 2
    # had swept semantics only on DMA-only probes, where it made no
    # difference.  Outputs are bit-identical (verified on the real
    # chip).  The env override keeps the sweep reproducible.
    import os as _os
    row_sem = _os.environ.get("CLOVER_MVM_ROW_SEMANTICS", "parallel")
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if fused else 1,
            grid=(gm, gk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(row_sem, "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, tm, tk, flat


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def mvm_pallas(A, x, key=None, a_i4=None):
    """Fused requantizing MVM on TPU.  Returns the quantized output
    container ((4,4)->4, (4,8)->8, (8,8)->8), matching the reference
    dispatch (CloverMatrix4.h:777, :1093; CloverMatrix8.h:1002).

    ``a_i4``: optional prepared :func:`mat4_i4_stream` view of A (4x4
    mode only) — routes to the single-int4-matmul kernel, bit-identical
    to the packed kernel and at the DMA floor even under degraded chip
    tenancy."""
    mode = _mode(A, x)
    assert mode is not None, (type(A), type(x))
    out_bits = {"4x4": 4, "4x8": 8, "8x8": 8}[mode]
    m_pad, n_pad = A.rows_pad, A.cols_pad

    seed, noise = seed_from(key)

    use_i4 = a_i4 is not None and mode == "4x4"
    kmode = "4x4i4" if use_i4 else mode
    call, tm, tk, flat = _build_call(kmode, m_pad, n_pad, out_bits, noise,
                                     pallas_interpret())
    # Per-call prep: x codes pass through PACKED/raw (unpacking happens
    # in-kernel); scales pass through as-is on the flat path.
    xc, ascales4, xscales2 = _prep_call_args(A, x, kmode, tm, tk, flat)
    yc, ys = call(seed, a_i4 if use_i4 else A.codes, xc, ascales4, xscales2)

    codes = yc.reshape(-1)
    scales = ys.reshape(-1)
    out_cls = QVec4 if out_bits == 4 else QVec8
    return out_cls(codes=codes, scales=scales, length=A.rows)


def _prep_call_args(A, x, mode, tm, tk, flat):
    m_pad, n_pad = A.rows_pad, A.cols_pad
    nb = tk // BLOCK
    gm, nkt = m_pad // tm, n_pad // tk
    nb_total = n_pad // BLOCK
    if flat:
        xscales2 = x.scales.reshape(1, nb_total)
        ascales4 = A.scales
    else:
        xscales2 = x.scales.reshape(nkt, 1, nb)
        ascales4 = (A.scales.reshape(gm, tm // BLOCK, nkt, nb)
                    .transpose(0, 2, 1, 3))
    if mode in ("4x4", "4x4i4"):
        xc = x.codes.reshape(nb_total, HALF)        # packed: 32 B per block
    else:
        xc = x.codes.reshape(nb_total, BLOCK)       # int8 codes per block
    return xc, ascales4, xscales2


# ---------------------------------------------------------------------------
# int4 stream view (the round-5 headline path)
# ---------------------------------------------------------------------------

def mvm_i4_enabled() -> bool:
    """The int4-array MVM path needs real Mosaic (interpret mode cannot
    lower sub-byte types on CPU) and is on by default on TPU;
    ``CLOVER_MVM_I4=0`` forces the packed-int8 kernel everywhere."""
    import os
    if os.environ.get("CLOVER_MVM_I4", "1") == "0":
        return False
    return not pallas_interpret()


def mat4_i4_stream(A) -> jax.Array:
    """Packed QMat4 codes -> (m_pad, n_pad) jnp.int4 element array.

    The prepared stream operand for the int4 MVM kernel: same HBM bytes
    as the packed codes (XLA packs int4 2/byte, layout T(64,128)(8,1)),
    values in natural element order.  Build it ONCE per matrix inside
    the jit that consumes it (solvers hoist it out of their scan;
    the reference analogously materializes PhiT up front,
    test/accuracy/02_iht_accuracy.h:72).

    Caveat (this jax/axon build): committed int4 arrays cannot be passed
    ACROSS a jit boundary (device_put relayout recursion), so the view
    cannot be cached on the container eagerly — always derive it inside
    the consuming jit.
    """
    assert isinstance(A, QMat4), type(A)
    return unpack_nibbles(A.codes).astype(jnp.int4)


def mvm_axpy_pallas(A, x, u, alpha, key_mvm=None, key_axpy=None,
                    a_i4=None):
    """r = Q(restore(u) + alpha * restore(Q(A @ x))) in ONE kernel.

    The IHT/GD iteration's ``t2 = y - t1`` and ``x += mu*t3`` steps
    (reference: scaleAndAdd_parallel right after mvm_parallel,
    test/accuracy/02_iht_accuracy.h:79-95) fused behind the MVM — the
    intermediate quantized MVM result lives only in-register, and the
    iteration drops from five launches to three.  Deterministic mode is
    bit-identical to the unfused KERNEL sequence (mvm_pallas ->
    axpy_pallas); vs the portable XLA path the compiler's dequant-fma
    contraction costs <=1 output LSB (the same allowance
    test_axpy_kernel_bitexact grants the standalone AXPY kernel)."""
    mode = _mode(A, x)
    assert mode is not None, (type(A), type(x))
    out_bits = {"4x4": 4, "4x8": 8, "8x8": 8}[mode]
    m_pad, n_pad = A.rows_pad, A.cols_pad
    s1, n1 = seed_from(key_mvm)
    s2, n2 = seed_from(key_axpy)
    seeds = jnp.concatenate([s1, s2])
    use_i4 = a_i4 is not None and mode == "4x4"
    kmode = "4x4i4" if use_i4 else mode
    call, tm, tk, flat = _build_call(kmode, m_pad, n_pad, out_bits, (n1, n2),
                                     pallas_interpret(), fused=True)
    xc, ascales4, xscales2 = _prep_call_args(A, x, kmode, tm, tk, flat)
    gm = m_pad // tm
    pck = HALF if out_bits == 4 else BLOCK
    uc3 = u.codes.reshape(gm, tm // BLOCK, pck)
    us3 = u.scales.reshape(gm, tm // BLOCK, 1)
    yc, ys = call(seeds, jnp.asarray([alpha], jnp.float32),
                  a_i4 if use_i4 else A.codes, xc,
                  ascales4, xscales2, uc3, us3)
    out_cls = QVec4 if out_bits == 4 else QVec8
    return out_cls(codes=yc.reshape(-1), scales=ys.reshape(-1),
                   length=A.rows)


def mvm_axpy_pallas_eligible(A, x, u) -> bool:
    mode = _mode(A, x)
    if mode is None:
        return False
    out_bits = {"4x4": 4, "4x8": 8, "8x8": 8}[mode]
    cls = QVec4 if out_bits == 4 else QVec8
    if not isinstance(u, cls) or u.length != A.rows:
        return False
    return _pick_geometry(A.rows_pad, A.cols_pad, mode) is not None


def mvm_pallas_f32(A, x, a_i4=None) -> jax.Array:
    """Fused MVM returning the padded f32 result (no output requant).

    This is the kernel the sharded path runs per shard: partials are
    psum'd over ICI BEFORE requantization so the band absmax sees the
    globally-reduced values (the distributed form of
    CloverMatrix4.h:788-1083's band requant; reference parallel MVM:
    CloverMatrix4.h:1681).  No PRNG is involved (requant happens after
    the psum), so this compiles in interpret mode too.
    """
    mode = _mode(A, x)
    assert mode is not None, (type(A), type(x))
    m_pad, n_pad = A.rows_pad, A.cols_pad
    seed = jnp.zeros((1,), jnp.int32)
    use_i4 = a_i4 is not None and mode == "4x4"
    kmode = "4x4i4" if use_i4 else mode
    call, tm, tk, flat = _build_call(kmode, m_pad, n_pad, 32, False,
                                     pallas_interpret())
    xc, ascales4, xscales2 = _prep_call_args(A, x, kmode, tm, tk, flat)
    yc, _ = call(seed, a_i4 if use_i4 else A.codes, xc, ascales4, xscales2)
    return yc.reshape(-1)
