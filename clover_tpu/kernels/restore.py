"""Pallas restore kernels (quantized codes -> fp32, streaming).

Reference counterparts: vector restore (CloverVector4.h:1027-1092,
CloverVector8.h:835-910) and matrix restore (CloverMatrix4.h:266-310,
CloverMatrix8.h:1300-1311).

The portable XLA path (ops/quantize.restore_*) unpacks nibbles with int8
shifts and multiplies by a repeat-expanded per-element multiplier; on v5e
it measures ~93-114 GB/s (11-14% of roofline) — the int8->f32 widening
pipeline and the gathered multiplier dominate.  These kernels reuse the
AXPY recipe (kernels/quantize.py): dequantize the packed hi/lo nibble
planes WHOLE-TILE with bitwise AND + convert (no int32 widening, no lane
reshapes), multiply by block scales expanded exactly on the MXU
(`_expand_scales`), and assemble the natural element order with static
per-block lane slices.  Restore output is 4 B/elem of f32 writes, so the
kernel is write-bandwidth-bound: it measures AT the ~490 GB/s mixed
read+write stream floor of this grid (484/462 GB/s 4/8-bit; a write-only
floor kernel through the same grid measures 489 — see
doc/results/quantize_restore_ablation_r2.md §4).

Bit-exactness: the multiplier is ``scales / qmax`` and the product is
``code * mult`` — identical operation order to ops/_core.expand_*_scales,
so results match the XLA path bit-for-bit (tests/test_kernels.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QMat4, QMat8, QMat32, QVec4, QVec8, QVec32
from .dispatch import pallas_interpret
from .quantize import GRP, HALF, QMAX, _expand_scales, _pick_rt


def _dequant_planes(p, mu):
    """Packed int8 plane tile + per-plane-lane multiplier -> (lo, hi) f32."""
    hi = jnp.bitwise_and(p, jnp.int8(-16)).astype(jnp.float32) / 16.0
    lo = jnp.bitwise_and(p, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
    return lo * mu, hi * mu


def _interleave_blocks(x_lo, x_hi, nblocks: int):
    """Plane layout (R, nblocks*32) x2 -> natural order (R, nblocks*64)."""
    parts = []
    for b in range(nblocks):
        parts.append(x_lo[:, b * HALF:(b + 1) * HALF])
        parts.append(x_hi[:, b * HALF:(b + 1) * HALF])
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# Vector restore
# ---------------------------------------------------------------------------

def _rvec_kernel(c_ref, ms_ref, out_ref, *, bits):
    # ms_ref carries scales/qmax PRE-DIVIDED outside the kernel so the
    # division rounds through the same eager XLA op as the portable path
    # (in-kernel division can differ by 1 ULP) — everything below is
    # exact: indicator-matmul expand, AND+convert, one IEEE multiply.
    if bits == 4:
        mu = _expand_scales(ms_ref[:], HALF)              # (RT, GRP*32)
        x_lo, x_hi = _dequant_planes(c_ref[:], mu)
        out_ref[:] = _interleave_blocks(x_lo, x_hi, GRP)  # (RT, GRP*64)
    else:
        mu = _expand_scales(ms_ref[:], BLOCK)             # (RT, GRP*64)
        out_ref[:] = c_ref[:].astype(jnp.float32) * mu


@lru_cache(maxsize=64)
def _build_rvec(n_pad: int, bits: int, interpret: bool):
    rows = n_pad // (GRP * BLOCK)
    rt = _pick_rt(rows)
    w = (HALF if bits == 4 else BLOCK) * GRP
    return pl.pallas_call(
        partial(_rvec_kernel, bits=bits),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, GRP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, GRP * BLOCK), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, GRP * BLOCK), jnp.float32),
        interpret=interpret,
    )


def restore_vec_pallas(q) -> QVec32:
    """QVec4/QVec8 -> QVec32 via one fused dequant pass."""
    bits = q.bits
    n_pad = q.length_pad
    rows = n_pad // (GRP * BLOCK)
    w = (HALF if bits == 4 else BLOCK) * GRP
    call = _build_rvec(n_pad, bits, pallas_interpret())
    ms = (q.scales / QMAX[bits]).astype(jnp.float32)
    out = call(q.codes.reshape(rows, w), ms.reshape(rows, GRP))
    return QVec32(values=out.reshape(-1), length=q.length)


def restore_vec_pallas_eligible(q) -> bool:
    return (isinstance(q, (QVec4, QVec8))
            and q.length_pad % (GRP * BLOCK) == 0)


# ---------------------------------------------------------------------------
# Matrix restore
# ---------------------------------------------------------------------------

def _rmat_kernel(c_ref, ms_ref, out_ref, *, tn, bits):
    ms = ms_ref[0, 0]                                     # (TM/64, TN/64)
    if bits == 4:
        mu = jnp.repeat(_expand_scales(ms, HALF), BLOCK, axis=0)
        x_lo, x_hi = _dequant_planes(c_ref[:], mu)        # (TM, TN/2)
        out_ref[:] = _interleave_blocks(x_lo, x_hi, tn // BLOCK)
    else:
        mu = jnp.repeat(_expand_scales(ms, BLOCK), BLOCK, axis=0)
        out_ref[:] = c_ref[:].astype(jnp.float32) * mu


@lru_cache(maxsize=64)
def _build_rmat(m_pad: int, n_pad: int, bits: int, interpret: bool):
    tm = next(t for t in (512, 256, 128) if m_pad % t == 0)
    tn = n_pad if n_pad <= 1024 else next(
        t for t in (1024, 512, 256) if n_pad % t == 0)
    gm, gn = m_pad // tm, n_pad // tn
    w = tn // 2 if bits == 4 else tn
    call = pl.pallas_call(
        partial(_rmat_kernel, tn=tn, bits=bits),
        grid=(gm, gn),
        in_specs=[
            pl.BlockSpec((tm, w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm // BLOCK, tn // BLOCK),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=interpret,
    )
    return call, tm, tn


def restore_mat_pallas(q) -> QMat32:
    """QMat4/QMat8 -> QMat32 via one fused dequant pass."""
    bits = q.bits
    m_pad, n_pad = q.rows_pad, q.cols_pad
    call, tm, tn = _build_rmat(m_pad, n_pad, bits, pallas_interpret())
    # scale tiles regrouped to the (gm, gn, tm/64, tn/64) block view the
    # kernel's index map expects (inverse of quantize_mat_pallas's reshape)
    ms = (q.scales / QMAX[bits]).astype(jnp.float32)
    s4 = (ms.reshape(m_pad // tm, tm // BLOCK,
                     n_pad // tn, tn // BLOCK)
          .transpose(0, 2, 1, 3))
    out = call(q.codes, s4)
    return QMat32(values=out, rows=q.rows, cols=q.cols)


def restore_mat_pallas_eligible(q) -> bool:
    if not isinstance(q, (QMat4, QMat8)):
        return False
    m_pad, n_pad = q.rows_pad, q.cols_pad
    if m_pad % 128 or n_pad % 128:
        return False
    if n_pad > 1024 and all(n_pad % t for t in (1024, 512, 256)):
        return False
    return True
