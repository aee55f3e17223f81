"""Matrix-vector multiply, including the fused output-requantization MVM
that is the reference's defining performance feature
(CloverMatrix4.h:777-1083 pure 4-bit, :1093-1449 mixed 4x8, :1451-1547
4x32; CloverMatrix8.h:481-1299; CloverMatrix16.h:98-382).

Semantics: y = A @ x where per 64-row band the f32 dot results are absmax'd
and requantized with stochastic rounding, never materializing the full f32
result in HBM (the Pallas kernel; this XLA path materializes it on-chip but
keeps identical math).

The int paths accumulate code products exactly in int32 per 64-block, then
combine with ``(sA/qA) * (sx/qx)`` per tile — bit-faithful to the
reference's ``maddubs``-based blocked dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import (
    BLOCK, QMat4, QMat8, QMat16, QMat32, QVec4, QVec8, QVec16, QVec32,
    unpack_nibbles,
)
from . import _core
from .quantize import quantize_vec, restore_mat, restore_vec


def _mat_codes(A) -> jax.Array:
    return unpack_nibbles(A.codes) if isinstance(A, QMat4) else A.codes


def _vec_codes(x) -> jax.Array:
    return unpack_nibbles(x.codes) if isinstance(x, QVec4) else x.codes


def _blocked_int_mvm_f32(A, x) -> jax.Array:
    """f32 result vector of a quantized-int MVM, before requantization.

    Exact int32 per-block accumulation; per-tile f32 scale combine.
    """
    qa = _core.qmax(A.bits)
    qx = _core.qmax(x.bits)
    m = A.rows_pad
    nb = A.cols_pad // BLOCK
    a3 = _mat_codes(A).reshape(m, nb, BLOCK)
    x2 = _vec_codes(x).reshape(nb, BLOCK)
    acc = jnp.einsum("ibk,bk->ib", a3, x2,
                     preferred_element_type=jnp.int32)      # (m, nb) exact
    comb = (jnp.repeat(A.scales / qa, BLOCK, axis=0)
            * (x.scales / qx)[None, :])                     # (m, nb) f32
    return jnp.sum(comb * acc.astype(jnp.float32), axis=1)


def mvm_f32(A, x) -> jax.Array:
    """y = A @ x as a padded f32 array (no output requantization).

    This is the building block the sharded path psums BEFORE requantizing,
    so the band absmax sees globally-reduced values.
    """
    if isinstance(A, (QMat4, QMat8)) and isinstance(x, (QVec4, QVec8)):
        return _blocked_int_mvm_f32(A, x)
    if isinstance(A, (QMat4, QMat8)) and isinstance(x, QVec32):
        # dequant-on-the-fly x32 path (CloverMatrix4.h:1451-1547): blocked
        # MXU GEMM with the scale combine folded — no restored A in HBM.
        from .gemm import gemm_f32
        return gemm_f32(A, x.values[:, None])[:, 0]
    # fp paths: dequantize and use the MXU directly.
    af = restore_mat(A).values if not isinstance(A, QMat32) else A.values
    xf = restore_vec(x).values if not isinstance(x, QVec32) else x.values
    # HIGHEST: keep true f32 matvec mantissas (reference: MKL sgemv /
    # f16-to-f32 FMA accumulation); a matvec is HBM-bound so this is free.
    return jnp.dot(af, xf, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def mvm_f32_fast(A, x, a_i4=None) -> jax.Array:
    """Like :func:`mvm_f32` but dispatched to the fused Pallas kernel's
    f32-output mode on TPU (kernels/mvm.py mvm_pallas_f32).  The sharded
    path (parallel/ops.mvm_psum) uses this per shard so real multi-chip
    MVMs run the fused kernel, not the portable XLA path; ``mvm_f32``
    itself stays pure-XLA because the validation harness uses it as the
    independent reference implementation.  ``a_i4``: optional prepared
    int4 stream view (kernels.mat4_i4_stream) for the 4x4 path."""
    from ..kernels import mvm_pallas_eligible, mvm_pallas_f32, pallas_enabled
    if pallas_enabled() and mvm_pallas_eligible(A, x):
        return mvm_pallas_f32(A, x, a_i4=a_i4)
    return mvm_f32(A, x)


def mvm(A, x, key=None, a_i4=None):
    """Fused MVM: y = requantize_by_band(A @ x).

    Output precision follows the reference dispatch table:
    (4,4)->4, (8,8)->8, (4,8)->8, (16,16)->16, (*,32)->32, (32,32)->32.

    On TPU the quantized-int combinations run as a single fused Pallas
    kernel (clover_tpu/kernels/mvm.py); everywhere else (and for fp
    precisions) the portable XLA path below is used.  For repeated 4x4
    MVMs against the same matrix inside one jit, pass
    ``a_i4=kernels.mat4_i4_stream(A)`` (hoisted out of the loop by XLA)
    to ride the single-int4-matmul kernel — bit-identical output, MXU
    floor halved.
    """
    from ..kernels import mvm_pallas, mvm_pallas_eligible, pallas_enabled
    if pallas_enabled() and mvm_pallas_eligible(A, x):
        return mvm_pallas(A, x, key, a_i4=a_i4)
    y32 = mvm_f32(A, x)
    out_bits = _out_bits(A, x)
    return _requant_output(y32, A.rows, out_bits, key)


def mvm_axpy(A, x, u, alpha, key_mvm=None, key_axpy=None, a_i4=None):
    """r = scale_and_add(u, mvm(A, x), alpha) with the AXPY fused behind
    the MVM's band requant on TPU (one launch instead of two; the
    intermediate quantized MVM result never touches HBM).  Deterministic
    mode is bit-identical to the unfused mvm_pallas -> axpy_pallas
    kernel sequence (and within 1 output LSB of the portable XLA
    sequence — fma contraction, the AXPY kernel's own tolerance); with
    SR on, the noise stream assignment differs between the fused and
    unfused paths (both are valid SR draws).

    This is the solver hot-loop form of the reference's back-to-back
    mvm_parallel + scaleAndAdd_parallel (test/accuracy/02_iht_accuracy.h:
    79-95)."""
    from ..kernels import (
        mvm_axpy_pallas, mvm_axpy_pallas_eligible, pallas_enabled)
    if pallas_enabled() and mvm_axpy_pallas_eligible(A, x, u):
        return mvm_axpy_pallas(A, x, u, alpha, key_mvm, key_axpy,
                               a_i4=a_i4)
    from .axpy import scale_and_add
    return scale_and_add(u, mvm(A, x, key=key_mvm, a_i4=a_i4), alpha,
                         key=key_axpy)


def _out_bits(A, x) -> int:
    if isinstance(x, QVec32):
        return 32
    if isinstance(A, QMat4) and isinstance(x, QVec4):
        return 4
    if isinstance(A, QMat4) and isinstance(x, QVec8):
        return 8
    if isinstance(A, QMat8) and isinstance(x, QVec8):
        return 8
    if isinstance(A, QMat16) and isinstance(x, QVec16):
        return 16
    if isinstance(A, QMat32):
        return 32
    raise TypeError(f"unsupported MVM combination {type(A)} x {type(x)}")


def _requant_output(y32: jax.Array, rows: int, out_bits: int, key):
    if out_bits == 32:
        return QVec32(values=y32, length=rows)
    if out_bits == 16:
        return QVec16(values=_core.f16_rounded(y32), length=rows)
    # 64-element output blocks coincide with the 64-row bands, so plain
    # vector quantization IS the band requantization of the reference.
    return quantize_vec(QVec32(values=y32, length=rows), out_bits, key)
