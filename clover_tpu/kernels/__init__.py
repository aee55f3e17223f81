"""Pallas TPU kernels: the hot compute paths of the framework.

These re-create, TPU-natively, the reference's AVX2 kernel mechanisms
(SURVEY §2.2): the fused MVM with output requantization
(CloverMatrix4.h:777-1083), blocked quantized dot semantics
(CloverVector4.h:1095-1191), and stochastic-rounding quantization
(CloverVector4.h:605-805) — designed for the MXU/VPU and HBM streaming,
not translated from the intrinsics.

Dispatch policy: kernels engage on the TPU backend (or everywhere when
``CLOVER_PALLAS=1``); ``PALLAS_INTERPRET=1`` runs them in interpreter mode
so the CPU test mesh can validate their numerics.  The pure-XLA paths in
:mod:`clover_tpu.ops` remain the portable fallback.
"""

from .dispatch import pallas_enabled, pallas_interpret
from .mvm import (
    mat4_i4_stream, mvm_axpy_pallas, mvm_axpy_pallas_eligible,
    mvm_i4_enabled, mvm_pallas, mvm_pallas_eligible, mvm_pallas_f32,
)

__all__ = [
    "pallas_enabled", "pallas_interpret",
    "mat4_i4_stream", "mvm_axpy_pallas", "mvm_axpy_pallas_eligible",
    "mvm_i4_enabled", "mvm_pallas", "mvm_pallas_eligible",
    "mvm_pallas_f32",
]
