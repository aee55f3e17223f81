"""Quantized linear-algebra ops (XLA paths; Pallas overrides the TPU hot
paths via clover_tpu.kernels)."""

from .axpy import scale_and_add
from .dot import dot
from .mvm import mvm, mvm_f32
from .quantize import (
    quantize, quantize_mat, quantize_vec, restore, restore_mat, restore_vec,
)
from .threshold import threshold
from .transpose import transpose

__all__ = [
    "quantize", "quantize_vec", "quantize_mat",
    "restore", "restore_vec", "restore_mat",
    "dot", "scale_and_add", "mvm", "mvm_f32", "threshold", "transpose",
]
