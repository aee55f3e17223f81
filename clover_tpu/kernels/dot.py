"""Pallas quantized dot kernels (reference: CloverVector4.h:1095-1191,
CloverVector8.h:911-977 — the `maddubs` blocked dot, and the reference's
FIRST headline benchmark: 4-bit dot up to 9.56x over fp32).

TPU-native design (measured best of the alternatives, r2 e7 ablations):
whole-tile ELEMENTWISE pipeline at full lane width — 1024-lane int8
tiles, one bitwise-AND per nibble plane, direct int8->f32 converts
(measured ~free on the VPU), one f32 multiply per plane; per-block sums
run on the MXU as PLAIN bf16 0/1-indicator matmuls with f32
accumulation — exact, because the products are integers within bf16's
mantissa (|P| <= 98 for 4-bit; 8-bit splits P = 256A + B first) and
6x cheaper than the HIGHEST-precision f32 matmul used before.
For packed 4-bit (byte = 16*hi + lo+8):

    (p & 0xF0) as int8 = 16*h  ->  (hu*hv)/256 = h_u*h_v   exactly
    (p & 15) - 8.0     = lo    ->  lu*lv                    exactly

Alternatives measured slower on the v5e: diag-of-NT-matmuls (the MXU
does the products but extracting the diagonal costs ~3*C VPU int32 ops
per C-block chunk — 0.35 ms vs 0.067 ms at n=16M 4-bit); per-block
64-lane slice pipelines (4x lane-padding waste); elementwise int32
widening (sublane relayout bound).

Scales stream as (rows, blocks/row) grids matching the code tiles (a
(blocks, 1) layout degrades the DMA ~100x — measured).  Per-block sums
are EXACT int32-valued f32 (products <= 2^14, block sums < 2^24); only
the final f32 scale-combine order differs from the golden oracle (its
own validation allows |delta| <= 0.02 for reordered accumulation,
test/validate/02_vector.cpp:280-283).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QVec4, QVec8
from .dispatch import pallas_interpret

HALF = BLOCK // 2
# Tile rows per grid step.  r2 picked 1024 ("within 1% of 2048") under
# the codes-carry protocol, whose per-step copy hid geometry entirely;
# the corrected scales-only sweep (doc/results/dot_notes_r3.md table)
# shows rt=1024 is the WORST 4-bit tile: rt2048 wins 626 -> 808 GB/s at
# 2^24 and 569 -> 707 at 2^25, and never lost for 8-bit (543 vs 529).
RT_CAP = {4: 2048, 8: 2048}


def _block_indicator(w: int, nbpr: int):
    """(w*nbpr, nbpr) bf16 0/1: column b selects lanes [b*w, (b+1)*w).

    bf16 is EXACT here: every product is P*{0,1} with P an integer that
    fits bf16's 8-bit mantissa, and the MXU accumulates in f32."""
    r = jax.lax.broadcasted_iota(jnp.int32, (w * nbpr, nbpr), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (w * nbpr, nbpr), 1)
    return jnp.where(r // w == c, 1.0, 0.0).astype(jnp.bfloat16)


def _dot4_kernel(u_ref, v_ref, us_ref, vs_ref, out_ref, acc_ref, *, nbpr):
    """Measured design (v5e e7 ablations): int8->f32 converts are ~free;
    the cost drivers are full-tile f32 passes and the block-sum matmul.
    P is integer-valued with |P| <= 98 < 2^8, so it converts to bf16
    EXACTLY and the block sums run as one PLAIN bf16 MXU matmul with f32
    accumulation (6x cheaper than the HIGHEST-precision f32 matmul this
    kernel used before; still bit-exact int block sums < 2^24).

    The per-step partial stays a WHOLE-TILE (RT, nbpr) VMEM accumulate;
    the scalar reduce runs ONCE at the last step.  (A per-step
    ``acc += jnp.sum(...)`` serializes a ~us-latency cross-lane reduce
    into every grid step — the r2 log's 8-bit collapse at n=2^25, where
    32 steps stacked 32 such reduces.)"""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pu, pv = u_ref[:], v_ref[:]                      # (RT, 32*nbpr) int8
    hu = jnp.bitwise_and(pu, jnp.int8(-16)).astype(jnp.float32)
    hv = jnp.bitwise_and(pv, jnp.int8(-16)).astype(jnp.float32)
    lu = jnp.bitwise_and(pu, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
    lv = jnp.bitwise_and(pv, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
    P = hu * hv * (1.0 / 256.0) + lu * lv            # exact int, |P|<=98
    bs = jax.lax.dot(P.astype(jnp.bfloat16), _block_indicator(HALF, nbpr),
                     preferred_element_type=jnp.float32)    # (RT, nbpr)
    comb = us_ref[:] * vs_ref[:] * (1.0 / 49.0)
    acc_ref[:] += bs * comb

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = jnp.sum(acc_ref[:])


def _dot8_kernel(u_ref, v_ref, us_ref, vs_ref, out_ref, acc_ref, *, nbpr):
    """8-bit products reach 127^2 = 16129 (> bf16's exact-integer range),
    so P is split as P = 256*A + B with |A| < 64 and 0 <= B < 256 — both
    bf16-exact — and the block sums come from two plain bf16 matmuls
    recombined in f32 (exact: sums < 2^24).  Whole-tile accumulate, one
    final reduce (see _dot4_kernel)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    P = u_ref[:].astype(jnp.float32) * v_ref[:].astype(jnp.float32)
    A = jnp.floor(P * (1.0 / 256.0))
    B = P - 256.0 * A
    E = _block_indicator(BLOCK, nbpr)
    bsA = jax.lax.dot(A.astype(jnp.bfloat16), E,
                      preferred_element_type=jnp.float32)
    bsB = jax.lax.dot(B.astype(jnp.bfloat16), E,
                      preferred_element_type=jnp.float32)
    bs = 256.0 * bsA + bsB                           # (RT, nbpr) exact
    comb = us_ref[:] * vs_ref[:] * (1.0 / (127.0 * 127.0))
    acc_ref[:] += bs * comb

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = jnp.sum(acc_ref[:])


@lru_cache(maxsize=64)
def _geometry(bits: int, nb_total: int):
    """(nbpr, rows, rt) tiling for nb_total blocks, or None when no
    feasible tiling exists (the dispatch then falls back to the XLA
    path instead of crashing — e.g. nb_total = 4098 has no row-tile
    divisor in the candidate list)."""
    w = HALF if bits == 4 else BLOCK
    nbpr = next(c for c in (1024 // w, 512 // w, 256 // w, 128 // w, 1)
                if nb_total % c == 0)
    rows = nb_total // nbpr
    cap = RT_CAP[bits]
    rt = next((r for r in (cap, 1024, 512, 256, 128, 64, 32, 16, 8, rows)
               if r <= cap and rows % r == 0), None)
    if rt is None:
        # largest sublane-aligned divisor of rows within the cap (Mosaic
        # block shapes need rt % 8 == 0 unless rt == rows).
        rt = next((r for r in range(cap - cap % 8, 7, -8)
                   if rows % r == 0), None)
        if rt is None:
            return None
    return nbpr, rows, rt


@lru_cache(maxsize=64)
def _build(bits: int, nb_total: int, interpret: bool):
    w = HALF if bits == 4 else BLOCK
    nbpr, rows, rt = _geometry(bits, nb_total)
    cspec = pl.BlockSpec((rt, nbpr * w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((rt, nbpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_dot4_kernel if bits == 4 else _dot8_kernel, nbpr=nbpr),
        grid=(rows // rt,),
        in_specs=[cspec, cspec, sspec, sspec],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rt, nbpr), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    ), rows, nbpr


def dot_pallas(u, v) -> jax.Array:
    """Scalar f32 dot of two same-precision quantized vectors."""
    bits = u.bits
    nb = u.length_pad // BLOCK
    w = HALF if bits == 4 else BLOCK
    call, rows, nbpr = _build(bits, nb, pallas_interpret())
    out = call(u.codes.reshape(rows, nbpr * w),
               v.codes.reshape(rows, nbpr * w),
               u.scales.reshape(rows, nbpr), v.scales.reshape(rows, nbpr))
    return out[0, 0]


def dot_pallas_eligible(u, v) -> bool:
    return (type(u) is type(v) and isinstance(u, (QVec4, QVec8))
            and u.length_pad == v.length_pad
            and _geometry(u.bits, u.length_pad // BLOCK) is not None)
