"""Batched fused quantized MVM: B vectors against one matrix stream.

The reference is strictly matrix-VECTOR (one RHS per call — an AVX2-era
design; CloverMatrix4.h:777).  On TPU the matrix stream is the cost, so
a serving batch should ride ONE pass of the packed matrix: this kernel
generalizes kernels/mvm.py's block-diagonal int8-MXU formulation by
concatenating each vector's block-diagonal weights along the matmul's
output lanes — the (TM, KA) @ (KA, B*NB) matmuls produce every vector's
per-(row, block) partial sums from a single HBM traversal of A.

Why this amortizes: MXU cost scales with the concatenated output
lanes B*NB = B*TK/64, so SHRINKING the k-tile as the batch grows keeps
the matmuls near one 128-lane MXU pass however large the batch — the
matrix DMA (the single-vector bottleneck) is paid once.  Measured v5e
throughput at n=16384 vs B separate mvm_pallas calls: 4x4 1.7x / 2.7x /
3.9x / 4.8x at B = 2/4/8/16; 8x8 1.9x / 3.3x / 5.2x / 7.0x (22.8k and
19.4k mvm/s at B=16).

Numerics: the INTEGER accumulation is identical to per-vector
mvm_pallas — each vector's lanes are disjoint matmul columns (exact
int32 int8-MXU sums; verified bit-exact with the scale-combine
disabled).  The f32 scale-combine is written per vector in the same
expression shape as the single kernel, but XLA's excess-precision
fusion may group the multiply chain differently across programs, so
deterministic outputs agree with B separate mvm_pallas(key=None) calls
to within 1 output LSB (band scales to 1 ulp) — the same allowance the
single kernel gets vs the XLA path.  SR uses seed ``base + i*B + j``
per vector.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import BLOCK, QVec4, QVec8
from .dispatch import pallas_interpret, seed_from
from .mvm import (HALF, QMAX, _band_sr, _block_diag, _block_diag_i4,
                  _mode, _unoise)

MAX_BATCH = 32
# Matmul output lanes to aim for: MXU cost scales with B*NB (= B*TK/64),
# so the batch gets cheaper per vector as TK shrinks; 128 lanes (one
# full MXU pass) measured best on v5e at every B — 256 doubles the MXU
# time for nothing (4x4 B=2 at n=16K: 8.0k vs 5.0k mvm/s).
_LANE_TARGET = 128


def _pick_geometry_b(m_pad: int, n_pad: int, mode: str, b: int):
    """(TM, TK) under batched VMEM budgets, with TK chosen so the
    concatenated matmul output stays near _LANE_TARGET lanes: A tile
    <= 4 MB, weight cache (gk, ka, B*NB) <= 8 MB, accumulator <= 8 MB."""
    pack = 2 if mode in ("4x4", "4x8") else 1
    tm = next((t for t in (1024, 512, 2048, 256, 128) if m_pad % t == 0),
              None)
    if tm is None:
        return None

    def ok(tk):
        if n_pad % tk or (tk % 256 and tk != n_pad):
            return False
        ka, nb = tk // pack, tk // BLOCK
        if tm * ka > (4 << 20):                       # A tile
            return False
        if (n_pad // tk) * ka * b * nb > (8 << 20):   # W cache
            return False
        if tm * b * nb * 4 > (8 << 20):               # accumulator
            return False
        return True

    # largest tk with b*nb <= _LANE_TARGET, i.e. tk <= target*64/b;
    # fall back upward if nothing divides
    cap = max((_LANE_TARGET * BLOCK) // b, 512)
    prefer = [t for t in (8192, 4096, 2048, 1024, 512) if t <= cap]
    rest = [t for t in (512, 1024, 2048, 4096, 8192) if t > cap]
    tk_choices = prefer + ([n_pad] if n_pad <= cap else []) + rest
    tk = next((t for t in tk_choices if ok(t)), None)
    return None if tk is None else (tm, tk)


def _acc_update(acc_ref, t, csc_ref, nb: int, tm: int, b: int):
    """t (TM, B*nb) raw block partials -> acc += t * combe, full width.

    combe lanes [j*nb, (j+1)*nb) carry vector j's ``s_A/qA * s_xj/qx``,
    PRECOMBINED on the host into a tiny (gm, gk, TM/64, B*nb) f32 input
    (~n_blocks*B*4 bytes; the matrix stream is the cost) — this keeps
    every in-kernel scale access statically 128-aligned (a dynamic
    k*nb lane slice is unprovable to Mosaic for nb < 128)."""
    combe = jnp.repeat(csc_ref[0, 0], BLOCK, axis=0)
    acc_ref[:] += (t * combe).reshape(tm // BLOCK, BLOCK, b * nb)


def _epilogue_b(seed_ref, ycodes_ref, yscales_ref, acc_ref, *,
                nb, out_bits, noise, b, i):
    if out_bits == 32:
        # f32-output mode (the sharded path's building block: per-shard
        # partials are psummed BEFORE band requant, parallel/ops.py
        # mvm_batched_psum — same pattern as kernels/mvm.py mvm_pallas_f32)
        for j in range(b):
            y2 = jnp.sum(acc_ref[:, :, j * nb:(j + 1) * nb], axis=2)
            ycodes_ref[0, :, j * BLOCK:(j + 1) * BLOCK] = y2
        yscales_ref[0] = jnp.ones_like(yscales_ref[0])
        return
    qm = QMAX[out_bits]
    pck = HALF if out_bits == 4 else BLOCK
    for j in range(b):
        y2 = jnp.sum(acc_ref[:, :, j * nb:(j + 1) * nb], axis=2)
        q, s = _band_sr(y2, qm,
                        _unoise(seed_ref[0] + i * b + j, y2.shape, noise))
        if out_bits == 4:
            cj = (16.0 * q[:, HALF:] + (q[:, :HALF] + 8.0)).astype(jnp.int8)
        else:
            cj = q.astype(jnp.int8)
        ycodes_ref[0, :, j * pck:(j + 1) * pck] = cj
        yscales_ref[0, :, j:j + 1] = s


def _kernel_4x4_b(seed_ref, a_ref, xc_ref, csc_ref,
                  ycodes_ref, yscales_ref, acc_ref, w1_c, w2_c, cs_c, *,
                  nb, tm, out_bits, noise, b):
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        whis, wmixs, css = [], [], []
        for j in range(b):
            xp = xc_ref[j].astype(jnp.int32)
            xhi = jax.lax.shift_right_arithmetic(xp, 4)
            xlo = jnp.bitwise_and(xp, 15) - 8
            whis.append(_block_diag(xhi, nb, HALF))
            wmixs.append(_block_diag(16 * xlo - xhi, nb, HALF))
            css.append(jnp.sum(xlo, axis=1,
                               keepdims=True).astype(jnp.float32).T)
        w1_c[k] = jnp.concatenate(whis, axis=1)
        w2_c[k] = jnp.concatenate(wmixs, axis=1)
        cs_c[k] = jnp.concatenate(css, axis=1)

    p = a_ref[:]
    lou = jnp.bitwise_and(p, jnp.int8(0x0F))
    dn = (((1,), (0,)), ((), ()))
    mm1 = jax.lax.dot_general(p, w1_c[k], dn,
                              preferred_element_type=jnp.int32)
    mm2 = jax.lax.dot_general(lou, w2_c[k], dn,
                              preferred_element_type=jnp.int32)
    t = (mm1 + mm2).astype(jnp.float32) - 128.0 * cs_c[k]
    _acc_update(acc_ref, t, csc_ref, nb, tm, b)

    @pl.when(k == nk - 1)
    def _():
        _epilogue_b(seed_ref, ycodes_ref, yscales_ref, acc_ref,
                    nb=nb, out_bits=out_bits, noise=noise, b=b, i=i)


def _kernel_4x8_b(seed_ref, a_ref, xc_ref, csc_ref,
                  ycodes_ref, yscales_ref, acc_ref, w1_c, w2_c, cs_c, *,
                  nb, tm, out_bits, noise, b):
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        whis, wlos, css = [], [], []
        for j in range(b):
            xj = xc_ref[j]
            whis.append(_block_diag(xj[:, HALF:], nb, HALF))
            wlos.append(_block_diag(xj[:, :HALF], nb, HALF))
            css.append(jnp.sum(xj[:, :HALF].astype(jnp.int32),
                               axis=1, keepdims=True).astype(
                                   jnp.float32).T)
        w1_c[k] = jnp.concatenate(whis, axis=1)
        w2_c[k] = jnp.concatenate(wlos, axis=1)
        cs_c[k] = jnp.concatenate(css, axis=1)

    p = a_ref[:]
    hi16 = jnp.bitwise_and(p, jnp.int8(-16))
    lou = jnp.bitwise_and(p, jnp.int8(0x0F))
    dn = (((1,), (0,)), ((), ()))
    mm_h = jax.lax.dot_general(hi16, w1_c[k], dn,
                               preferred_element_type=jnp.int32)
    mm_l = jax.lax.dot_general(lou, w2_c[k], dn,
                               preferred_element_type=jnp.int32)
    hh = jax.lax.shift_right_arithmetic(mm_h, 4)
    t = (hh + mm_l).astype(jnp.float32) - 8.0 * cs_c[k]
    _acc_update(acc_ref, t, csc_ref, nb, tm, b)

    @pl.when(k == nk - 1)
    def _():
        _epilogue_b(seed_ref, ycodes_ref, yscales_ref, acc_ref,
                    nb=nb, out_bits=out_bits, noise=noise, b=b, i=i)


def _kernel_4x4i4_b(seed_ref, a_ref, xc_ref, csc_ref,
                    ycodes_ref, yscales_ref, acc_ref, w_c, *,
                    nb, tm, out_bits, noise, b):
    """Batched 4x4 on the int4-array matrix stream (r5): one int4 MXU
    matmul per tile against the B vectors' concatenated block-diagonal
    int4 weights — half the issue slots of the two-plane int8 form,
    which binds the batched kernel at B >= 8 (the matrix DMA is
    amortized over the batch, so the matmuls are the cost).  Same
    bit-identity argument as kernels/mvm._kernel_4x4_i4 (scale constant
    1/49 vs 1/784: a power-of-two shift)."""
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        ws = []
        for j in range(b):
            xp = xc_ref[j].astype(jnp.int32)
            xhi = jax.lax.shift_right_arithmetic(xp, 4)
            xlo = jnp.bitwise_and(xp, 15) - 8
            ecodes = jnp.concatenate([xlo, xhi], axis=1)
            ws.append(_block_diag_i4(ecodes, nb, BLOCK))
        w_c[k] = jnp.concatenate(ws, axis=1)

    dn = (((1,), (0,)), ((), ()))
    mm = jax.lax.dot_general(a_ref[:], w_c[k], dn,
                             preferred_element_type=jnp.int32)
    _acc_update(acc_ref, mm.astype(jnp.float32), csc_ref, nb, tm, b)

    @pl.when(k == nk - 1)
    def _():
        _epilogue_b(seed_ref, ycodes_ref, yscales_ref, acc_ref,
                    nb=nb, out_bits=out_bits, noise=noise, b=b, i=i)


def _kernel_8x8_b(seed_ref, a_ref, xc_ref, csc_ref,
                  ycodes_ref, yscales_ref, acc_ref, w_c, *,
                  nb, tm, out_bits, noise, b):
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        w_c[k] = jnp.concatenate(
            [_block_diag(xc_ref[j], nb, BLOCK) for j in range(b)], axis=1)

    dn = (((1,), (0,)), ((), ()))
    mm = jax.lax.dot_general(a_ref[:], w_c[k], dn,
                             preferred_element_type=jnp.int32)
    _acc_update(acc_ref, mm.astype(jnp.float32), csc_ref, nb, tm, b)

    @pl.when(k == nk - 1)
    def _():
        _epilogue_b(seed_ref, ycodes_ref, yscales_ref, acc_ref,
                    nb=nb, out_bits=out_bits, noise=noise, b=b, i=i)


@lru_cache(maxsize=64)
def _build_call_b(mode: str, m_pad: int, n_pad: int, b: int,
                  out_bits: int, noise: bool, interpret: bool):
    geo_mode = "4x4" if mode == "4x4i4" else mode
    tm, tk = _pick_geometry_b(m_pad, n_pad, geo_mode, b)
    nb = tk // BLOCK
    gm, gk = m_pad // tm, n_pad // tk
    pack = 2 if mode in ("4x4", "4x8") else 1   # i4 = element width
    ka = tk // pack
    xw = HALF if mode in ("4x4", "4x4i4") else BLOCK  # x codes width
    pck = HALF if out_bits == 4 else BLOCK
    out_dtype = jnp.float32 if out_bits == 32 else jnp.int8

    in_specs = [
        pl.BlockSpec((tm, ka), lambda i, k, *_: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, nb, xw), lambda i, k, *_: (0, k, 0),
                     memory_space=pltpu.VMEM),
        # combined scales, host-precombined (legal: last dim == array's)
        pl.BlockSpec((1, 1, tm // BLOCK, b * nb),
                     lambda i, k, *_: (i, k, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, tm // BLOCK, b * pck), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm // BLOCK, b), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((gm, tm // BLOCK, b * pck), out_dtype),
        jax.ShapeDtypeStruct((gm, tm // BLOCK, b), jnp.float32),
    ]
    acc = pltpu.VMEM((tm // BLOCK, BLOCK, b * nb), jnp.float32)
    w_scr = pltpu.VMEM((gk, ka, b * nb), jnp.int8)
    cs_scr = pltpu.VMEM((gk, 1, b * nb), jnp.float32)
    core = {"4x4": _kernel_4x4_b, "4x8": _kernel_4x8_b,
            "8x8": _kernel_8x8_b, "4x4i4": _kernel_4x4i4_b}[mode]
    if mode == "4x4i4":
        scratch = [acc, pltpu.VMEM((gk, tk, b * nb), jnp.int4)]
    elif mode in ("4x4", "4x8"):
        scratch = [acc, w_scr, w_scr, cs_scr]
    else:
        scratch = [acc, w_scr]
    call = pl.pallas_call(
        partial(core, nb=nb, tm=tm, out_bits=out_bits, noise=noise, b=b),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gm, gk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, tm, tk


def mvm_batched_pallas_eligible(A, xs_leaf_shape, mode) -> bool:
    if mode is None:
        return False
    b = xs_leaf_shape[0]
    if not 2 <= b <= MAX_BATCH:
        return False
    return _pick_geometry_b(A.rows_pad, A.cols_pad, mode, b) is not None


_SCALE_CONST_B = {"4x4": 1.0 / (7.0 * 7.0 * 16.0),
                  "4x4i4": 1.0 / (7.0 * 7.0),
                  "4x8": 1.0 / (7.0 * 127.0),
                  "8x8": 1.0 / (127.0 * 127.0)}


def mvm_batched_pallas(A, xs, key=None, a_i4=None):
    """Batched fused MVM.  ``xs`` is a quantized vector container whose
    arrays carry a leading batch dimension (as stacked by serving.py /
    ops.gemm.mvm_batched); returns a container with the same leading
    batch dimension.  One matrix stream serves the whole batch.

    ``a_i4``: optional prepared kernels.mvm.mat4_i4_stream view of a
    4-bit A — the batched matmuls (the binding cost at B >= 8) run at
    the int4 MXU rate.  Only pays where the view amortizes inside one
    jit (models/batch solver scans, bench chains); per-call serving
    keeps the packed kernel (int4 cannot cross jit boundaries on this
    build and the bitcast relayout measures ~25x a stream pass)."""
    mode = _mode(A, xs)          # container types carry the mode
    assert mode is not None, (type(A), type(xs))
    out_bits = {"4x4": 4, "4x8": 8, "8x8": 8}[mode]
    use_i4 = a_i4 is not None and mode == "4x4"
    kmode = "4x4i4" if use_i4 else mode
    b = jax.tree_util.tree_leaves(xs)[0].shape[0]
    m_pad, n_pad = A.rows_pad, A.cols_pad
    seed, noise = seed_from(key)
    call, tm, tk = _build_call_b(kmode, m_pad, n_pad, b, out_bits, noise,
                                 pallas_interpret())
    nb, gm, gk = tk // BLOCK, m_pad // tm, n_pad // tk
    nb_total = n_pad // BLOCK
    xw = HALF if mode == "4x4" else BLOCK
    xc = xs.codes.reshape(b, nb_total, xw)
    # host-precombined scales (see _acc_update): ~nb_total*B*4 bytes
    const = _SCALE_CONST_B[kmode]
    asc4 = (A.scales.reshape(gm, tm // BLOCK, gk, nb)
            .transpose(0, 2, 1, 3))                    # (gm, gk, bands, nb)
    xs3 = xs.scales.reshape(b, gk, nb).transpose(1, 0, 2)    # (gk, b, nb)
    csc = (asc4[:, :, :, None, :] * xs3[None, :, None, :, :]
           * const).reshape(gm, gk, tm // BLOCK, b * nb)
    yc, ys = call(seed, a_i4 if use_i4 else A.codes, xc, csc)
    pck = HALF if out_bits == 4 else BLOCK
    # (gm, tm/64, b*pck) -> per-vector flat codes (b, m_pad_codes)
    codes = (yc.reshape(gm, tm // BLOCK, b, pck)
             .transpose(2, 0, 1, 3).reshape(b, -1))
    scales = ys.transpose(2, 0, 1).reshape(b, -1)
    out_cls = QVec4 if out_bits == 4 else QVec8
    return out_cls(codes=codes, scales=scales, length=A.rows)


def mvm_batched_pallas_f32(A, xs, a_i4=None) -> jax.Array:
    """Batched fused MVM in f32-output mode: f32[b, m_pad], no output
    requantization — the per-shard building block the sharded batched
    path psums BEFORE band requant (parallel/ops.mvm_batched_psum), the
    batched analog of kernels/mvm.mvm_pallas_f32."""
    mode = _mode(A, xs)
    assert mode is not None, (type(A), type(xs))
    use_i4 = a_i4 is not None and mode == "4x4"
    kmode = "4x4i4" if use_i4 else mode
    b = jax.tree_util.tree_leaves(xs)[0].shape[0]
    m_pad, n_pad = A.rows_pad, A.cols_pad
    seed, _ = seed_from(None)
    call, tm, tk = _build_call_b(kmode, m_pad, n_pad, b, 32, False,
                                 pallas_interpret())
    nb, gm, gk = tk // BLOCK, m_pad // tm, n_pad // tk
    nb_total = n_pad // BLOCK
    xw = HALF if mode == "4x4" else BLOCK
    xc = xs.codes.reshape(b, nb_total, xw)
    const = _SCALE_CONST_B[kmode]
    asc4 = (A.scales.reshape(gm, tm // BLOCK, gk, nb)
            .transpose(0, 2, 1, 3))
    xs3 = xs.scales.reshape(b, gk, nb).transpose(1, 0, 2)
    csc = (asc4[:, :, :, None, :] * xs3[None, :, None, :, :]
           * const).reshape(gm, gk, tm // BLOCK, b * nb)
    yv, _ = call(seed, a_i4 if use_i4 else A.codes, xc, csc)
    return (yv.reshape(gm, tm // BLOCK, b, BLOCK)
            .transpose(2, 0, 1, 3).reshape(b, -1))
