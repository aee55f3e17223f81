"""Measurement-only Pallas probes (never on a production path).

``dma_probe_call`` streams a packed matrix through the SAME
(TM, KA)-tile BlockSpec/grid pipeline as the fused MVM kernel, with one
8x128 touch per tile and no matmuls — the "same-grid DMA-only
reference" of doc/results/mvm_ablation_r2.md §2.  bench.py measures it
every run so the headline metric can report percent-of-ACHIEVABLE
stream rate alongside percent-of-spec (VERDICT r2 weak #1d): the
819 GB/s spec is not reachable for this access pattern (~740 GB/s
measured, geometry-independent), and the probe pins that ceiling in
the same session as the kernel measurement.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret


def _probe_kernel(a_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # one 8x128 touch: the block DMA moves the whole (TM, KA) tile into
    # VMEM regardless; the touch just keeps the dataflow live
    acc_ref[:] += a_ref[:8, :128].astype(jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:]


@lru_cache(maxsize=16)
def _build_probe(m_pad: int, ka_total: int, tm: int, ka: int,
                 interpret: bool):
    gm, gk = m_pad // tm, ka_total // ka
    return pl.pallas_call(
        _probe_kernel,
        grid=(gm, gk),
        in_specs=[pl.BlockSpec((tm, ka), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gm, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _salted_probe_kernel(salt_ref, a_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = salt_ref[:]

    acc_ref[:] += a_ref[:8, :128].astype(jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:]


@lru_cache(maxsize=16)
def _build_salted_probe(m_total: int, ka_total: int, tm: int, ka: int,
                        interpret: bool):
    gm, gk = m_total // tm, ka_total // ka
    return pl.pallas_call(
        _salted_probe_kernel,
        grid=(gm, gk),
        in_specs=[pl.BlockSpec((8, 128), lambda i, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tm, ka), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gm, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def dma_probe_stream(qA, ring_bytes: int = 512 << 20):
    """-> (chain fn maker, bytes/step, slabs p): HBM-honest stream probe
    for SMALL matrices at the shipped kernel's tile geometry.

    ``dma_probe_call`` carries the codes buffer to keep the chain
    dependent — but a small codes array (e.g. a solver leg's 1-4 MB)
    fits the 128 MiB VMEM, XLA pins the carry there, and the "DMA probe"
    measures no HBM traffic at all (two round-3 floor-probe sessions
    produced pure-jitter negative diffs this way).  This variant stacks
    the codes to >= ring_bytes along rows — same (TM, KA) BlockSpec tile
    pipeline, a grid p x larger — and threads the chain dependency
    through a tiny (8, 128) f32 salt input instead of the codes, so the
    big buffer stays loop-invariant in HBM with no per-step copy.
    Per-slab stream time = diff / p."""
    from .mvm import _pick_geometry
    mode = "4x4" if qA.bits == 4 else "8x8"
    tm, tk = _pick_geometry(qA.rows_pad, qA.cols_pad, mode)
    ka = tk // 2 if qA.bits == 4 else tk
    m_pad, ka_total = qA.codes.shape
    p = max(1, -(-ring_bytes // qA.codes.nbytes))
    stacked = jnp.tile(qA.codes, (p, 1))
    call = _build_salted_probe(p * m_pad, ka_total, tm, ka,
                               pallas_interpret())

    def make(iters):
        @jax.jit
        def g(salt, codes):
            def body(i, carry):
                salt, s = carry
                o = call(salt, codes)
                return (salt + o[0] * 1e-30, s + o[0, 0, 0] * 1e-30)
            (_, s) = jax.lax.fori_loop(
                0, iters, body, (salt, jnp.float32(0)))
            return s
        salt0 = jnp.zeros((8, 128), jnp.float32)
        return lambda: float(g(salt0, stacked))
    return make, stacked.nbytes, p


def launch_probe():
    """-> chain fn maker for a minimal salted pallas launch (one (8, 128)
    tile, grid (1, 1), VMEM-resident operands): per-step diff = the
    fixed pallas launch overhead with ~zero DMA, the other term of the
    small-problem floor model (doc/results/iht_small_r3.md)."""
    codes = jnp.ones((8, 128), jnp.int8)
    call = _build_salted_probe(8, 128, 8, 128, pallas_interpret())

    def make(iters):
        @jax.jit
        def g(salt, codes):
            def body(i, carry):
                salt, s = carry
                o = call(salt, codes)
                return (salt + o[0] * 1e-30, s + o[0, 0, 0] * 1e-30)
            (_, s) = jax.lax.fori_loop(
                0, iters, body, (salt, jnp.float32(0)))
            return s
        salt0 = jnp.zeros((8, 128), jnp.float32)
        return lambda: float(g(salt0, codes))
    return make


def dma_probe_call(qA):
    """-> (jitted chain fn maker, bytes_streamed).

    ``make(iters)`` returns a jitted g(codes) running an iters-long
    dependent chain of full-matrix DMA-only streams (the carried in-place
    one-byte update keeps XLA from hoisting the loop-invariant call).
    Uses the shipped fused kernel's own geometry for qA's shape.
    """
    from .mvm import _pick_geometry
    mode = "4x4" if qA.bits == 4 else "8x8"
    tm, tk = _pick_geometry(qA.rows_pad, qA.cols_pad, mode)
    ka = tk // 2 if qA.bits == 4 else tk
    m_pad, ka_total = qA.codes.shape
    call = _build_probe(m_pad, ka_total, tm, ka, pallas_interpret())

    def make(iters):
        @jax.jit
        def g(codes):
            def body(i, carry):
                c, s = carry
                c = c.at[0, 0].add(jnp.int8(1)
                                   + (s * 1e-30).astype(jnp.int8))
                o = call(c)
                return (c, s + o[0, 0, 0] * 1e-30)
            _, s = jax.lax.fori_loop(0, iters, body,
                                     (codes, jnp.float32(0)))
            return s
        return lambda: float(g(qA.codes))
    return make, qA.codes.nbytes
