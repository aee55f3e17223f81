"""Round-5 experiment: single-int4-matmul 4x4 MVM kernel prototype.

Motivation (VERDICT r4 next-round #1): the shipped 4x4 kernel pays TWO
int8 MXU issue-slots per packed byte (hi/lo plane matmuls) — an MXU
floor that sits AT the DMA floor, so degraded-tenancy compute contention
shows up 1:1 in wall time (8-bit holds 90.8% of spec in the same session
where 4-bit records 81%).  Measured this session: the v5e MXU runs int4
matmuls at 2x the int8 element rate (int4 contraction of 2K elements ==
int8 of K: ratio 1.013; same-K int4 = 0.516x).  That halves the 4-bit
MXU floor IF the packed stream can be consumed as an int4 array.

Design under test: store A's codes as a jnp.int4 array in natural
element order (one-time XLA relayout of the packed int8 codes, cached
per matrix like the reference's materialized PhiT); ONE int4 matmul
against a block-diagonal int4 weight built in-kernel from x's packed
codes; scale-combine constant 1/(7*7) (vs the packed kernel's
1/(7*7*16) — same mantissa, power-of-2 exponent shift, so accumulation
is bit-identical).  No int8 AND, no colsum correction, no plane add.

Verdicts sought:
  (a) bit-identical outputs vs the shipped kernel (deterministic + SR);
  (b) wall time vs the shipped kernel at n=16384 / 32768;
  (c) same-session DMA floor for context (is int4 DMA at byte rate?).
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import lru_cache, partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clover_tpu.utils.compcache import enable as _cc
_cc()
import clover_tpu as ct
from clover_tpu.formats import BLOCK, QVec4, unpack_nibbles
from clover_tpu.harness.timing import chain_time, gbs
from clover_tpu.kernels.mvm import (_combe, _epilogue, _pick_geometry,
                                    _prep_call_args)
from clover_tpu.kernels.dispatch import seed_from
from clover_tpu.kernels.probes import dma_probe_call

assert jax.default_backend() == "tpu"


def _block_diag_i4(codes, nb: int, width: int):
    """int32 (nb, width) codes -> (nb*width, nb) block-diagonal int4."""
    row_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (nb, width, nb), 2)
    cb = jax.lax.broadcast_in_dim(codes, (nb, width, nb), (0, 1))
    w3 = jnp.where(row_b == col_b, cb, 0)
    return w3.reshape(nb * width, nb).astype(jnp.int4)


def _kernel_4x4_i4(seed_ref, a_ref, xc_ref, ascales_ref, xscales_ref,
                   ycodes_ref, yscales_ref, acc_ref, w4_c, *,
                   nb, tm, out_bits, noise, flat):
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        xp = xc_ref[:].astype(jnp.int32)
        xhi = jax.lax.shift_right_arithmetic(xp, 4)
        xlo = jnp.bitwise_and(xp, 15) - 8
        ecodes = jnp.concatenate([xlo, xhi], axis=1)      # element order
        w4_c[k] = _block_diag_i4(ecodes, nb, BLOCK)

    dn = (((1,), (0,)), ((), ()))
    mm = jax.lax.dot_general(a_ref[:], w4_c[k], dn,
                             preferred_element_type=jnp.int32)
    t = mm.astype(jnp.float32)
    combe = _combe(ascales_ref, xscales_ref, 1.0 / (7.0 * 7.0), flat)
    acc_ref[:] += (t * combe).reshape(tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        _epilogue(seed_ref, None, None, None, ycodes_ref,
                  yscales_ref, acc_ref, out_bits, noise, i)


@lru_cache(maxsize=16)
def _build_call_i4(m_pad: int, n_pad: int, noise: bool):
    tm, tk = _pick_geometry(m_pad, n_pad, "4x4")
    nb = tk // BLOCK
    gm, gk = m_pad // tm, n_pad // tk
    pck = BLOCK // 2

    a_spec = pl.BlockSpec((tm, tk), lambda i, k, *_: (i, k),
                          memory_space=pltpu.VMEM)
    flat = ((gk == 1) or (nb % 128 == 0)) and (
        (tm // BLOCK) % 8 == 0 or gm == 1)
    assert flat, "prototype covers the flat-scales path only"
    ascales_spec = pl.BlockSpec((tm // BLOCK, nb), lambda i, k, *_: (i, k),
                                memory_space=pltpu.VMEM)
    xscales_spec = pl.BlockSpec((1, nb), lambda i, k, *_: (0, k),
                                memory_space=pltpu.VMEM)
    xc_spec = pl.BlockSpec((nb, BLOCK // 2), lambda i, k, *_: (k, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, tm // BLOCK, pck), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm // BLOCK, 1), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((gm, tm // BLOCK, pck), jnp.int8),
        jax.ShapeDtypeStruct((gm, tm // BLOCK, 1), jnp.float32),
    ]
    kernel = partial(_kernel_4x4_i4, nb=nb, tm=tm, out_bits=4,
                     noise=noise, flat=flat)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gm, gk),
            in_specs=[a_spec, xc_spec, ascales_spec, xscales_spec],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((tm // BLOCK, BLOCK, nb), jnp.float32),
                pltpu.VMEM((gk, tk, nb), jnp.int4),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call, tm, tk, flat


def a_i4_view(A):
    """Packed codes -> natural-element-order int4 array (one-time prep)."""
    return unpack_nibbles(A.codes).astype(jnp.int4)


def mvm_i4(a4, A, x, key=None):
    seed, noise = seed_from(key)
    call, tm, tk, flat = _build_call_i4(A.rows_pad, A.cols_pad, noise)
    xc, ascales4, xscales2 = _prep_call_args(A, x, "4x4", tm, tk, flat)
    yc, ys = call(seed, a4, xc, ascales4, xscales2)
    return QVec4(codes=yc.reshape(-1), scales=ys.reshape(-1), length=A.rows)


def main():
    key = jax.random.PRNGKey(0)

    # -- (a) bit-exactness, deterministic + SR, n=2048 (fast) ------------
    for n in (2048,):
        m = n
        A = jax.random.uniform(key, (m, n), jnp.float32, -1.0, 1.0)
        x = jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                               jnp.float32, -1.0, 1.0)
        qA = ct.quantize(A, 4); qx = ct.quantize(x, 4)

        @jax.jit
        def both(qA, qx, seed):
            a4 = a_i4_view(qA)
            r_ref_d = ct.mvm(qA, qx)
            r_i4_d = mvm_i4(a4, qA, qx)
            r_ref_s = ct.mvm(qA, qx, key=seed)
            r_i4_s = mvm_i4(a4, qA, qx, key=seed)
            return r_ref_d, r_i4_d, r_ref_s, r_i4_s

        seed = jnp.asarray([987654], jnp.int32)
        rd, id_, rs, is_ = jax.tree.map(np.asarray, both(qA, qx, seed))
        print(f"n={n} det  codes equal: {np.array_equal(rd.codes, id_.codes)}"
              f"  scales equal: {np.array_equal(rd.scales, id_.scales)}")
        print(f"n={n} SR   codes equal: {np.array_equal(rs.codes, is_.codes)}"
              f"  scales equal: {np.array_equal(rs.scales, is_.scales)}",
              flush=True)

    # -- (b) wall time vs shipped kernel -------------------------------
    for N in (16384, 32768):
        A = jax.random.uniform(key, (N, N), jnp.float32, -1.0, 1.0)
        x = jax.random.uniform(jax.random.fold_in(key, 1), (N,),
                               jnp.float32, -1.0, 1.0)
        qA = ct.quantize(A, 4); qx = ct.quantize(x, 4)
        del A

        def make_ref(iters):
            @jax.jit
            def g(qA, qx):
                def body(i, x):
                    return ct.mvm(qA, x)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
            return lambda: float(g(qA, qx))

        def make_i4(iters):
            @jax.jit
            def g(qA, qx):
                a4 = a_i4_view(qA)      # hoisted out of the loop by XLA
                def body(i, x):
                    return mvm_i4(a4, qA, x)
                return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
            return lambda: float(g(qA, qx))

        nbytes = qA.nbytes
        probe_make, probe_bytes = dma_probe_call(qA)
        for rnd in range(2):
            tr = chain_time(make_ref, k1=1, k2=65)
            ti = chain_time(make_i4, k1=1, k2=65)
            td = chain_time(probe_make, k1=1, k2=65)
            print(f"n={N} r{rnd}: shipped {tr*1e3:.3f} ms "
                  f"({gbs(nbytes, tr):.0f} GB/s, {gbs(nbytes, tr)/8.19:.1f}%)"
                  f"   i4 {ti*1e3:.3f} ms ({gbs(nbytes, ti):.0f} GB/s, "
                  f"{gbs(nbytes, ti)/8.19:.1f}%)   dma {td*1e3:.3f} ms "
                  f"({gbs(nbytes, td):.0f} GB/s)   i4/shipped {ti/tr:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
