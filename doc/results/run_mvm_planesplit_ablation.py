"""Plane-split STORAGE ablation for the 4-bit fused MVM (VERDICT r1 #1a).

Variant: store the hi/lo nibble planes as two separate int8 arrays in HBM
(one full byte per 4-bit code -> 2x the packed stream) so the kernel needs
NO in-register unpack: two direct int8 matmuls, zero elementwise ops over
the matrix tiles.  This isolates whether the packed format's in-kernel
AND + mixed-weight trick costs anything vs the pure-DMA alternative.

Expectation from the r2 decomposition (mvm_ablation_r2.md): the kernel is
DMA-bound at ~740 GB/s, so doubling the stream must cost ~2x; the only
question is how much of the second matmul's MXU time hides under it.

Run on the real chip: python doc/results/run_mvm_planesplit_ablation.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import clover_tpu as ct
from clover_tpu.formats import BLOCK, QVec4
from clover_tpu.kernels.mvm import (_block_diag, _combe, _requant_write,
                                    _unpack_x4, HALF)
from clover_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

N = 16384
K1, K2 = 1, 129
REPS = 7


def _kernel_split(seed_ref, ahi_ref, alo_ref, xc_ref, ascales_ref,
                  xscales_ref, ycodes_ref, yscales_ref,
                  acc_ref, whi_c, wlo_c, *, nb, tm, flat):
    i, k = pl.program_id(0), pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        xhi, xlo = _unpack_x4(xc_ref)
        whi_c[k] = _block_diag(xhi, nb, HALF)
        wlo_c[k] = _block_diag(xlo, nb, HALF)

    dn = (((1,), (0,)), ((), ()))
    mm1 = jax.lax.dot_general(ahi_ref[:], whi_c[k], dn,
                              preferred_element_type=jnp.int32)
    mm2 = jax.lax.dot_general(alo_ref[:], wlo_c[k], dn,
                              preferred_element_type=jnp.int32)
    t = (mm1 + mm2).astype(jnp.float32)
    combe = _combe(ascales_ref, xscales_ref, 1.0 / 49.0, flat)
    acc_ref[:] += (t * combe).reshape(tm // BLOCK, BLOCK, -1)

    @pl.when(k == nk - 1)
    def _():
        y2 = jnp.sum(acc_ref[:], axis=2)
        _requant_write(seed_ref, ycodes_ref, yscales_ref, y2, 4, False, i)


def build_split_call(m_pad, n_pad, tm, tk):
    nb = tk // BLOCK
    gm, gk = m_pad // tm, n_pad // tk
    plane_spec = pl.BlockSpec((tm, tk // 2), lambda i, k, *_: (i, k),
                              memory_space=pltpu.VMEM)
    flat = True  # n=16K, nb % 128 == 0 for tk >= 8192; checked below
    assert (gk == 1 or nb % 128 == 0) and ((tm // BLOCK) % 8 == 0 or gm == 1)
    ascales_spec = pl.BlockSpec((tm // BLOCK, nb), lambda i, k, *_: (i, k),
                                memory_space=pltpu.VMEM)
    xscales_spec = pl.BlockSpec((1, nb), lambda i, k, *_: (0, k),
                                memory_space=pltpu.VMEM)
    xc_sp = pl.BlockSpec((nb, HALF), lambda i, k, *_: (k, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, tm // BLOCK, HALF), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm // BLOCK, 1), lambda i, k, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((gm, tm // BLOCK, HALF), jnp.int8),
        jax.ShapeDtypeStruct((gm, tm // BLOCK, 1), jnp.float32),
    ]
    scratch = [pltpu.VMEM((tm // BLOCK, BLOCK, nb), jnp.float32),
               pltpu.VMEM((gk, tk // 2, nb), jnp.int8),
               pltpu.VMEM((gk, tk // 2, nb), jnp.int8)]
    return pl.pallas_call(
        partial(_kernel_split, nb=nb, tm=tm, flat=flat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(gm, gk),
            in_specs=[plane_spec, plane_spec, xc_sp, ascales_spec,
                      xscales_spec],
            out_specs=out_specs, scratch_shapes=scratch),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    ), tm, tk


def split_planes(qA):
    p = np.asarray(qA.codes).reshape(qA.rows_pad, qA.cols_pad // 2)
    ahi = (p.astype(np.int32) >> 4).astype(np.int8)
    alo = ((p & 15).astype(np.int32) - 8).astype(np.int8)
    return jnp.asarray(ahi), jnp.asarray(alo)


def mvm_split(call, tm, tk, qA, ahi, alo, x):
    nb_total = qA.cols_pad // BLOCK
    seed = jnp.zeros((1,), jnp.int32)
    xc = x.codes.reshape(nb_total, HALF)
    yc, ys = call(seed, ahi, alo, xc, qA.scales,
                  x.scales.reshape(1, nb_total))
    return QVec4(codes=yc.reshape(-1), scales=ys.reshape(-1),
                 length=qA.rows)


def _median_time(g, *args):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_time(step, qA, extra, qx):
    """Paired-diff per-op time of x <- step(x) dependent chains."""
    def make(iters):
        @jax.jit
        def g(qA, extra, qx):
            def body(i, x):
                return step(qA, extra, x)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, qx).scales)
        return g
    g1, g2 = make(K1), make(K2)
    float(g1(qA, extra, qx)); float(g2(qA, extra, qx))
    return g1, g2


def main():
    rng = np.random.default_rng(0)
    A = rng.random((N, N), dtype=np.float32) * 2 - 1
    x = rng.random(N, dtype=np.float32) * 2 - 1
    qA = ct.quantize(jnp.asarray(A), 4)
    qx = ct.quantize(jnp.asarray(x), 4)
    ahi, alo = split_planes(qA)
    print(f"packed stream {qA.codes.nbytes/1e6:.0f} MB; "
          f"plane-split {ahi.nbytes*2/1e6:.0f} MB", flush=True)

    results = {}
    # tk=8192 only: tk=4096 gives nb=64 with gk=4, which violates the
    # flat-scales legality this harness asserts (nb % 128 == 0 or gk == 1)
    for tk in (8192,):
        call, tm, tk = build_split_call(qA.rows_pad, qA.cols_pad, 1024, tk)
        step = lambda qA, pl_, x: mvm_split(call, tm, tk, qA, pl_[0],
                                            pl_[1], x)
        # numeric check vs the shipped deterministic kernel
        ref = ct.kernels.mvm.mvm_pallas(qA, qx)
        got = mvm_split(call, tm, tk, qA, ahi, alo, qx)
        assert np.array_equal(np.asarray(ref.codes), np.asarray(got.codes)), \
            "plane-split MVM disagrees with shipped kernel"
        assert np.allclose(np.asarray(ref.scales), np.asarray(got.scales))
        results[f"split_tk{tk}"] = chain_time(step, qA, (ahi, alo), qx)
    step_ship = lambda qA, _, x: ct.kernels.mvm.mvm_pallas(qA, x)
    results["shipped_packed"] = chain_time(step_ship, qA, None, qx)

    args = {k: (qA, (ahi, alo), qx) if k.startswith("split")
            else (qA, None, qx) for k in results}
    # interleave all variants round-robin, median of paired diffs
    diffs = {k: [] for k in results}
    for _ in range(7):
        for k, (g1, g2) in results.items():
            t1 = _median_time(g1, *args[k])
            t2 = _median_time(g2, *args[k])
            diffs[k].append((t2 - t1) / (K2 - K1))
    for k, d in diffs.items():
        d = sorted(d)
        med = d[len(d) // 2]
        stream = (2 if k.startswith("split") else 1) * qA.codes.nbytes
        print(f"{k:18s} {med*1e6:8.1f} us   {qA.codes.nbytes/med/1e9:6.1f} "
              f"GB/s(packed-equiv)   {stream/med/1e9:6.1f} GB/s(actual)",
              flush=True)


if __name__ == "__main__":
    main()
