"""AXPY kernel cost decomposition (round 4, VERDICT item 2).

Times incremental variants of the fused dequant-FMA-requant AXPY kernel
at n=2^24 to locate the gap between the shipped ~115 GB/s and the ~360
GB/s byte-passthrough floor.  Variants stack the kernel's phases one at
a time; "wrong-math" variants (scalar scales) are timing probes only.

Protocol: harness.timing.chain_time (calibrated paired-diff dependent
chains), scales-only perturbation (CLAUDE.md: carried-array chains pay a
full copy around opaque pallas calls), variants interleaved in ONE
process.  Run on the real chip:  python doc/results/run_axpy_ablation_r4.py
"""

import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import clover_tpu as ct
from clover_tpu.formats import BLOCK
from clover_tpu.harness.timing import chain_time, gbs
from clover_tpu.kernels.quantize import (
    _axpy_grp, _block_absmax, _expand_scales, _sr, HALF, QMAX)
from clover_tpu.utils.compcache import enable as _cc

_cc()

N = 1 << 24
ALPHA = -0.5


# ---------------------------------------------------------------------------
# expansion variants
# ---------------------------------------------------------------------------

def exp_matmul(s, w):
    return _expand_scales(s, w)


def exp_repeat(s, w):
    # NOTE: pltpu.repeat TILES ([s0..sg, s0..sg, ...]), it does NOT
    # element-repeat — this variant computes the WRONG expansion and is
    # kept only as the cost floor of a data-movement expansion.
    return pltpu.repeat(s, w, axis=1)


def exp_concat(s, w):
    """Exact: concat of per-block lane-broadcasts (each piece written
    once — total data movement of ONE full-width pass, vs the chained
    selects' nbpr-1 passes)."""
    rt, nbpr = s.shape
    return jnp.concatenate(
        [jax.lax.broadcast_in_dim(s[:, b:b + 1], (rt, w), (0, 1))
         for b in range(nbpr)], axis=1)


def exp_bf3(s, w):
    """Manual 3-way bf16 split: exact for any f32 (3 plain matmuls vs
    HIGHEST's 6)."""
    rt, nbpr = s.shape
    hi = s.astype(jnp.bfloat16)
    r1 = s - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    r = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 1)
    E = jnp.where(c // w == r, 1.0, 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot(hi, E, preferred_element_type=jnp.float32)
    out += jax.lax.dot(mid, E, preferred_element_type=jnp.float32)
    out += jax.lax.dot(lo, E, preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# absmax variants
# ---------------------------------------------------------------------------

def max_slices(ax, w):
    return _block_absmax(ax, w)


def max_roll(ax, w):
    """Per-w-lane-group max via a roll-max tree (log2(w) full-width
    passes).  Rolls wrap the whole row, so after the tree EVERY lane
    holds a max over w lanes starting at it MOD rowlen; lanes at group
    starts hold exactly their group's max -> slice those."""
    y = ax
    sh = w // 2
    while sh >= 1:
        y = jnp.maximum(y, pltpu.roll(y, -sh, 1))
        sh //= 2
    nbpr = ax.shape[1] // w
    s = jnp.concatenate([y[:, b * w:b * w + 1] for b in range(nbpr)], axis=1)
    return jnp.where(s == 0.0, 1.0, s)


# ---------------------------------------------------------------------------
# parametrized kernel (8-bit)
# ---------------------------------------------------------------------------

def _kernel8(seed_ref, alpha_ref, uc_ref, us_ref, vc_ref, vs_ref,
             codes_ref, scales_ref, *, phase, expf, maxf):
    qm = 127.0
    alpha = alpha_ref[0]
    grp = us_ref.shape[1]
    if phase == "pass":
        codes_ref[:] = jnp.bitwise_or(uc_ref[:], vc_ref[:])
        scales_ref[:] = us_ref[:] + vs_ref[:]
        return
    uf = uc_ref[:].astype(jnp.float32)
    vf = vc_ref[:].astype(jnp.float32)
    if phase == "deq":                      # no expansion (timing only)
        x = uf * (1.0 / qm) + alpha * (vf * (2.0 / qm))
    else:
        mu = expf(us_ref[:] / qm, BLOCK)
        mv = expf(vs_ref[:] / qm, BLOCK)
        x = uf * mu + alpha * (vf * mv)
    if phase in ("deq", "exp"):             # no requant scale (timing only)
        codes_ref[:] = x.astype(jnp.int8)
        scales_ref[:] = us_ref[:] + vs_ref[:]
        return
    s = maxf(jnp.abs(x), BLOCK)
    if phase == "max":                      # absmax but scalar me
        q = _sr(x, 0.9, 127, 0.0)
    else:                                   # full (shipped semantics)
        me = expf(qm / s, BLOCK)
        q = _sr(x, me, 127, 0.0)
    codes_ref[:] = q.astype(jnp.int8)
    scales_ref[:] = s


def build8(n_pad, phase, expf, maxf, grp, rt=None):
    rows = n_pad // (grp * BLOCK)
    if rt is None:
        cap = max(8192 // grp, 8)
        rt = next(r for r in (cap, 512, 256, 128, 64, 32, 16, 8, rows)
                  if r <= cap and rows % r == 0)
    w = BLOCK * grp
    cspec = pl.BlockSpec((rt, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((rt, grp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel8, phase=phase, expf=expf, maxf=maxf),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // rt,),
            in_specs=[cspec, sspec, cspec, sspec],
            out_specs=[cspec, sspec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, w), jnp.int8),
            jax.ShapeDtypeStruct((rows, grp), jnp.float32),
        ],
    ), rows


def time_variant(qu, qv, call, rows, grp):
    w = BLOCK * grp
    seed = jnp.zeros((1,), jnp.int32)
    alpha = jnp.asarray([ALPHA], jnp.float32)
    uc = qu.codes.reshape(rows, w)
    us = qu.scales.reshape(rows, grp)
    vc = qv.codes.reshape(rows, w)
    vs = qv.scales.reshape(rows, grp)

    def make(iters):
        @jax.jit
        def g(uc, us, vc, vs):
            def body(i, s):
                c, sc = call(seed, alpha, uc, us + s * 1e-37, vc, vs)
                return s + sc[0, 0] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(uc, us, vc, vs))
    return chain_time(make)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(N, dtype=np.float32) * 2 - 1)
    y = jnp.asarray(rng.random(N, dtype=np.float32) * 2 - 1)
    qu8, qv8 = ct.quantize(x, 8), ct.quantize(y, 8)
    nbytes = 3 * qu8.nbytes
    grp = _axpy_grp(qu8.length_pad)
    print(f"n=2^24  8-bit  grp={grp}  bytes/op={nbytes/1e6:.1f} MB")

    # shipped kernel reference point
    from clover_tpu.kernels.quantize import axpy_pallas

    def make_ship(iters):
        @jax.jit
        def g(u, v):
            def body(i, s):
                u2 = type(u)(codes=u.codes, scales=u.scales + s * 1e-37,
                             length=u.length)
                out = axpy_pallas(u2, v, ALPHA, key=None)
                return s + out.scales[0] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(qu8, qv8))

    variants = [("ship", None, None, None, grp)]
    for name, phase, expf, maxf, g in [
        ("pass", "pass", None, None, grp),
        ("deq", "deq", None, None, grp),
        ("exp/repeat g64", "exp", exp_repeat, None, 64),
        ("exp/concat g64", "exp", exp_concat, None, 64),
        ("exp/concat g8", "exp", exp_concat, None, 8),
        ("exp/concat g2", "exp", exp_concat, None, 2),
        ("exp/bf3 g8", "exp", exp_bf3, None, 8),
        ("full/concat g64", "full", exp_concat, max_slices, 64),
        ("full/concat g8", "full", exp_concat, max_slices, 8),
        ("full/concat g2", "full", exp_concat, max_slices, 2),
        ("full/bf3 g8", "full", exp_bf3, max_slices, 8),
        ("full/bf3 g64", "full", exp_bf3, max_slices, 64),
        ("exp/bf3 g64", "exp", exp_bf3, None, 64),
        ("full/repeat g64 WRONG", "full", exp_repeat, max_slices, 64),
    ]:
        variants.append((name, phase, expf, maxf, g))

    fns = {}
    for name, phase, expf, maxf, g in variants:
        if name == "ship":
            fns[name] = ("ship", None, grp)
            continue
        try:
            call, rows = build8(qu8.length_pad, phase, expf, maxf, g)
            fns[name] = (call, rows, g)
        except Exception as e:
            print(f"{name:24s} BUILD FAIL: {type(e).__name__}: {e}")

    # interleave: 2 rounds, report the better (transient-slowdown guard)
    results = {}
    for rnd in range(2):
        for name, (call, rows, g) in fns.items():
            try:
                if call == "ship":
                    dt = chain_time(make_ship)
                else:
                    dt = time_variant(qu8, qv8, call, rows, g)
            except Exception as e:
                print(f"{name:24s} RUN FAIL: {type(e).__name__}: {e}")
                fns[name] = (None, None, g)
                continue
            if call is None:
                continue
            results.setdefault(name, []).append(dt)
            print(f"  r{rnd} {name:24s} {dt*1e6:9.1f} us   "
                  f"{gbs(nbytes, dt):7.1f} GB/s")

    print("\n== best of 2 rounds ==")
    for name, ts in results.items():
        dt = min(ts)
        print(f"{name:24s} {dt*1e6:9.1f} us   {gbs(nbytes, dt):7.1f} GB/s")


if __name__ == "__main__":
    main()
