"""4-bit AXPY kernel cost decomposition (round 4, VERDICT item 2).

Companion to run_axpy_ablation_r4.py (8-bit): stacks the 4-bit fused
dequant-FMA-requant kernel's phases one at a time at n=2^24 to find why
the 4-bit rate barely moved when the concat expansion took 8-bit
130->204 GB/s.  Also A/Bs the absmax strategies (64x 32-lane slices vs
a 5-pass roll-max tree) and a shipped-kernel reference point.

Protocol: harness.timing.chain_time, scales-only perturbation, all
variants interleaved in ONE process, best of 2 rounds.
Run on the real chip:  python doc/results/run_axpy4_ablation_r4.py
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


def exp_concat(s, w):
    rt, nbpr = s.shape
    return jnp.concatenate(
        [jax.lax.broadcast_in_dim(s[:, b:b + 1], (rt, w), (0, 1))
         for b in range(nbpr)], axis=1)


def exp_mm(s, w):
    """The r2/r3 HIGHEST indicator matmul (exact)."""
    rt, nbpr = s.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nbpr, nbpr * w), 1)
    E = jnp.where(c // w == r, 1.0, 0.0)
    return jax.lax.dot(s, E, precision=jax.lax.Precision.HIGHEST)


def exp_bf3(s, w):
    """3-way bf16 split matmul: exact for a 0/1 indicator (each partial
    is a plain copy summed in f32), half the matmuls of HIGHEST."""
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


def max_slices(ax, w):
    return _block_absmax(ax, w)


def max_roll(ax, w):
    """Per-w-lane-group absmax via a log2(w) roll-max tree: every pass is
    FULL lane width; afterwards lane b*w holds max(ax[b*w : b*w+w]) (the
    wrap only pollutes lanes past each group start, which we don't
    read).  pltpu.roll requires non-negative shifts, so the left-shift
    by sh is a wraparound roll by W-sh."""
    y = ax
    W = ax.shape[1]
    sh = 1
    while sh < w:
        y = jnp.maximum(y, pltpu.roll(y, W - sh, 1))
        sh *= 2
    nbpr = W // w
    s = jnp.concatenate([y[:, b * w:b * w + 1] for b in range(nbpr)], axis=1)
    return jnp.where(s == 0.0, 1.0, s)


def tree_bcast(ax, w):
    """Full-width absmax machinery: down roll-max tree (block max lands
    at each group-start lane), then a segmented broadcast (roll+select
    with CONSTANT lane masks) so EVERY lane holds its own block's max.
    Returns (full-width maxes z, narrow (RT, nbpr) scales for output).
    All ops are exact copies/maxes -> bit-identical to the slice form."""
    W = ax.shape[1]
    y = ax
    sh = 1
    while sh < w:
        y = jnp.maximum(y, pltpu.roll(y, W - sh, 1))
        sh *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, ax.shape, 1) % w
    z = y
    sh = 1
    while sh < w:
        z = jnp.where(lane >= sh, pltpu.roll(z, sh, 1), z)
        sh *= 2
    z = jnp.where(z == 0.0, 1.0, z)
    nbpr = W // w
    s = jnp.concatenate([z[:, b * w:b * w + 1] for b in range(nbpr)], axis=1)
    return z, s


def _kernel4(seed_ref, alpha_ref, uc_ref, us_ref, vc_ref, vs_ref,
             codes_ref, scales_ref, *, phase, expf, maxf, noise):
    qm = 7.0
    alpha = alpha_ref[0]
    grp = us_ref.shape[1]
    if phase == "pass":
        codes_ref[:] = jnp.bitwise_or(uc_ref[:], vc_ref[:])
        scales_ref[:] = us_ref[:] + vs_ref[:]
        return
    pu, pv = uc_ref[:], vc_ref[:]
    hu = jnp.bitwise_and(pu, jnp.int8(-16)).astype(jnp.float32) / 16.0
    hv = jnp.bitwise_and(pv, jnp.int8(-16)).astype(jnp.float32) / 16.0
    lu = jnp.bitwise_and(pu, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
    lv = jnp.bitwise_and(pv, jnp.int8(0x0F)).astype(jnp.float32) - 8.0
    if phase == "deq":                      # scalar scales (timing only)
        x_lo = lu * 0.3 + alpha * (lv * 0.7)
        x_hi = hu * 0.3 + alpha * (hv * 0.7)
    else:
        mu = expf(us_ref[:] / qm, HALF)
        mv = expf(vs_ref[:] / qm, HALF)
        x_lo = lu * mu + alpha * (lv * mv)
        x_hi = hu * mu + alpha * (hv * mv)
    if phase in ("deq", "exp"):             # skip requant (timing only)
        codes_ref[:] = (x_lo + x_hi).astype(jnp.int8)
        scales_ref[:] = us_ref[:] + vs_ref[:]
        return
    if phase == "fullb":                    # tree + segmented broadcast
        z, s = tree_bcast(jnp.maximum(jnp.abs(x_lo), jnp.abs(x_hi)), HALF)
        me = qm / z
        if noise:
            pltpu.prng_seed(seed_ref[0])
            bits = pltpu.prng_random_bits(x_lo.shape)
            u_lo = (jnp.bitwise_and(bits, 0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
            u_hi = (jnp.bitwise_and(jax.lax.shift_right_logical(bits, 8),
                                    0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
        else:
            u_lo = u_hi = 0.0
        q_lo = _sr(x_lo, me, 7, u_lo)
        q_hi = _sr(x_hi, me, 7, u_hi)
        codes_ref[:] = (16.0 * q_hi + (q_lo + 8.0)).astype(jnp.int8)
        scales_ref[:] = s
        return
    s = maxf(jnp.maximum(jnp.abs(x_lo), jnp.abs(x_hi)), HALF)
    if phase == "max":                      # scalar requant (timing only)
        q_lo = _sr(x_lo, 0.9, 7, 0.0)
        q_hi = _sr(x_hi, 0.9, 7, 0.0)
    else:                                   # full (shipped semantics)
        me = expf(qm / s, HALF)
        if noise:
            pltpu.prng_seed(seed_ref[0])
            nbits = pltpu.prng_random_bits(x_lo.shape)
            u_lo = (jnp.bitwise_and(nbits, 0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
            u_hi = (jnp.bitwise_and(jax.lax.shift_right_logical(nbits, 8),
                                    0xFF).astype(jnp.float32)
                    * (1.0 / 256.0))
        else:
            u_lo = u_hi = 0.0
        q_lo = _sr(x_lo, me, 7, u_lo)
        q_hi = _sr(x_hi, me, 7, u_hi)
    codes_ref[:] = (16.0 * q_hi + (q_lo + 8.0)).astype(jnp.int8)
    scales_ref[:] = s


def build4(n_pad, phase, expf, maxf, grp, noise=False, rt=None):
    rows = n_pad // (grp * BLOCK)
    if rt is None:
        cap = max(8192 // grp, 8)
        rt = next(r for r in (cap, 512, 256, 128, 64, 32, 16, 8, rows)
                  if r <= cap and rows % r == 0)
    w = HALF * grp
    cspec = pl.BlockSpec((rt, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((rt, grp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel4, phase=phase, expf=expf, maxf=maxf, noise=noise),
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
    w = HALF * grp
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
    qu, qv = ct.quantize(x, 4), ct.quantize(y, 4)
    nbytes = 3 * qu.nbytes
    grp = _axpy_grp(qu.length_pad)
    print(f"n=2^24  4-bit  grp={grp}  bytes/op={nbytes/1e6:.1f} MB")

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
        return lambda: float(g(qu, qv))

    # fp32 AXPY baseline, same protocol (3 full-width f32 streams)
    def make_f32(iters):
        @jax.jit
        def g(x, y):
            def body(i, s):
                r = (x + s * 1e-37) + ALPHA * y
                return s + r[0] * 1e-30
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return lambda: float(g(x, y))

    variants = [("ship", None, None, None, grp, False)]
    for name, phase, expf, maxf, g, nz in [
        ("pass g64", "pass", None, None, 64, False),
        ("deq g64", "deq", None, None, 64, False),
        ("exp/concat g64", "exp", exp_concat, None, 64, False),
        ("max/slices g64", "max", exp_concat, max_slices, 64, False),
        ("full/concat g64", "full", exp_concat, max_slices, 64, False),
        ("full/mm g64", "full", exp_mm, max_slices, 64, False),
        ("full/bf3 g64", "full", exp_bf3, max_slices, 64, False),
        ("full/concat g64 SR", "full", exp_concat, max_slices, 64, True),
    ]:
        variants.append((name, phase, expf, maxf, g, nz))

    fns = {}
    for name, phase, expf, maxf, g, nz in variants:
        if name == "ship":
            fns[name] = ("ship", None, grp)
            continue
        try:
            call, rows = build4(qu.length_pad, phase, expf, maxf, g, nz)
            fns[name] = (call, rows, g)
        except Exception as e:
            print(f"{name:24s} BUILD FAIL: {type(e).__name__}: {e}")

    fns["fp32"] = ("fp32", None, grp)
    results = {}
    for rnd in range(2):
        for name, (call, rows, g) in fns.items():
            if call is None:
                continue
            try:
                if call == "ship":
                    dt = chain_time(make_ship)
                elif call == "fp32":
                    dt = chain_time(make_f32)
                else:
                    dt = time_variant(qu, qv, call, rows, g)
            except Exception as e:
                print(f"{name:24s} RUN FAIL: {type(e).__name__}: {e}")
                fns[name] = (None, None, g)
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
