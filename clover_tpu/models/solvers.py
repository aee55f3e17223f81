"""Quantized GD and IHT solvers.

Reference: Q_GD / Q_IHT iteration loops (test/performance/01_measure.h:912-946
and :1001-1023), accuracy-tracing variants (test/accuracy/02_iht_accuracy.h:
30-96, 03_gd_accuracy.h:30-87).

TPU-native design: one ``lax.scan`` per solve — the whole iteration
(two fused MVMs, two scaleAndAdds, a top-K) is a single compiled program;
the reference's five OpenMP fork-joins per iteration become zero launches.
Stochastic-rounding keys are threaded through the scan carry; ``key=None``
runs fully deterministic (the reference's SR-disabled build).

The per-iteration update (IHT; GD omits the threshold):
    t1 = Phi  @ x        (fused requantized MVM)
    t2 = y - t1          (blockwise requantized AXPY)
    t3 = PhiT @ t2
    x  = x + mu * t3
    x  = top_k(x, K)

On the reference's sparse-x trick (CloverMatrix8.h:979-1000 — compute
Phi@x as a sum of K rows of PhiT): deliberately NOT used here.  On the
CPU it wins because it skips FLOPs on a compute-bound machine.  On TPU
the dense fused MVM streams the packed matrix once at ~70-90% of HBM
bandwidth with zero intermediates, while a gather-based sparse MVM at
the standard K = n/4 must materialize gathered rows plus a dequantized
operand (f32/bf16) in HBM — MORE traffic than the dense stream it
replaces (it only pays off for K < ~n/9, which none of the reference
protocols use).  ops/sparse.mvm_sparse remains available and tested for
genuinely sparse regimes.  The round-2 end-to-end numbers were met
dense: 4-bit IHT 64% of HBM roofline at 8192x16384 and 6.5x/5.4x over
fp32 IHT at 8192x16384/4096x8192, single coherent session
(doc/results/performance_tpu_v5e.txt).  For MANY problems against one
matrix, models/batch.py amortizes the matrix stream across the batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..formats import zeros_vector
from ..ops import restore_vec, threshold
from ..ops.mvm import mvm_axpy


class SolveResult(NamedTuple):
    x: object            # quantized solution container
    trace: jax.Array     # f32[iterations] — per-iteration ||x-x*||/||x*||
                         # (all zeros when no x_star was given)


def _vec_bits(qvec) -> int:
    return qvec.bits


def _op_seeds(key_or_seed, n: int = 4):
    """Derive n per-op int32 seeds from an iteration seed (or PRNG key) by
    constant strides — pure integer adds, no threefry on the solver hot
    path (the TPU analog of the reference's per-thread XORShift streams,
    CloverRandom.h:39-41)."""
    from ..kernels.dispatch import SEED_OP, seed_from
    if key_or_seed is None:
        return (None,) * n
    seed = seed_from(key_or_seed)[0]
    return tuple(seed + jnp.int32((j + 1) * SEED_OP) for j in range(n))


def _iteration(Phi, PhiT, y, x, mu, k, seed, a_i4s=(None, None)):
    # Each MVM's scaleAndAdd rides the MVM kernel's epilogue (fused
    # MVM+AXPY, kernels/mvm.py): the quantized intermediates t1/t3 never
    # touch HBM and the iteration is two launches plus the threshold.
    # In the small-problem regime (both legs single-k-tile, m/n <= 8192)
    # the WHOLE iteration runs as ONE launch (kernels/iteration.py,
    # bit-identical to the two-launch sequence) — round 3's floor probes
    # showed per-launch ramp + inter-launch scheduling dominate there
    # (doc/results/iht_small_r3.md).
    k1, k2, k3, k4 = _op_seeds(seed)
    from ..kernels.dispatch import pallas_enabled
    from ..kernels.iteration import (iteration_pallas,
                                     iteration_pallas_eligible)
    if pallas_enabled() and iteration_pallas_eligible(Phi, PhiT, y, x):
        x = iteration_pallas(Phi, PhiT, y, x, mu, (k1, k2, k3, k4),
                             a_i4s=a_i4s)
    else:
        t2 = mvm_axpy(Phi, x, y, -1.0, key_mvm=k1, key_axpy=k2,
                      a_i4=a_i4s[0])                             # y - Phi x
        x = mvm_axpy(PhiT, t2, x, mu, key_mvm=k3, key_axpy=k4,
                     a_i4=a_i4s[1])                              # x+mu Phi't2
    if k is not None:
        x = threshold(x, k)
    return x


@partial(jax.jit, static_argnames=("iterations", "k"))
def _solve(Phi, PhiT, y, x0, x_star, iterations: int, k, mu, key):
    import os
    from ..kernels.dispatch import SEED_GOLD, pallas_enabled, seed_from
    xs32 = x_star.values if x_star is not None else None
    xs_norm = (jnp.linalg.norm(xs32) if xs32 is not None else None)
    seed0 = seed_from(key)[0] if key is not None else None

    # Pure-4-bit solves: build the int4 stream views of Phi/PhiT ONCE,
    # hoisted out of the scan — every path (whole-iteration kernel,
    # chained kernel, two-launch mvm_axpy) then runs its legs as ONE
    # int4 MXU matmul per tile (kernels/mvm.py _kernel_4x4_i4;
    # bit-identical; the reference analogously materializes PhiT up
    # front, test/accuracy/02_iht_accuracy.h:72).
    from ..formats import QMat4
    from ..kernels.iteration import iteration_pallas_eligible
    from ..kernels.mvm import (mat4_i4_stream, mvm_axpy_pallas_eligible,
                               mvm_i4_enabled)
    a_i4s = (None, None)
    if (pallas_enabled() and mvm_i4_enabled()
            and isinstance(Phi, QMat4) and y.bits == 4
            and (iteration_pallas_eligible(Phi, PhiT, y, x0)
                 or (mvm_axpy_pallas_eligible(Phi, x0, y)
                     and mvm_axpy_pallas_eligible(PhiT, y, x0)))):
        a_i4s = (mat4_i4_stream(Phi), mat4_i4_stream(PhiT))

    # Chained fast path: TWO whole iterations (threshold included) per
    # pallas launch (kernels/iteration.iteration_chain_pallas) — the
    # small-problem regime's per-launch ramp + inter-launch scheduling
    # amortize across both.  Only for untraced solves (x_star is None):
    # the intermediate x never materializes, so no per-iteration error.
    from ..kernels.iteration import (iteration_chain_pallas,
                                     iteration_chain_pallas_eligible)
    # chain length: iterations per launch (r5 sweep: 4 edges 2 by ~2-6%
    # — 54.3k vs 51.0k it/s at 2048x4096, 19.6k vs 19.2k at 4096x8192)
    cl = max(2, int(os.environ.get("CLOVER_ITER_CHAIN_LEN", "4")))
    if (xs32 is None and iterations >= cl
            and os.environ.get("CLOVER_ITER_CHAIN", "1") == "1"
            and pallas_enabled()
            and iteration_chain_pallas_eligible(Phi, PhiT, y, x0, k)):
        def bodyc(x, itc):
            if seed0 is not None:
                seeds = ()
                for j in range(cl):
                    b = seed0 + (cl * itc + j) * jnp.int32(SEED_GOLD)
                    seeds = seeds + _op_seeds(b)
            else:
                seeds = (None,) * (4 * cl)
            return (iteration_chain_pallas(Phi, PhiT, y, x, mu, k,
                                           seeds, chain=cl,
                                           a_i4s=a_i4s),
                    jnp.float32(0))

        x, trace = jax.lax.scan(bodyc, x0,
                                jnp.arange(iterations // cl,
                                           dtype=jnp.int32))
        for j in range(iterations % cl):     # tail: unchained iterations
            it = (iterations // cl) * cl + j
            seed = (seed0 + it * jnp.int32(SEED_GOLD)
                    if seed0 is not None else None)
            x = _iteration(Phi, PhiT, y, x, mu, k, seed, a_i4s)
        return SolveResult(x=x, trace=jnp.zeros(iterations, jnp.float32))

    def body(x, it):
        seed = seed0 + it * jnp.int32(SEED_GOLD) if seed0 is not None else None
        x = _iteration(Phi, PhiT, y, x, mu, k, seed, a_i4s)
        if xs32 is not None:
            err = jnp.linalg.norm(restore_vec(x).values - xs32) / xs_norm
        else:
            err = jnp.float32(0)
        return x, err

    x, trace = jax.lax.scan(body, x0, jnp.arange(iterations, dtype=jnp.int32))
    return SolveResult(x=x, trace=trace)


def iht(Phi, PhiT, y, iterations: int, k: int, mu: float,
        key=None, x_star=None) -> SolveResult:
    """Quantized Iterative Hard Thresholding (compressive-sensing recovery).

    ``Phi``/``PhiT`` are quantized matrices (PhiT materialized up front,
    as the reference does at 02_iht_accuracy.h:72); ``y`` a quantized
    vector of observations.  ``x_star`` (QVec32, optional) enables the
    per-iteration relative-error trace of the accuracy protocol.
    """
    x0 = _initial_x(Phi, y)
    return _solve(Phi, PhiT, y, x0, x_star, iterations, int(k),
                  jnp.float32(mu), key)


def gd(Phi, PhiT, y, iterations: int, mu: float,
       key=None, x_star=None) -> SolveResult:
    """Quantized gradient descent on least squares ||y - Phi x||^2."""
    x0 = _initial_x(Phi, y)
    return _solve(Phi, PhiT, y, x0, x_star, iterations, None,
                  jnp.float32(mu), key)


def _initial_x(Phi, y):
    """x starts cleared (reference: x.clear(), 01_measure.h:938) at the
    precision the update loop keeps it in: the output precision of
    PhiT @ t2 — y's precision for pure configs, 8-bit for mixed 4x8."""
    return zeros_vector(_vec_bits(y), Phi.cols)
