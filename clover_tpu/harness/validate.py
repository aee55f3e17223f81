"""`-v` validation mode: production kernels vs the golden oracle.

Re-creates the reference's validation suite (test/validate/02_vector.cpp:
557-641, 03_matrix.cpp:576-645): size sweeps across padding phases,
bit-exact checks where the reference is bit-exact (quantize/restore/
scaleAndAdd with SR off, transpose round-trip), tolerance checks where it
is tolerance-based (dot 0.02, mixed MVM 0.016 relative, threshold top-K
within 10%).  Prints Good/Failed per check and dumps the first mismatch
side by side (the reference's simd_debug::compare behavior).

The reference sweeps EVERY size in 128..2047; on TPU each distinct shape
is a fresh XLA compile, so the default sweep covers every padding phase
once (64 consecutive sizes) plus larger spot sizes; ``full=True`` restores
the exhaustive range.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import golden
from ..formats import BLOCK, pad_matrix, pad_vector, unpack_nibbles
from ..ops import dot, mvm, quantize, restore, scale_and_add, threshold, \
    transpose
from ..ops.mvm import mvm_f32
from ..utils.debug import compare

DEFAULT_VEC_SIZES = list(range(128, 192)) + [255, 256, 384, 511, 512, 1000,
                                             1024, 2047]
DEFAULT_MAT_SHAPES = [(128, 128), (128, 256), (192, 320), (256, 128),
                      (384, 640), (512, 512), (1000, 200), (1280, 1280)]


class Validator:
    def __init__(self, log=print):
        self.log = log
        self.failures = 0
        self.checks = 0

    def check(self, name, ok, a=None, b=None):
        self.checks += 1
        if ok:
            self.log(f"Validating {name:60s} Good")
        else:
            self.failures += 1
            self.log(f"Validating {name:60s} Failed")
            if a is not None:
                self.log(compare(np.asarray(a), np.asarray(b)))
        return ok

    # -- vector ops (ref 02_vector.cpp) ------------------------------------

    def vector_quantize(self, rng, bits, n):
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize(jnp.asarray(x), bits)
        gc, gs = golden.quantize_vec(np.asarray(pad_vector(jnp.asarray(x))),
                                     bits, noise=0.0)
        codes = np.asarray(unpack_nibbles(q.codes) if bits == 4 else q.codes)
        ok = np.array_equal(codes, gc) and np.array_equal(
            np.asarray(q.scales), gs)
        return self.check(f"quantize  {bits:2d}-bit n={n}", ok, codes, gc)

    def vector_consistency(self, rng, bits, n):
        # integer data in [-7, 7] (ref setRandomInteger(7),
        # 02_vector.cpp:193): |x - restore(quantize(x))| <= 1
        x = rng.integers(-7, 8, n).astype(np.float32)
        q = quantize(jnp.asarray(x), bits)
        xr = np.asarray(restore(q).values)[:n]
        ok = np.all(np.abs(x - xr) <= 1.0)
        return self.check(f"consistency {bits:2d}-bit n={n}", ok, xr, x)

    def vector_restore(self, rng, bits, n):
        """Standalone restore bit-exactness — runs with SR ON, like the
        reference (test/validate/02_vector.cpp:224-256): whatever codes
        SR produced, restore must be bit-identical to codes*scale/qmax."""
        import jax
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize(jnp.asarray(x), bits, key=jax.random.PRNGKey(n))
        got = np.asarray(restore(q).values)
        codes = np.asarray(unpack_nibbles(q.codes) if bits == 4 else q.codes)
        ref = golden.restore_vec(codes, np.asarray(q.scales), bits)
        ok = np.array_equal(got, ref)
        return self.check(f"restore   {bits:2d}-bit n={n} (SR on)", ok,
                          got, ref)

    def vector_dot(self, rng, bits, n):
        u = (rng.random(n, dtype=np.float32) * 2 - 1)
        v = (rng.random(n, dtype=np.float32) * 2 - 1)
        qu, qv = quantize(jnp.asarray(u), bits), quantize(jnp.asarray(v), bits)
        got = float(dot(qu, qv))
        if bits in (16, 32):
            ref = float(np.dot(np.asarray(restore(qu).values),
                               np.asarray(restore(qv).values)))
            ok = abs(got - ref) <= 0.02 * max(1.0, abs(ref))
        else:
            uc = np.asarray(unpack_nibbles(qu.codes) if bits == 4 else qu.codes)
            vc = np.asarray(unpack_nibbles(qv.codes) if bits == 4 else qv.codes)
            ref = float(golden.dot(uc, np.asarray(qu.scales), vc,
                                   np.asarray(qv.scales), bits))
            ok = abs(got - ref) <= 0.02   # ref tolerance 02_vector.cpp:280
        return self.check(f"dot       {bits:2d}-bit n={n}", ok,
                          [got], [ref])

    def vector_scale_and_add(self, rng, bits, n):
        u = (rng.random(n, dtype=np.float32) * 2 - 1)
        v = (rng.random(n, dtype=np.float32) * 2 - 1)
        qu, qv = quantize(jnp.asarray(u), bits), quantize(jnp.asarray(v), bits)
        r = scale_and_add(qu, qv, -0.5)
        if bits in (16, 32):
            ref = np.asarray(restore(qu).values) - 0.5 * np.asarray(
                restore(qv).values)
            got = np.asarray(restore(r).values)
            ok = np.allclose(got, ref.astype(got.dtype), rtol=1e-3, atol=1e-3)
            return self.check(f"scaleAndAdd {bits:2d}-bit n={n}", ok, got, ref)
        uc = np.asarray(unpack_nibbles(qu.codes) if bits == 4 else qu.codes)
        vc = np.asarray(unpack_nibbles(qv.codes) if bits == 4 else qv.codes)
        gc, gs = golden.scale_and_add(uc, np.asarray(qu.scales), vc,
                                      np.asarray(qv.scales), -0.5, bits, 0.0)
        rc = np.asarray(unpack_nibbles(r.codes) if bits == 4 else r.codes)
        # 1-ulp fma freedom (see tests/test_kernels_quantize.py)
        diff = rc.astype(np.int32) - gc.astype(np.int32)
        ok = np.abs(diff).max(initial=0) <= 1 and (diff != 0).mean() <= 0.005
        return self.check(f"scaleAndAdd {bits:2d}-bit n={n}", ok, rc, gc)

    def vector_threshold(self, rng, bits, n):
        k = max(1, n // 8)
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        q = quantize(jnp.asarray(x), bits)
        t = threshold(q, k)
        vals = np.abs(np.asarray(restore(t).values)[:n])
        ref_vals = np.abs(np.asarray(restore(q).values)[:n])
        top_got = np.sort(vals[vals > 0])[::-1]
        top_ref = np.sort(ref_vals)[::-1][:len(top_got)]
        # top-K within 10% relative (ref 02_vector.cpp:449-554)
        ok = (np.count_nonzero(vals) <= k and len(top_got) > 0
              and np.all(top_got >= top_ref * 0.9 - 1e-6))
        return self.check(f"threshold {bits:2d}-bit n={n} K={k}", ok)

    # -- matrix ops (ref 03_matrix.cpp) ------------------------------------

    def matrix_quantize(self, rng, bits, m, n):
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        q = quantize(jnp.asarray(a), bits)
        gc, gs = golden.quantize_mat(np.asarray(pad_matrix(jnp.asarray(a))),
                                     bits, noise=0.0)
        codes = np.asarray(unpack_nibbles(q.codes) if bits == 4 else q.codes)
        ok = np.array_equal(codes, gc) and np.array_equal(
            np.asarray(q.scales), gs)
        return self.check(f"mat quantize {bits:2d}-bit {m}x{n}", ok)

    def matrix_mvm(self, rng, bits_a, bits_x, m, n):
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        qa = quantize(jnp.asarray(a), bits_a)
        qx = quantize(jnp.asarray(x), bits_x)
        y = mvm(qa, qx)
        got = np.asarray(restore(y).values)
        if bits_x == 32 and bits_a in (4, 8):
            # dequant-on-the-fly x32 MVM vs an independent float64
            # reference (ref: 03_matrix.cpp:419-489, |delta| <= 0.01)
            ra = np.asarray(restore(qa).values).astype(np.float64)
            ref = (ra[:m, :n] @ x.astype(np.float64)).astype(np.float32)
            ok = bool(np.all(np.abs(got[:m] - ref) <= 0.01))
            return self.check(
                f"mvm {bits_a:2d}x{bits_x:2d}-bit {m}x{n}", ok,
                got[:8], ref[:8])
        ref = np.asarray(mvm_f32(qa, qx))
        if y.bits in (16, 32):
            ok = np.allclose(got, ref, rtol=1e-3, atol=1e-3)
        else:
            lsb = np.repeat(np.asarray(y.scales), BLOCK) / (
                7.0 if y.bits == 4 else 127.0)
            ok = np.all(np.abs(got - ref) <= lsb * (1 + 1e-3) + 1e-5)
        return self.check(
            f"mvm {bits_a:2d}x{bits_x:2d}-bit {m}x{n}", ok, got[:8], ref[:8])

    def solver_iteration(self, rng, bits_a, bits_x, m, n):
        """The whole-iteration fused kernel (kernels/iteration.py) must
        be bit-identical to the two-launch fused MVM+AXPY sequence —
        the invariant the solver dispatch relies on (TPU only; the CPU
        suite covers interpret mode in tests/test_kernels.py)."""
        from ..kernels.dispatch import pallas_enabled
        from ..kernels.iteration import (iteration_pallas,
                                         iteration_pallas_eligible)
        from ..ops.mvm import mvm_axpy
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        yv = a @ (rng.random(n, dtype=np.float32) * 2 - 1)
        xv = rng.random(n, dtype=np.float32) * 2 - 1
        qa = quantize(jnp.asarray(a), bits_a)
        qat = transpose(qa)
        qy = quantize(jnp.asarray(yv / np.abs(yv).max()), bits_x)
        qx = quantize(jnp.asarray(xv), bits_x)
        if not (pallas_enabled()
                and iteration_pallas_eligible(qa, qat, qy, qx)):
            return True
        got = iteration_pallas(qa, qat, qy, qx, 1e-3)
        t2 = mvm_axpy(qa, qx, qy, -1.0)
        want = mvm_axpy(qat, t2, qx, 1e-3)
        ok = (np.array_equal(np.asarray(got.codes), np.asarray(want.codes))
              and np.array_equal(np.asarray(got.scales),
                                 np.asarray(want.scales)))
        return self.check(
            f"iteration {bits_a:2d}x{bits_x:2d}-bit {m}x{n}", ok)

    def solver_chain(self, rng, bits_a, bits_x, m, n):
        """Chained two-iteration kernel (kernels/iteration.py
        _chain_kernel, incl. in-kernel phase-C threshold tie bits) vs
        the unchained [iteration_pallas -> ops.threshold] x2 sequence:
        bit-identical, det + SR (ADVICE r4 tie-bit item — Mosaic's f32
        divide measured bit-equal to XLA's, this check keeps it pinned;
        TPU only)."""
        from ..kernels.dispatch import pallas_enabled
        from ..kernels.iteration import (iteration_chain_pallas,
                                         iteration_chain_pallas_eligible,
                                         iteration_pallas)
        from ..ops import threshold as op_threshold
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        yv = a @ (rng.random(n, dtype=np.float32) * 2 - 1)
        xv = rng.random(n, dtype=np.float32) * 2 - 1
        qa = quantize(jnp.asarray(a), bits_a)
        qat = transpose(qa)
        qy = quantize(jnp.asarray(yv / np.abs(yv).max()), bits_x)
        qx = quantize(jnp.asarray(xv), bits_x)
        k = max(1, n // 4)
        if not (pallas_enabled()
                and iteration_chain_pallas_eligible(qa, qat, qy, qx, k)):
            return True
        seeds = tuple(jnp.asarray([7 + 13 * j], jnp.int32)
                      for j in range(8))
        got = iteration_chain_pallas(qa, qat, qy, qx, 1e-3, k, seeds)
        want = qx
        for it in range(2):
            want = iteration_pallas(qa, qat, qy, want, 1e-3,
                                    seeds[4 * it:4 * it + 4])
            want = op_threshold(want, k)
        ok = (np.array_equal(np.asarray(got.codes), np.asarray(want.codes))
              and np.array_equal(np.asarray(got.scales),
                                 np.asarray(want.scales)))
        return self.check(
            f"chain2 {bits_a:2d}x{bits_x:2d}-bit {m}x{n}", ok)

    def matrix_mvm_i4(self, rng, m, n):
        """The single-int4-matmul 4x4 kernel (kernels/mvm.py
        _kernel_4x4_i4, round 5) must be bit-identical to the packed
        two-plane kernel in BOTH deterministic and SR modes — the
        invariant that lets solvers/bench swap it in freely (TPU only:
        interpret mode cannot lower sub-byte dtypes)."""
        import jax
        from ..kernels.dispatch import pallas_enabled
        from ..kernels.mvm import (mat4_i4_stream, mvm_i4_enabled,
                                   mvm_pallas, mvm_pallas_eligible)
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        x = (rng.random(n, dtype=np.float32) * 2 - 1)
        qa = quantize(jnp.asarray(a), 4)
        qx = quantize(jnp.asarray(x), 4)
        if not (pallas_enabled() and mvm_i4_enabled()
                and mvm_pallas_eligible(qa, qx)):
            return True

        @jax.jit
        def run(qa, qx, seed):
            a4 = mat4_i4_stream(qa)
            return (mvm_pallas(qa, qx), mvm_pallas(qa, qx, a_i4=a4),
                    mvm_pallas(qa, qx, key=seed),
                    mvm_pallas(qa, qx, key=seed, a_i4=a4))
        rd, gd_, rs, gs_ = run(qa, qx, jnp.asarray([4242], jnp.int32))
        ok = all(np.array_equal(np.asarray(p.codes), np.asarray(q.codes))
                 and np.array_equal(np.asarray(p.scales),
                                    np.asarray(q.scales))
                 for p, q in ((rd, gd_), (rs, gs_)))
        return self.check(f"mvm-i4  4x 4-bit {m}x{n}", ok)

    def matrix_mvm_batched_i4(self, rng, m, n, b=4):
        """Batched 4x4 int4 kernel (kernels/mvm_batched._kernel_4x4i4_b)
        vs the packed batched kernel: bit-identical, det + SR (TPU
        only)."""
        import jax
        from ..kernels.dispatch import pallas_enabled
        from ..kernels.mvm import mat4_i4_stream, mvm_i4_enabled
        from ..kernels.mvm_batched import (mvm_batched_pallas,
                                           mvm_batched_pallas_eligible)
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        qa = quantize(jnp.asarray(a), 4)
        vs = [quantize(jnp.asarray(
            rng.random(n, dtype=np.float32) * 2 - 1), 4)
            for _ in range(b)]
        xs = jax.tree.map(lambda *ar: jnp.stack(ar), *vs)
        leaf = jax.tree_util.tree_leaves(xs)[0]
        if not (pallas_enabled() and mvm_i4_enabled()
                and mvm_batched_pallas_eligible(qa, leaf.shape, "4x4")):
            return True

        @jax.jit
        def run(qa, xs, seed):
            a4 = mat4_i4_stream(qa)
            return (mvm_batched_pallas(qa, xs),
                    mvm_batched_pallas(qa, xs, a_i4=a4),
                    mvm_batched_pallas(qa, xs, key=seed),
                    mvm_batched_pallas(qa, xs, key=seed, a_i4=a4))
        rd, gd_, rs, gs_ = run(qa, xs, jnp.asarray([777], jnp.int32))
        ok = all(np.array_equal(np.asarray(p.codes), np.asarray(q.codes))
                 and np.array_equal(np.asarray(p.scales),
                                    np.asarray(q.scales))
                 for p, q in ((rd, gd_), (rs, gs_)))
        return self.check(f"mvm-b-i4 4x 4-bit {m}x{n} B={b}", ok)

    def matrix_transpose(self, rng, bits, m, n):
        a = (rng.random((m, n), dtype=np.float32) * 2 - 1)
        q = quantize(jnp.asarray(a), bits)
        t = transpose(q)
        ra = np.asarray(restore(q).values)
        rt = np.asarray(restore(t).values)
        ok = np.array_equal(ra, rt.T)        # bit-exact round trip (ref
        return self.check(                   # 03_matrix.cpp:153-245)
            f"transpose {bits:2d}-bit {m}x{n}", ok)


TPU_VEC_SIZES = [128, 129, 191, 192, 512, 1000, 1024, 2047]
TPU_MAT_SHAPES = [(128, 128), (256, 384), (512, 1024), (1000, 200)]


def run_validation(full: bool = False, seed: int = 1, log=print,
                   vec_sizes=None, mat_shapes=None) -> bool:
    """``vec_sizes``/``mat_shapes`` override the sweep sets (used by the
    chunked full-sweep runner: one process cannot hold the ~27k distinct
    XLA executables of the full 128..2047 sweep — LLVM's JIT code arena
    exhausts around ~6k compiles)."""
    import jax
    rng = np.random.default_rng(seed)
    v = Validator(log=log)
    on_tpu = jax.default_backend() == "tpu"
    explicit = vec_sizes is not None or mat_shapes is not None
    if explicit:
        vec_sizes = vec_sizes or []
        mat_shapes = mat_shapes or []
    elif full:
        vec_sizes = list(range(128, 2048))
        mat_shapes = [(mm, nn) for mm in range(128, 1281, 128)
                      for nn in range(128, 1281, 128)]
    elif on_tpu:
        # every distinct shape is an XLA compile (~seconds on the TPU);
        # cover the padding phases with a compact set by default
        vec_sizes, mat_shapes = TPU_VEC_SIZES, TPU_MAT_SHAPES
    else:
        vec_sizes, mat_shapes = DEFAULT_VEC_SIZES, DEFAULT_MAT_SHAPES

    for n in vec_sizes:
        for bits in (4, 8):
            v.vector_quantize(rng, bits, n)
            v.vector_restore(rng, bits, n)
            v.vector_consistency(rng, bits, n)
            v.vector_dot(rng, bits, n)
            v.vector_scale_and_add(rng, bits, n)
        for bits in (4, 8, 16, 32):
            v.vector_threshold(rng, bits, n)

    for (m, n) in mat_shapes:
        for bits in (4, 8):
            v.matrix_quantize(rng, bits, m, n)
            v.matrix_transpose(rng, bits, m, n)
        for (ba, bx) in ((4, 4), (4, 8), (8, 8), (16, 16), (32, 32),
                         (4, 32), (8, 32)):
            v.matrix_mvm(rng, ba, bx, m, n)
        for (ba, bx) in ((4, 4), (4, 8)):
            v.solver_iteration(rng, ba, bx, m, n)
            v.solver_chain(rng, ba, bx, m, n)
        v.matrix_mvm_i4(rng, m, n)
        v.matrix_mvm_batched_i4(rng, m, n)

    log(f"\n{v.checks} checks, {v.failures} failures")
    return v.failures == 0
