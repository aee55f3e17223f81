"""Problem generators for the GD / IHT solvers.

Reference: test/performance/03_iht_gd_util.cpp:449-536.
- IHT: Phi ~ U(-1,1), x* a random K-sparse 0/1 vector, y = Phi x*.
- GD:  Phi ~ U(-1,1) with L2-normalized rows, x* = sign(U(-1,1)) in
  {-1,+1}, y = Phi x*.

The reference seeds a shared XORShift128+ with fixed keys
(445560390295639063 / 2935984234003016713, test/random/00_random.cpp:42) so
*data* is reproducible on its platform; we use JAX threefry keys for the
same reproducibility property (bit-identical data across runs/backends of
this framework; statistical parity with the reference's distributions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SEED = 445560390295639063 % (2**32)


def make_iht_problem(m: int, n: int, k: int, seed: int = DEFAULT_SEED):
    """-> (Phi f32[m,n], x_star f32[n], y f32[m])."""
    key = jax.random.PRNGKey(seed)
    k_phi, k_perm = jax.random.split(key)
    phi = jax.random.uniform(k_phi, (m, n), jnp.float32, -1.0, 1.0)
    x = jnp.zeros((n,), jnp.float32).at[
        jax.random.permutation(k_perm, n)[:k]].set(1.0)
    y = phi @ x
    return phi, x, y


def make_gd_problem(m: int, n: int, seed: int = DEFAULT_SEED):
    """-> (Phi row-normalized f32[m,n], x_star in {-1,1}^n, y f32[m])."""
    key = jax.random.PRNGKey(seed)
    k_phi, k_x = jax.random.split(key)
    phi = jax.random.uniform(k_phi, (m, n), jnp.float32, -1.0, 1.0)
    phi = phi / jnp.linalg.norm(phi, axis=1, keepdims=True)
    x = jnp.where(jax.random.uniform(k_x, (n,)) < 0.5, -1.0, 1.0)
    y = phi @ x
    return phi, x, y
