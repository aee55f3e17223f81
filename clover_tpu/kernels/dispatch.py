"""Kernel dispatch policy: when to use Pallas vs the portable XLA path."""

from __future__ import annotations

import os


import jax
import jax.numpy as jnp

# Large odd constants for deriving per-op SR seed streams by integer
# arithmetic (no threefry on the critical path).
SEED_GOLD = -1640531527           # 0x9E3779B9 as int32 (golden-ratio mix)
SEED_OP = 40503                   # per-op stride within an iteration


def seed_from(key):
    """Normalize an SR randomness argument to (int32[1] seed, noise_flag).

    Accepts: None (deterministic), a Python int, an int32 scalar/(1,)
    array (cheap carried seed — the solver hot path), or a JAX PRNG key
    (one threefry draw to derive the seed).
    """
    if key is None:
        return jnp.zeros((1,), jnp.int32), False
    if isinstance(key, int):
        return jnp.asarray([key], jnp.int32), True
    arr = jnp.asarray(key)
    if arr.dtype == jnp.int32:
        return arr.reshape(1), True
    return jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32), True


def pallas_interpret() -> bool:
    """Run kernels in interpreter mode (CPU test mesh, or any non-TPU
    backend where Mosaic cannot compile)."""
    if os.environ.get("PALLAS_INTERPRET", "0") == "1":
        return True
    return _backend() != "tpu"


def _backend() -> str:
    # NOT cached: the driver's dryrun flips jax_platforms mid-process.
    return jax.default_backend()


def pallas_enabled() -> bool:
    """Kernels engage on TPU by default; ``CLOVER_PALLAS=0/1`` overrides.

    Note: ``PALLAS_INTERPRET=1`` alone does NOT flip dispatch — the CPU
    test suite validates kernels explicitly (tests/test_kernels.py) while
    the rest of the suite exercises the portable XLA paths at full speed.
    """
    force = os.environ.get("CLOVER_PALLAS")
    if force is not None:
        return force == "1"
    return _backend() == "tpu"
