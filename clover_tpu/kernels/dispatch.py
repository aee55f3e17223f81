"""Kernel dispatch policy: when to use Pallas vs the portable XLA path."""

from __future__ import annotations

import os
from functools import lru_cache

import jax


def pallas_interpret() -> bool:
    """Run kernels in interpreter mode (CPU test mesh)."""
    return os.environ.get("PALLAS_INTERPRET", "0") == "1"


@lru_cache(maxsize=1)
def _backend() -> str:
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
