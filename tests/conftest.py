"""Test config: run everything on a simulated 8-device CPU mesh.

Mirrors the reference's validation philosophy (SIMD vs scalar golden on
one machine, test/validate/*) with the TPU twist: sharded-op tests use
XLA's host-platform device simulation instead of a real pod.
"""

import os

# Must be set before jax initializes its backends.  Forced (not
# setdefault): the shell env pins JAX_PLATFORMS=axon (the tunneled TPU),
# but the test suite needs the 8-device CPU simulation.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_INTERPRET"] = "1"  # pallas kernels interpret on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# IEEE-exact fp on the CPU backend so deterministic-mode quantization is
# bit-exact against the NumPy golden (XLA CPU fast-math turns f32 division
# into a 1-ulp-off reciprocal multiply).
if "xla_cpu_enable_fast_math" not in flags:
    flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the env;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(445560390295639063 % (2**32))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules: one process
    cannot hold the whole suite's distinct XLA CPU executables — LLVM's
    JIT code arena exhausts after ~6k compiles (segfault inside
    compile_or_get_cached; the same failure mode forced the full
    validation sweep to be chunked across processes)."""
    yield
    jax.clear_caches()
