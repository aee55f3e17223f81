"""Persistent XLA compilation cache for repeated harness runs.

The reference pays zero compile cost (C++ AOT); on TPU every jitted
chain/kernel costs seconds of (remote) XLA compilation per process.
Enabling JAX's persistent compilation cache makes every harness / bench
invocation after the first start near-instantly, which is what keeps the
CLI's -p/-g modes usable on the tunnel-attached chip.

Opt-out: set CLOVER_NO_COMPCACHE=1 (or pass enable(None)).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = _DEFAULT) -> str | None:
    """Point jax at a persistent compilation cache directory.

    No-op when CLOVER_NO_COMPCACHE is set, when a cache dir is already
    configured, or when path is None.  Returns the active cache dir.
    """
    import jax

    if path is None or os.environ.get("CLOVER_NO_COMPCACHE"):
        return None
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compile that takes measurable time (default threshold
    # is 1s; Pallas kernels and solver chains all clear it, but small
    # eager helpers benefit too).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
