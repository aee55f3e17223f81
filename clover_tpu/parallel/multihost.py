"""Multi-host initialization and pod-level mesh construction.

The reference has no distributed layer (SURVEY §2.5); this is the
framework's scale-out entry point: ``jax.distributed`` over DCN for
process coordination, with the ("row", "col") compute mesh laid out so
that MVM psums ride ICI within a host/slice and only gradient-free
container movement crosses DCN.

Testable single-host via the CPU device simulation
(XLA_FLAGS=--xla_force_host_platform_device_count=N); on a real pod pass
coordinator_address/num_processes/process_id or rely on the TPU
auto-bootstrap (jax.distributed.initialize with no args).
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Bring up jax.distributed (idempotent); no-op on single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        # single-process / already-initialized environments
        pass


def pod_mesh(shape: tuple[int, int] | None = None):
    """Global ("row", "col") mesh over every addressable device in the
    pod.  Shard-boundary rules (64-block alignment) are enforced by
    parallel.mesh when containers are placed."""
    return make_mesh(n_devices=len(jax.devices()), shape=shape)


def is_coordinator() -> bool:
    return jax.process_index() == 0
