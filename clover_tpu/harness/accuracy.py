"""`-a` accuracy mode: the reference's end-to-end solver-quality protocol
(test/accuracy/00_accuracy.cpp:36-128) — IHT at m=512, n=1024, K=64 for
200 epochs at per-precision tuned mu, printing the relative recovery error
per epoch for all five precision configs; plus the GD variant."""

from __future__ import annotations

import numpy as np
import jax

from ..models.accuracy import ACCURACY_MU, GD_MU, run_gd_accuracy, \
    run_iht_accuracy

CONFIGS = ["4x8", 4, 8, 16, 32]


def run_accuracy(epochs: int = 200, every: int = 10, sr: bool = True,
                 gd: bool = False, log=print):
    """Run all five precision configs; return {config: trace}."""
    out = {}
    for cfg in CONFIGS:
        key = jax.random.PRNGKey(0) if sr else None
        name = cfg if isinstance(cfg, str) else f"{cfg}-bit"
        log(f"=== {'GD' if gd else 'IHT'} accuracy: {name} "
            f"(mu={GD_MU if gd else ACCURACY_MU[cfg]:.8f}) ===")
        if gd:
            trace = run_gd_accuracy(cfg, iterations=epochs, key=key)
        else:
            trace = run_iht_accuracy(cfg, epochs=epochs, key=key)
        trace = np.asarray(trace)
        for i in range(0, len(trace), every):
            log(f"  epoch {i + 1:4d}: ||x - x*|| / ||x*|| = {trace[i]:.6f}")
        log(f"  final: {trace[-1]:.6f}")
        out[cfg] = trace
    return out
