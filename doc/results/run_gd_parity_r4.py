"""Round-4 GD accuracy parity battery (VERDICT r3 item 6a).

Side-by-side of the reference's GD accuracy protocol (test_gd,
test/accuracy/00_accuracy.cpp:93-128: m=384, n=256, 500 iterations,
mu=0.4000000358) between

  * the from-source reference build (doc/results/refrun driver, gd mode)
    across 8 controlled SR seeds, and
  * this framework (models.accuracy.run_gd_accuracy) on the BIT-EXACT
    same (Phi, x*, y) instance (problems.make_gd_problem_reference,
    verified bit-identical to the reference build's dump), deterministic
    + 8 SR seeds, production path.

Usage:
  1. build refiht (doc/results/refrun/README.md), then
     for cfg in gd48 gd4 gd8 gd16 gd32: for seed in 1..8:
         CLOVER_SR_SEED=$seed ./refiht $cfg 0.4000000358 > refgd/${cfg}_s${seed}.log
  2. python doc/results/run_gd_parity_r4.py /path/to/refgd

Output: doc/results/gd_accuracy_parity_r4.txt (committed).
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

from clover_tpu.models.accuracy import run_gd_accuracy, GD_MU

SEEDS = 8
MILESTONES = [0, 9, 49, 99, 249, 499]          # iterations 1,10,50,100,250,500
CONFIGS = [("4x8", "gd48"), (4, "gd4"), (8, "gd8"), (16, "gd16"),
           (32, "gd32")]


def parse_ref(path):
    """refiht gd log -> f32[500] trajectory."""
    tr = []
    pat = re.compile(r"^\s*(\d+)\s*\|\s*([0-9.e+-]+|inf|nan)\s*$")
    for line in open(path):
        m = pat.match(line)
        if m:
            tr.append(float(m.group(2)))
    return np.asarray(tr, np.float64)


def fmt(v):
    return "     inf" if not np.isfinite(v) else f"{v:8.6f}"


def row(tag, tr):
    cells = "  ".join(fmt(tr[i]) for i in MILESTONES if i < len(tr))
    print(f"    {tag:8s} {cells}", flush=True)
    return tr


def main():
    refdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refgd"
    print(f"jax {jax.__version__} backend={jax.default_backend()} "
          f"mu={GD_MU}", flush=True)
    print(f"milestone iterations: "
          f"{[i + 1 for i in MILESTONES]}", flush=True)

    for config, refcfg in CONFIGS:
        sr = config in (4, 8, "4x8")
        print(f"\n== config {config} ==", flush=True)

        print("  reference (from-source build, 8 SR seeds):", flush=True)
        ref_final = []
        for s in range(1, 9):
            p = os.path.join(refdir, f"{refcfg}_s{s}.log")
            if not os.path.exists(p):
                print(f"    (missing {p})", flush=True)
                continue
            tr = parse_ref(p)
            row(f"seed {s}", tr)
            ref_final.append(tr[-1])
            if not sr:
                break                    # 16/32-bit have no SR: one run
        if ref_final:
            print(f"    median final: {np.median(ref_final):.6f}",
                  flush=True)

        print("  this framework (bit-exact same instance):", flush=True)
        t0 = time.time()
        tr = np.asarray(run_gd_accuracy(config, key=None, data="reference"))
        row("det", tr)
        own_final = []
        if sr:
            for s in range(SEEDS):
                tr = np.asarray(run_gd_accuracy(
                    config, key=jax.random.PRNGKey(s), data="reference"))
                row(f"key {s}", tr)
                own_final.append(tr[-1])
            print(f"    median final: {np.median(own_final):.6f}",
                  flush=True)
        print(f"    [{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
