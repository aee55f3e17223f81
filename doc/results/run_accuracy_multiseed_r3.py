"""Round-3 multi-seed accuracy battery (VERDICT r2 item 1).

Runs the IHT accuracy protocol on the REFERENCE's bit-exact problem
instance (models/problems.make_iht_problem_reference) for all five
precision configs at the reference's published mu values
(test/accuracy/00_accuracy.cpp:74-78), deterministic + 8 SR seeds each,
on the production path (Pallas kernels on TPU).  Then sweeps mu for the
mixed 4x8 config on this framework's own threefry instance to locate the
instance-specific stability boundary (paired with the from-source
reference-build runs recorded in mixed48_rootcause_r3.md).

Output: doc/results/accuracy_multiseed_r3.txt
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

from clover_tpu.models.accuracy import run_iht_accuracy, ACCURACY_MU

SEEDS = 8


def fmt(v):
    return "inf" if not np.isfinite(v) else f"{v:.6f}"


def run_config(config, data, mu=None, seeds=SEEDS, epochs=200):
    finals, ep50s = [], []
    tr = np.asarray(run_iht_accuracy(config, epochs=epochs, mu=mu,
                                     key=None, data=data))
    print(f"  det    : ep50={fmt(tr[49])} final={fmt(tr[-1])}", flush=True)
    sr = config in (4, 8, "4x8")
    if not sr:
        return [float(tr[-1])]
    for s in range(seeds):
        tr = np.asarray(run_iht_accuracy(config, epochs=epochs, mu=mu,
                                         key=jax.random.PRNGKey(s), data=data))
        finals.append(float(tr[-1]))
        ep50s.append(float(tr[49]))
        print(f"  seed {s} : ep50={fmt(tr[49])} final={fmt(tr[-1])}",
              flush=True)
    conv = [f for f in finals if np.isfinite(f) and f < 10]
    print(f"  summary: converged {len(conv)}/{seeds}"
          + (f"  median={np.median(conv):.6f} worst={max(conv):.6f}"
             if conv else ""), flush=True)
    return finals


def main():
    print(f"jax {jax.__version__} backend={jax.default_backend()} "
          f"devices={jax.devices()}", flush=True)

    print("\n=== Reference problem instance (bit-exact clover -a data), "
          "reference mu, production path ===", flush=True)
    for config in ["4x8", 4, 8, 16, 32]:
        t0 = time.time()
        print(f"config {config} (mu={ACCURACY_MU[config]:.8f}):", flush=True)
        run_config(config, data="reference")
        print(f"  [{time.time() - t0:.0f}s]", flush=True)

    print("\n=== Threefry instance (framework generator), mixed 4x8 mu sweep "
          "===", flush=True)
    for mu in [0.0045, 0.0048, 0.0051299855, 0.0054]:
        print(f"mu={mu:.7f}:", flush=True)
        run_config("4x8", data="threefry", mu=mu)

    print("\n=== Threefry instance, pure 4-bit at reference mu ===",
          flush=True)
    print(f"mu={ACCURACY_MU[4]:.8f}:", flush=True)
    run_config(4, data="threefry")


if __name__ == "__main__":
    main()
