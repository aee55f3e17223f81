"""Chunked full validation sweep (VERDICT r3 "missing" #1).

Runs `python -m clover_tpu -v --full`'s exact ranges — every vector size
128..2047 (each padding phase) and all 100 matrix shapes
{128..1280}x{128..1280}, the reference's own sweep
(test/validate/02_vector.cpp:557-641, 03_matrix.cpp:576-645) — on the
CPU backend, split across subprocesses: one process cannot hold the
~27k distinct XLA CPU executables (LLVM's JIT code arena exhausts with
"Cannot allocate memory" around ~5k compiles; first attempt died at
n=503).

Usage:  python doc/results/run_validate_full_r4.py [logfile]
Exit 0 iff every chunk reports 0 failures.
"""

import subprocess
import sys
import time

LOG = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/repo/doc/results/validate_full_r4.log"

CHUNK_SRC = """
import os, sys
os.environ['CLOVER_NO_COMPCACHE'] = '1'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_cpu_enable_fast_math=false')
import jax
jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', jax.default_backend()
sys.path.insert(0, '/root/repo')
from clover_tpu.harness.validate import run_validation
kind, lo, hi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
if kind == 'vec':
    ok = run_validation(vec_sizes=list(range(lo, hi)))
else:
    shapes = [(mm, nn) for mm in range(128, 1281, 128)
              for nn in range(128, 1281, 128)][lo:hi]
    ok = run_validation(mat_shapes=shapes)
sys.exit(0 if ok else 1)
"""


def main():
    chunks = []
    for lo in range(128, 2048, 160):
        chunks.append(("vec", lo, min(lo + 160, 2048)))
    for lo in range(0, 100, 25):
        chunks.append(("mat", lo, lo + 25))

    t0 = time.time()
    failures = 0
    with open(LOG, "a") as f:
        f.write(f"\n=== chunked full sweep start ({len(chunks)} chunks) "
                f"===\n")
        f.flush()
        for kind, lo, hi in chunks:
            r = subprocess.run(
                [sys.executable, "-c", CHUNK_SRC, kind, str(lo), str(hi)],
                stdout=f, stderr=subprocess.STDOUT)
            failures += (r.returncode != 0)
            f.write(f"--- chunk {kind} [{lo},{hi}) rc={r.returncode} "
                    f"t={time.time()-t0:.0f}s ---\n")
            f.flush()
        f.write(f"=== full sweep done: {failures} failed chunks, "
                f"{time.time()-t0:.0f}s ===\n")
    print(f"{failures} failed chunks")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
