"""Complete the tuned tables to the reference's FULL 19-size ladder.

run_gridsearch_r3.py covered 12 sizes (256..32768, power-of-2-ish);
this adds the reference ladder's remaining mid-range steps
(test/performance/00_test.cpp:75-95: 2048-stride from 6144 up), writing
to the same resumable jsonl.  Results merge into models/tuned.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from clover_tpu.utils.compcache import enable as enable_compcache
enable_compcache()

import jax

from clover_tpu.harness.search import SIZE_LADDER, search_family

OUT = os.path.join(os.path.dirname(__file__), "gridsearch_r3_rows.jsonl")
KINDS = ("gd", "iht", "gd_mixed", "iht_mixed")


def main():
    print(f"jax {jax.__version__} backend={jax.default_backend()}",
          flush=True)
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                r = json.loads(line)
                if "error" not in r:
                    done.add((r["kind"], r["size"]))
    todo = [s for s in SIZE_LADDER
            if any((k, s) not in done for k in KINDS)]
    print(f"ladder sizes to complete: {todo}", flush=True)
    for size in todo:
        for kind in KINDS:
            if (kind, size) in done:
                continue
            t0 = time.time()
            try:
                row = search_family(kind, size, log=lambda *a: None)
            except Exception as e:
                print(f"{kind} size={size} FAILED: {e}", flush=True)
                row = {"m": None, "n": None, "K": None,
                       "quality_target": None, "cols": {}, "error": str(e)}
            rec = dict(row, kind=kind, size=size,
                       seconds=round(time.time() - t0, 1))
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            cols = ", ".join(
                f"{b}:{'SKIP' if v is None else f'it={v[0]} mu={v[1]:.3e}'}"
                for b, v in row["cols"].items())
            print(f"{kind} {row['m']}x{row['n']} K={row['K']} "
                  f"target={row['quality_target']} | {cols} "
                  f"[{rec['seconds']}s]", flush=True)


if __name__ == "__main__":
    main()
