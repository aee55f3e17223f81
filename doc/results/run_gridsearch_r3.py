"""Round-3 full-granularity grid search regeneration (VERDICT r2 item 2).

Per size and family (GD/IHT x pure/mixed), the reference's -g protocol:
4-bit config searches best quality, target relaxed (/0.98 IHT, /0.9 GD),
then ALL FOUR precisions tune (iterations, mu) to the target
(test/search/00_search.cpp:130-263).  Sizes: harness.search.SEARCH_SIZES_FULL
(12 sizes, 256..32768).  Runs size-major and appends one JSON line per
completed (kind, size) row to gridsearch_r3_rows.jsonl so partial progress
is always usable; the human-readable log goes to stdout.

Results are baked into models/tuned.py (*_FAMILY tables).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from clover_tpu.utils.compcache import enable as enable_compcache
enable_compcache()

import jax

from clover_tpu.harness.search import SEARCH_SIZES_FULL, search_family

OUT = os.path.join(os.path.dirname(__file__), "gridsearch_r3_rows.jsonl")
KINDS = ("gd", "iht", "gd_mixed", "iht_mixed")


def main():
    print(f"jax {jax.__version__} backend={jax.default_backend()}", flush=True)
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                r = json.loads(line)
                if "error" not in r:      # failed rows retry on resume
                    done.add((r["kind"], r["size"]))
        print(f"resuming: {len(done)} rows already done", flush=True)
    for size in SEARCH_SIZES_FULL:
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
