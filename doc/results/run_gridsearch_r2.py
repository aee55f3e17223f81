"""Round-2 grid-search driver: reference-scale size sweep on the real TPU.

Reference sweeps 19 sizes up to 32768x65536 (test/search/00_search.cpp:
130-151, hard-coded back into 03_iht_gd_util.cpp:30-447).  This driver
covers 12 IHT sizes (pure 4-bit + mixed 4x8) up to 32768x65536 and 8 GD
sizes, writing gridsearch_r2_tpu_v5e.txt and a tuned.py-ready snippet.

Run:  python doc/results/run_gridsearch_r2.py  (takes ~30-60 min)
"""

import sys, time, traceback

sys.path.insert(0, "/root/repo")

from clover_tpu.harness.search import run_search

IHT_SIZES = [(256, 512), (384, 768), (512, 1024), (768, 1536),
             (1024, 2048), (1536, 3072), (2048, 4096), (3072, 6144),
             (4096, 8192), (8192, 16384), (16384, 32768),
             (32768, 65536)]
GD_SIZES = [(256, 512), (384, 768), (512, 1024), (1024, 2048),
            (2048, 4096), (4096, 8192), (8192, 16384), (16384, 32768)]


def main():
    out = open("/root/repo/doc/results/gridsearch_r2_tpu_v5e.txt", "w")

    def log(*a):
        line = " ".join(str(x) for x in a)
        out.write(line + "\n")
        out.flush()

    results = {}
    for name, sizes, kw in [
        ("IHT_4BIT", IHT_SIZES, dict(mixed=False, gd=False)),
        ("IHT_MIXED_4X8", IHT_SIZES, dict(mixed=True, gd=False)),
        ("GD_4BIT", GD_SIZES, dict(mixed=False, gd=True)),
        ("GD_MIXED_4X8", GD_SIZES, dict(mixed=True, gd=True)),
    ]:
        log(f"==== {name} ====")
        rows = []
        for (m, n) in sizes:
            t0 = time.time()
            try:
                r = run_search(sizes=[(m, n)], log=lambda *_: None, **kw)
                rows.extend(r)
                log(f"{name} {m}x{n}: q={r[0][3]:.6f} mu={r[0][4]:.8g} "
                    f"iters={r[0][5]} ({time.time()-t0:.0f}s)")
            except Exception as e:
                log(f"{name} {m}x{n}: FAILED {type(e).__name__}: {e}")
                traceback.print_exc()
        results[name] = rows

    # tuned.py-ready snippet
    log("\n==== tuned.py snippet ====")
    for name, rows in results.items():
        log(f"{name} = {{")
        for (m, n, k, q, mu, it) in rows:
            if name.startswith("IHT"):
                log(f"    ({m}, {n}): {{\"K\": {k}, \"quality\": {q!r}, "
                    f"\"mu\": {mu!r}, \"iters\": {it}}},")
            else:
                log(f"    ({m}, {n}): {{\"quality\": {q!r}, "
                    f"\"mu\": {mu!r}, \"iters\": {it}}},")
        log("}")
    out.close()
    print("DONE")


if __name__ == "__main__":
    main()
