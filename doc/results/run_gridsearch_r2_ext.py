"""Round-2 extension: the 11 reference sizes missing from the first sweep.

The reference grid-searches 19 matrix sizes m = 128*{2,4,8,16,32,48,64,
80,96,112,128,144,160,176,192,208,224,240,256} with n = 2m, K = n/4
(test/performance/00_test.cpp:75-95, test/search/00_search.cpp:130-151).
run_gridsearch_r2.py covered 12 sizes; this run adds the remaining
reference sizes so models/tuned.py reaches full 19-size parity (plus the
4 extra intermediate sizes the first sweep added).

Run:  python doc/results/run_gridsearch_r2_ext.py   (~20-30 min)
"""

import sys, time, traceback

sys.path.insert(0, "/root/repo")

from clover_tpu.harness.search import run_search

EXT_SIZES = [(6144, 12288), (10240, 20480), (12288, 24576),
             (14336, 28672), (18432, 36864), (20480, 40960),
             (22528, 45056), (24576, 49152), (26624, 53248),
             (28672, 57344), (30720, 61440)]


def main():
    out = open("/root/repo/doc/results/gridsearch_r2_ext_tpu_v5e.txt", "w")

    def log(*a):
        line = " ".join(str(x) for x in a)
        out.write(line + "\n")
        out.flush()
        print(line, flush=True)

    results = {}
    for name, kw in [
        ("IHT_4BIT", dict(mixed=False, gd=False)),
        ("IHT_MIXED_4X8", dict(mixed=True, gd=False)),
        ("GD_4BIT", dict(mixed=False, gd=True)),
        ("GD_MIXED_4X8", dict(mixed=True, gd=True)),
    ]:
        log(f"==== {name} ====")
        rows = []
        for (m, n) in EXT_SIZES:
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

    log("\n==== tuned.py snippet ====")
    for name, rows in results.items():
        log(f"{name}_EXT = {{")
        for (m, n, k, q, mu, it) in rows:
            if name.startswith("IHT"):
                log(f"    ({m}, {n}): {{\"K\": {k}, \"quality\": {q!r}, "
                    f"\"mu\": {mu!r}, \"iters\": {it}}},")
            else:
                log(f"    ({m}, {n}): {{\"quality\": {q!r}, "
                    f"\"mu\": {mu!r}, \"iters\": {it}}},")
        log("}")
    out.close()


if __name__ == "__main__":
    main()
