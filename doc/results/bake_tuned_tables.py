"""Bake gridsearch_r3_rows.jsonl into models/tuned.py's *_FAMILY tables.

Takes the LAST completed row per (kind, size) (the jsonl is resumable
append-only), sorts by (m, n), and rewrites each FAMILY dict literal in
place.  Run after run_gridsearch_r3.py / run_gridsearch_ladder_r3.py.
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROWS = os.path.join(HERE, "gridsearch_r3_rows.jsonl")
TUNED = os.path.join(HERE, "..", "..", "clover_tpu", "models", "tuned.py")

NAME = {"iht": "IHT_PURE_FAMILY", "iht_mixed": "IHT_MIXED_FAMILY",
        "gd": "GD_PURE_FAMILY", "gd_mixed": "GD_MIXED_FAMILY"}


def main():
    rows = {}
    with open(ROWS) as f:
        for line in f:
            r = json.loads(line)
            if "error" in r or r.get("m") is None:
                continue
            rows[(r["kind"], r["size"])] = r    # last wins

    tables = {k: {} for k in NAME}
    for (kind, _size), r in rows.items():
        cols = {}
        for b, v in r["cols"].items():
            cols[int(b)] = None if v is None else (int(v[0]), float(v[1]))
        tables[kind][(r["m"], r["n"])] = (r["K"], r["quality_target"],
                                          cols)

    src = open(TUNED).read()
    for kind, name in NAME.items():
        body_lines = []
        for (m, n) in sorted(tables[kind]):
            K, qt, cols = tables[kind][(m, n)]
            cs = ", ".join(
                f"{b}: {'None' if v is None else f'({v[0]}, {v[1]!r})'}"
                for b, v in sorted(cols.items()))
            body_lines.append(
                f"    ({m}, {n}): {{\"K\": {K}, "
                f"\"quality_target\": {qt!r},\n        {cs}}},")
        block = name + " = {\n" + "\n".join(body_lines) + "\n}"
        pat = re.compile(re.escape(name) + r" = \{.*?\n\}", re.S)
        assert pat.search(src), name
        src = pat.sub(lambda _m: block, src, count=1)
    open(TUNED, "w").write(src)
    sizes = {k: len(v) for k, v in tables.items()}
    print(f"baked: {sizes}")


if __name__ == "__main__":
    main()
