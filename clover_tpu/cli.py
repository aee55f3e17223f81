"""CLI with the reference's four modes (src/main.cpp:16-50):

    python -m clover_tpu -v   validation   (kernels vs golden oracle)
    python -m clover_tpu -p   performance  (bandwidth/roofline tables)
    python -m clover_tpu -a   accuracy     (IHT/GD solver quality traces)
    python -m clover_tpu -g   grid search  (best mu / iterations per size)
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="clover_tpu",
        description="TPU-native block-scaled quantized linear algebra")
    p.add_argument("-v", "--validate", action="store_true",
                   help="validate production kernels against the golden "
                        "oracle across size sweeps")
    p.add_argument("-p", "--performance", action="store_true",
                   help="run the performance benchmark tables")
    p.add_argument("-a", "--accuracy", action="store_true",
                   help="run the IHT accuracy protocol (all precisions)")
    p.add_argument("-g", "--grid-search", action="store_true",
                   help="hyper-parameter grid search (best mu/iterations)")
    p.add_argument("--full", action="store_true",
                   help="exhaustive size sweeps (validation)")
    p.add_argument("--quick", action="store_true",
                   help="reduced size set (performance / search)")
    p.add_argument("--gd", action="store_true",
                   help="use gradient descent instead of IHT (-a, -g)")
    p.add_argument("--epochs", type=int, default=200,
                   help="accuracy-mode epochs (default 200)")
    p.add_argument("--no-sr", action="store_true",
                   help="disable stochastic rounding (deterministic mode)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .harness.sysinfo import print_banner
    from .utils.compcache import enable as enable_compcache

    enable_compcache()

    if not any((args.validate, args.performance, args.accuracy,
                args.grid_search)):
        build_parser().print_help()
        return 0

    print_banner()
    print()

    ok = True
    if args.validate:
        from .harness.validate import run_validation
        ok = run_validation(full=args.full) and ok
    if args.performance:
        from .harness.perf import run_perf
        run_perf(quick=args.quick)
    if args.accuracy:
        from .harness.accuracy import run_accuracy
        run_accuracy(epochs=args.epochs, sr=not args.no_sr, gd=args.gd)
    if args.grid_search:
        from .harness.search import SEARCH_SIZES, run_search
        sizes = SEARCH_SIZES[:2] if args.quick else SEARCH_SIZES
        rows = run_search(sizes=sizes, gd=args.gd)
        print(f"\n{'m':>8} {'n':>8} {'K':>8} {'quality':>10} "
              f"{'mu':>14} {'iters':>6}")
        for (m, n, k, q, mu, it) in rows:
            print(f"{m:>8} {n:>8} {k:>8} {q:>10.6f} {mu:>14.8f} {it:>6}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
