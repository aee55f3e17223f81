"""Tuned hyper-parameter tables — grid-search results baked back into
source, exactly as the reference does (test/performance/03_iht_gd_util.cpp:
30-447 hard-codes its offline searches).  These were produced by running
clover_tpu.harness.search on a real TPU v5e chip against this framework's
own quantized solvers (generation script: harness/search.run_search;
protocol: 50-iteration probes, convergence rule of 03_iht_gd_util.h:
120-204, quality target relaxed by 2% before iteration tuning).

Keyed by (m, n); K = n/4.  ``mu`` achieves the best quality; ``mu_fast`` /
``iters_fast`` reach quality/0.98 in the fewest iterations.  Qualities
land in the same band as the reference's searches (its 32768x65536 run
reports 0.8354 for all precisions, doc/results/gridsearch_iht_mixed.txt).
"""

# pure 4-bit matrix x 4-bit vector IHT
IHT_4BIT = {
    (256, 512): {"K": 128, "quality": 0.7920598983764648, "mu": 0.008262702226562502, "iters": 19, "mu_fast": 0.008008510382652285, "iters_fast": 5},
    (512, 1024): {"K": 256, "quality": 0.7996521592140198, "mu": 0.0031909350263671877, "iters": 12, "mu_fast": 0.003427354231262207, "iters_fast": 2},
    (1024, 2048): {"K": 512, "quality": 0.8307579755783081, "mu": 0.0014658408203125, "iters": 15, "mu_fast": 0.0017256211845397946, "iters_fast": 2},
    (2048, 4096): {"K": 1024, "quality": 0.8058519959449768, "mu": 0.0009666230687500001, "iters": 6, "mu_fast": 0.0010050263122558596, "iters_fast": 3},
    (4096, 8192): {"K": 2048, "quality": 0.8122503161430359, "mu": 0.0004704548, "iters": 5, "mu_fast": 0.0005050158681869508, "iters_fast": 1},
    (8192, 16384): {"K": 4096, "quality": 0.8173967599868774, "mu": 0.0002365647, "iters": 6, "mu_fast": 0.0002138596817016602, "iters_fast": 2},
}

# mixed 4-bit matrix x 8-bit vector IHT
IHT_MIXED_4X8 = {
    (256, 512): {"K": 128, "quality": 0.7936712503433228, "mu": 0.00586036328125, "iters": 10, "mu_fast": 0.005851208026123048, "iters_fast": 6},
    (512, 1024): {"K": 256, "quality": 0.8081196546554565, "mu": 0.002436297863769531, "iters": 5, "mu_fast": 0.002417605884552002, "iters_fast": 1},
    (1024, 2048): {"K": 512, "quality": 0.824662446975708, "mu": 0.0012094936767578122, "iters": 7, "mu_fast": 0.0011734448596954345, "iters_fast": 1},
    (2048, 4096): {"K": 1024, "quality": 0.8076170682907104, "mu": 0.0007151098999023437, "iters": 6, "mu_fast": 0.0006325218692779542, "iters_fast": 1},
    (4096, 8192): {"K": 2048, "quality": 0.8020535111427307, "mu": 0.0003235854, "iters": 5, "mu_fast": 0.0003254393535614014, "iters_fast": 1},
    (8192, 16384): {"K": 4096, "quality": 0.8101211190223694, "mu": 0.0001550108, "iters": 5, "mu_fast": 0.0001565439699172974, "iters_fast": 1},
}

# pure 4-bit GD (row-normalized Phi; mu swept 0.05..0.95 by 0.05)
GD_4BIT = {
    (256, 512): {"quality": 0.8412138819694519, "mu": 0.6, "iters": 2},
    (512, 1024): {"quality": 0.8441242575645447, "mu": 0.65, "iters": 1},
    (1024, 2048): {"quality": 0.8277890682220459, "mu": 0.9000000000000002, "iters": 1},
}

# mixed 4x8 GD
GD_MIXED_4X8 = {
    (256, 512): {"quality": 0.7411420941352844, "mu": 0.8500000000000002, "iters": 3},
    (512, 1024): {"quality": 0.7375496029853821, "mu": 0.7500000000000001, "iters": 3},
    (1024, 2048): {"quality": 0.7217530608177185, "mu": 0.8500000000000002, "iters": 3},
}


def lookup(kind: str, m: int, n: int):
    """kind in {"iht", "iht_mixed", "gd", "gd_mixed"} -> dict or None."""
    table = {"iht": IHT_4BIT, "iht_mixed": IHT_MIXED_4X8,
             "gd": GD_4BIT, "gd_mixed": GD_MIXED_4X8}[kind]
    return table.get((m, n))
