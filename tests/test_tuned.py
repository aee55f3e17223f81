"""Tuned tables: structure sanity + a real solve hitting the tuned quality
(the reference's analog check is its accuracy mode using searched mus)."""

import numpy as np
import pytest

from clover_tpu.harness.search import SearchProblem, _trace_verdict
from clover_tpu.models import problems, tuned


def test_lookup_structure():
    for kind, table in (("iht", tuned.IHT_4BIT),
                        ("iht_mixed", tuned.IHT_MIXED_4X8),
                        ("gd", tuned.GD_4BIT),
                        ("gd_mixed", tuned.GD_MIXED_4X8)):
        assert table, kind
        for (m, n), row in table.items():
            assert n == 2 * m
            assert 0 < row["mu"] < 1
            assert 0 < row["quality"] < 2
            assert tuned.lookup(kind, m, n) == row
    assert tuned.lookup("iht", 3, 5) is None


def test_family_tables_structure():
    """Round-3 full-granularity tables: the reference's full 19-size
    ladder plus 4 extra sizes x 4 families x 4 precision columns
    (reference granularity, 03_iht_gd_util.cpp:30-447;
    00_test.cpp:75-95); HBM-skipped columns are explicit Nones, never
    missing keys."""
    fams = (("iht", tuned.IHT_PURE_FAMILY, False),
            ("iht_mixed", tuned.IHT_MIXED_FAMILY, False),
            ("gd", tuned.GD_PURE_FAMILY, True),
            ("gd_mixed", tuned.GD_MIXED_FAMILY, True))
    for kind, table, gd in fams:
        assert len(table) >= 19, kind
        for (m, n), row in table.items():
            assert (m == int(1.5 * n)) if gd else (n == 2 * m), (kind, m, n)
            assert 0 < row["quality_target"] < 2
            for bits in (4, 8, 16, 32):
                assert bits in row, (kind, m, n, bits)
                col = row[bits]
                if col is None:
                    continue
                it, mu = col
                assert 0 <= it <= 50 and 0 < mu <= 0.5
            assert tuned.lookup_family(kind, m, n) == row
            assert tuned.lookup_family(kind, m, n, bits=4) == row[4]
    assert tuned.lookup_family("iht", 3, 5) is None


def test_family_mu_reaches_target():
    """A recorded family column reproduces: at its (iterations, mu) the
    8-bit solver reaches the family's quality target."""
    m, n = 512, 1024
    row = tuned.lookup_family("iht", m, n)
    it8, mu8 = row[8]
    phi, x_star, y = problems.make_iht_problem(m, n, row["K"])
    prob = SearchProblem(phi, y, x_star, 8, 8, k=row["K"])
    got = prob.iterations_to(mu8, row["quality_target"])
    assert got <= max(it8, 1) + 1, (got, it8)


def test_tuned_mu_converges_on_its_problem():
    m, n = 256, 512
    row = tuned.lookup("iht", m, n)
    phi, x_star, y = problems.make_iht_problem(m, n, row["K"])
    prob = SearchProblem(phi, y, x_star, 4, 4, k=row["K"])
    r = prob.probe(row["mu"])
    assert r.convergent
    # within 15% of the recorded search quality (deterministic repro)
    assert r.quality <= row["quality"] * 1.15
