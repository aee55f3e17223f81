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


def test_tuned_mu_converges_on_its_problem():
    m, n = 256, 512
    row = tuned.lookup("iht", m, n)
    phi, x_star, y = problems.make_iht_problem(m, n, row["K"])
    prob = SearchProblem(phi, y, x_star, 4, 4, k=row["K"])
    r = prob.probe(row["mu"])
    assert r.convergent
    # within 15% of the recorded search quality (deterministic repro)
    assert r.quality <= row["quality"] * 1.15
