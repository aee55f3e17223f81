"""Harness smoke tests: validation suite (condensed), convergence probe
semantics, search machinery, CLI plumbing, debug printers."""

import numpy as np
import jax.numpy as jnp
import pytest

import clover_tpu as ct
from clover_tpu.harness import search, validate
from clover_tpu.harness.search import SearchProblem, _trace_verdict
from clover_tpu.models import problems
from clover_tpu.utils.debug import compare, format_blocks, format_qvec


def test_trace_verdict_semantics():
    # converges: improvement dries up below 0.001 at a loss < 2
    tr = np.array([1.5, 0.8, 0.5, 0.4995, 0.49949], np.float32)
    r = _trace_verdict(tr)
    assert r.convergent and abs(r.quality - 0.4995) < 1e-6 and r.n_iter == 4
    # NaN anywhere -> divergent
    assert not _trace_verdict(np.array([1.0, np.nan, 0.1])).convergent
    # flat but above the loss bound -> divergent
    assert not _trace_verdict(np.array([3.0, 2.9999, 2.99985])).convergent
    # monotone descent to the end -> quality is the final loss
    r = _trace_verdict(np.array([2.0, 1.0, 0.5], np.float32))
    assert r.convergent and abs(r.quality - 0.5) < 1e-6


def test_search_problem_probe_and_iterations():
    phi, x_star, y = problems.make_iht_problem(128, 256, 16)
    prob = SearchProblem(phi, y, x_star, 4, 4, k=16, iteration_limit=30)
    good = prob.probe(3e-3)
    bad = prob.probe(0.5)          # way past the convergence boundary
    assert good.convergent
    assert not bad.convergent
    it = prob.iterations_to(3e-3, quality_target=good.quality / 0.98)
    assert 0 <= it <= 30


@pytest.mark.parametrize("mat_bits,vec_bits",
                         [(4, 8), (8, 8), (16, 16), (32, 32)])
def test_search_problem_all_precisions(mat_bits, vec_bits):
    """The per-precision columns of the reference's -g
    (00_search.cpp:229-238) need SearchProblem at every precision."""
    phi, x_star, y = problems.make_iht_problem(128, 256, 16)
    prob = SearchProblem(phi, y, x_star, mat_bits, vec_bits, k=16,
                         iteration_limit=20)
    r = prob.probe(3e-3)
    assert r.convergent and np.isfinite(r.quality)
    it = prob.iterations_to(3e-3, quality_target=r.quality / 0.98)
    assert 0 <= it <= 20


def test_gd_find_best_n_iterations():
    phi, x_star, y = problems.make_gd_problem(96, 64)
    prob = SearchProblem(phi, y, x_star, 8, 8, k=0, iteration_limit=25)
    q, mu = search.gd_best_possible_quality(prob, 0.1, 0.5, 0.1)
    it, mu_b = search.gd_find_best_n_iterations(
        prob, q / 0.9, lo=0.1, hi=0.5, precision=0.1)
    assert 0 <= it <= 25 and 0.1 <= mu_b <= 0.5


def test_iht_best_quality_small():
    phi, x_star, y = problems.make_iht_problem(128, 256, 16)
    prob = SearchProblem(phi, y, x_star, 4, 4, k=16, iteration_limit=30)
    q, mu, it = search.iht_best_possible_quality(
        prob, lo=1e-4, hi=0.05, precision=1e-3)
    assert q < 2.0 and 1e-4 <= mu <= 0.05 and 1 <= it <= 30


def test_validator_condensed():
    ok = validate.run_validation(full=False, log=lambda *_: None)
    assert ok


def test_cli_help_and_accuracy_smoke(capsys):
    from clover_tpu.cli import main
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "validation" in out or "validate" in out


def test_debug_printers():
    q = ct.quantize(jnp.asarray(np.linspace(-1, 1, 200, dtype=np.float32)), 4)
    s = format_qvec(q, max_elems=8)
    assert "code" in s and "scale" in s
    c = compare([1, 2, 3], [1, 9, 3])
    assert "mismatch" in c
    assert "[     0]" in format_blocks(np.arange(32))


def test_checkpoint_roundtrip(tmp_path):
    from clover_tpu.utils import checkpoint
    q = ct.quantize(jnp.asarray(np.linspace(-1, 1, 256, dtype=np.float32)), 4)
    state = {"x": q, "step": jnp.int32(7)}
    path = str(tmp_path / "ck")
    checkpoint.save(path, state)
    back = checkpoint.load(path, like=state)
    assert np.array_equal(np.asarray(back["x"].codes), np.asarray(q.codes))
    assert np.array_equal(np.asarray(back["x"].scales), np.asarray(q.scales))
    assert back["x"].length == 256 and int(back["step"]) == 7
