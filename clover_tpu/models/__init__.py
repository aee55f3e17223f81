"""Solvers ("model families") built on the quantized ops: quantized
gradient descent and iterative hard thresholding, with problem generators,
accuracy protocols, and hyper-parameter search."""

from . import tuned
from .batch import BatchSolveResult, gd_batched, iht_batched
from .problems import make_gd_problem, make_iht_problem
from .solvers import SolveResult, gd, iht
from .accuracy import ACCURACY_MU, run_gd_accuracy, run_iht_accuracy

__all__ = [
    "iht", "gd", "SolveResult",
    "iht_batched", "gd_batched", "BatchSolveResult",
    "make_iht_problem", "make_gd_problem",
    "ACCURACY_MU", "run_iht_accuracy", "run_gd_accuracy", "tuned",
]
