"""Solvers ("model families") built on the quantized ops: quantized
gradient descent and iterative hard thresholding, with problem generators,
accuracy protocols, and hyper-parameter search."""

from . import tuned
from .problems import make_gd_problem, make_iht_problem
from .solvers import SolveResult, gd, iht
from .accuracy import ACCURACY_MU, run_gd_accuracy, run_iht_accuracy

__all__ = [
    "iht", "gd", "SolveResult",
    "make_iht_problem", "make_gd_problem",
    "ACCURACY_MU", "run_iht_accuracy", "run_gd_accuracy", "tuned",
]
