"""Evaluation subsystem (rebuild of the reference's ``Testing/``,
SURVEY.md §2.1 #11): classifier test error, class-conditional sample grids,
and Inception-style score for conditional generation."""

from triplegan_tpu.eval.metrics import evaluate_error
from triplegan_tpu.eval.sample import make_sample_fn, to_uint8_grid, save_png
from triplegan_tpu.eval.inception import inception_score

__all__ = [
    "evaluate_error",
    "make_sample_fn",
    "to_uint8_grid",
    "save_png",
    "inception_score",
]
