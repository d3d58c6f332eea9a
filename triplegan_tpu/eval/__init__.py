"""Evaluation subsystem (rebuild of the reference's ``Testing/``,
SURVEY.md §2.1 #11): classifier test error, class-conditional sample grids,
Inception-style score for conditional generation, and FID (beyond-parity
extra — see eval/fid.py)."""

from triplegan_tpu.eval.metrics import evaluate_error
from triplegan_tpu.eval.sample import make_sample_fn, to_uint8_grid, save_png
from triplegan_tpu.eval.inception import inception_score
from triplegan_tpu.eval.fid import fid_score, frechet_distance

__all__ = [
    "evaluate_error",
    "make_sample_fn",
    "to_uint8_grid",
    "save_png",
    "inception_score",
    "fid_score",
    "frechet_distance",
]
