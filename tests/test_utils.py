"""Direct unit tests for the observability helpers (SURVEY.md §2.1 #12, §5):
MetricsLogger's JSONL contract and evaluate_error's accumulation edge cases
(previously only covered indirectly through the training loop)."""

import json

import numpy as np

from triplegan_tpu.eval.metrics import evaluate_error
from triplegan_tpu.utils.logging import MetricsLogger


def test_metrics_logger_jsonl_and_image(tmp_path):
    wd = str(tmp_path)
    logger = MetricsLogger(wd, use_tensorboard=False)
    logger.scalars(3, {"loss": 1.5, "err": 0.25}, prefix="p_")
    logger.scalars(4, {"loss": 1.25})
    logger.image(4, "samples", np.zeros((8, 8), np.uint8))  # no-op without tb
    logger.close()
    rows = [json.loads(l) for l in open(f"{wd}/metrics.jsonl")]
    assert rows[0]["step"] == 3 and rows[0]["p_loss"] == 1.5 and rows[0]["p_err"] == 0.25
    assert rows[1]["step"] == 4 and rows[1]["loss"] == 1.25
    assert all("time" in r for r in rows)


def test_metrics_logger_appends_on_resume(tmp_path):
    wd = str(tmp_path)
    for step in (1, 2):
        logger = MetricsLogger(wd, use_tensorboard=False)
        logger.scalars(step, {"x": float(step)})
        logger.close()
    rows = [json.loads(l) for l in open(f"{wd}/metrics.jsonl")]
    assert [r["step"] for r in rows] == [1, 2]  # append, not truncate


def test_evaluate_error_accumulates_masked_counts():
    def eval_step(state, batch):
        return {"correct": batch["c"], "count": batch["n"]}

    batches = [{"c": 3.0, "n": 4.0}, {"c": 1.0, "n": 4.0}, {"c": 1.0, "n": 2.0}]
    err = evaluate_error(eval_step, None, iter(batches))
    assert abs(err - (1.0 - 5.0 / 10.0)) < 1e-9


def test_evaluate_error_empty_stream_is_full_error():
    err = evaluate_error(lambda s, b: {"correct": 0.0, "count": 0.0}, None, iter([]))
    assert err == 1.0
