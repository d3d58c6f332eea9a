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


def test_api_doc_symbols_exist():
    """Every entry point docs/API.md promises must exist — keeps the public
    API reference from silently rotting."""
    import importlib

    checks = [
        ("triplegan_tpu.configs", ["get_config", "REGISTRY"]),
        ("triplegan_tpu.configs.base",
         ["display", "make_networks", "save_config", "merge_saved", "apply_runtime"]),
        ("triplegan_tpu.nn.networks", ["Generator", "Discriminator", "Classifier"]),
        ("triplegan_tpu.train.state", ["create_state", "TrainState"]),
        ("triplegan_tpu.train.schedule", ["make_optimizers"]),
        ("triplegan_tpu.train.step",
         ["make_train_step", "make_device_train_step",
          "make_scan_device_train_step", "make_eval_step"]),
        ("triplegan_tpu.train.loop", ["train"]),
        ("triplegan_tpu.train.losses",
         ["d_loss", "g_loss", "c_loss", "sample_pseudo_labels", "c_adversarial_loss"]),
        ("triplegan_tpu.data.prepare", ["prepare"]),
        ("triplegan_tpu.data.download", ["download_dataset"]),
        ("triplegan_tpu.data.datasets",
         ["load_dataset", "synthetic_dataset", "SemiSupervisedData"]),
        ("triplegan_tpu.data.pipeline",
         ["BatchSampler", "upload_device_data", "device_prefetch"]),
        ("triplegan_tpu.data.ondevice", ["standard_pipeline"]),
        ("triplegan_tpu.data.zca", ["fit_zca", "apply_zca", "ZCAStats"]),
        ("triplegan_tpu.parallel.mesh",
         ["make_mesh", "shard_train_step", "shard_device_train_step",
          "shard_eval_step", "batch_sharding"]),
        ("triplegan_tpu.eval.metrics", ["evaluate_error"]),
        ("triplegan_tpu.eval.sample",
         ["make_sample_fn", "class_grid_inputs", "to_uint8_grid", "save_png"]),
        ("triplegan_tpu.eval.inception", ["inception_score", "load_scorer"]),
        ("triplegan_tpu.ckpt", ["CheckpointManager"]),
        ("triplegan_tpu.utils.profiling", ["trace"]),
        ("triplegan_tpu.utils.debug", ["checkify_step"]),
        ("triplegan_tpu.utils.logging", ["MetricsLogger"]),
        ("triplegan_tpu.utils.cache", ["enable_compilation_cache"]),
    ]
    for mod, names in checks:
        m = importlib.import_module(mod)
        for n in names:
            assert hasattr(m, n), f"{mod}.{n} missing but documented in docs/API.md"


def test_apply_platform_cpu_and_tpu_semantics():
    """utils/platform.py (2026-08-20 regression): a 'tpu' request must NOT
    pin jax_platforms to the literal string — tunneled chips can register
    under a different plugin name (observed 'axon') that only auto-
    selection finds. Under the CPU-forced test env, 'tpu' must therefore
    raise loudly (auto-selection yields cpu), 'cpu' must be a no-op-safe
    re-force, None a no-op, and junk a ValueError."""
    import jax
    import pytest as _pytest

    from triplegan_tpu.utils.platform import apply_platform

    apply_platform(None)  # no-op
    apply_platform("cpu")  # conftest already forced cpu; idempotent
    assert jax.default_backend() == "cpu"
    with _pytest.raises(RuntimeError, match="auto-selected 'cpu'"):
        apply_platform("tpu")
    with _pytest.raises(ValueError):
        apply_platform("gpu")
