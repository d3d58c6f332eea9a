"""The sklearn-digits real-data path: the `digits` prepare converter
(real 8×8 handwritten digits bundled with scikit-learn — the one real
image dataset reachable offline) and tools/digits_experiment.py, the
supervised-vs-semi-supervised validation it feeds (docs/PARITY.md §8)."""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _experiment():
    spec = importlib.util.spec_from_file_location(
        "digits_experiment", os.path.join(REPO, "tools", "digits_experiment.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _prepare(tmp_path):
    from triplegan_tpu.data.prepare import prepare

    prepare("digits", "", str(tmp_path))
    return (
        np.load(tmp_path / "digits" / "train.npz"),
        np.load(tmp_path / "digits" / "test.npz"),
    )


def test_prepare_digits_contract(tmp_path):
    tr, te = _prepare(tmp_path)
    assert tr["images"].shape == (1297, 28, 28, 1)
    assert te["images"].shape == (500, 28, 28, 1)
    assert tr["images"].dtype == np.uint8
    assert tr["labels"].dtype == np.int32
    # Stratified test split: exactly 50 per class; train is near-balanced.
    assert np.bincount(te["labels"]).tolist() == [50] * 10
    assert np.bincount(tr["labels"]).min() >= 100
    # Real pixel data, full uint8 range after the 0..16 → 0..255 rescale.
    assert int(tr["images"].max()) == 255 and int(tr["images"].min()) == 0
    # No train/test leakage: the two index sets partition all 1,797 images.
    assert len(tr["labels"]) + len(te["labels"]) == 1797


def test_prepare_digits_deterministic(tmp_path):
    tr1, te1 = _prepare(tmp_path / "a")
    tr2, te2 = _prepare(tmp_path / "b")
    assert np.array_equal(tr1["images"], tr2["images"])
    assert np.array_equal(te1["labels"], te2["labels"])


def test_prepare_raw_dir_required_for_file_datasets(tmp_path):
    from triplegan_tpu.data.prepare import prepare

    with pytest.raises(ValueError, match="--raw-dir"):
        prepare("mnist", "", str(tmp_path))


def test_digits_loads_with_balanced_100_label_split(tmp_path):
    from triplegan_tpu.data.datasets import load_dataset

    _prepare(tmp_path)
    data = load_dataset(str(tmp_path), "digits", 100, 10, seed=3)
    assert data.x_label.shape == (100, 28, 28, 1)
    assert np.bincount(data.y_label).tolist() == [10] * 10
    assert len(data.x_unlabel) == 1297


def test_digits_experiment_dry_run(tmp_path, capsys):
    mod = _experiment()
    rc = mod.main([
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(tmp_path / "runs"),
        "--seeds", "1,2",
        "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("prepare --dataset digits") == 1
    assert out.count("triplegan_tpu.cli train") == 2
    assert out.count("triplegan_tpu.cli eval") == 2
    assert out.count("supervised baseline") == 2
    assert "--set name=digits_n100_s2" in out
    assert "--set num_labeled=100" in out


def test_digits_experiment_rejects_unbalanced_label_budget(tmp_path):
    mod = _experiment()
    with pytest.raises(SystemExit):
        mod.main([
            "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
            "--num-labeled", "55", "--dry-run",
        ])


def test_digits_experiment_rejects_duplicate_seeds(tmp_path):
    mod = _experiment()
    with pytest.raises(SystemExit):
        mod.main([
            "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
            "--seeds", "1,1", "--dry-run",
        ])


@pytest.mark.slow  # two CLI subprocesses compile the full train/eval steps
def test_digits_experiment_micro_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "cpu")
    mod = _experiment()
    rc = mod.main([
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(tmp_path / "runs"),
        "--seeds", "1",
        "--epochs", "1",
        "--warmup-epochs", "1",
        "--baseline-steps", "3",
        "--eval-every-epochs", "1",
        "--ckpt-every-epochs", "1",
        "--platform", "cpu",
    ])
    # Untrained micro-arms carry no gain guarantee — the contract is the
    # artifact and the honest verdict, not the outcome.
    assert rc in (0, 2)
    summary = json.loads(
        (tmp_path / "runs" / "digits_summary_n100.json").read_text()
    )
    assert summary["seeds"] == [1]
    assert summary["num_labeled"] == 100
    assert len(summary["baseline_errors_pct"]) == 1
    assert len(summary["triplegan_errors_pct"]) == 1
    assert summary["verdict"] in ("PASS", "FAIL")
    assert (summary["verdict"] == "PASS") == (summary["gain_pct"] > 0)
    assert summary["seed_wins"].endswith("/1")
    assert 0.0 <= summary["sign_test_p"] <= 1.0
