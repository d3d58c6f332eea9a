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


def _tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _experiment():
    return _tool("digits_experiment")


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


def test_paired_permutation_p():
    mod = _experiment()
    # All-positive diffs {1,2,3}: only the two all-same-sign assignments
    # reach |sum| = 6 → p = 2/8.
    assert mod.paired_permutation_p([1.0, 2.0, 3.0], [0.0, 0.0, 0.0]) == 0.25
    # No effect: every assignment ties the observed 0 → p = 1.
    assert mod.paired_permutation_p([1.0, 2.0], [1.0, 2.0]) == 1.0
    # Mixed signs keep it two-sided and in (0, 1].
    p = mod.paired_permutation_p([3.0, 1.0, 2.0, 5.0], [2.5, 1.5, 1.0, 4.0])
    assert 0.0 < p <= 1.0
    assert mod.paired_permutation_p([], []) == 1.0


def test_nn_distances_matches_brute_force():
    mod = _tool("digits_quality")
    rng = np.random.RandomState(0)
    a = rng.randn(7, 4, 4, 1).astype(np.float32)
    b = rng.randn(11, 4, 4, 1).astype(np.float32)
    got = mod.nn_distances(a, b, chunk=3)
    af, bf = a.reshape(7, -1), b.reshape(11, -1)
    want = np.sqrt(
        ((af[:, None, :] - bf[None, :, :]) ** 2).sum(-1)
    ).min(axis=1)
    assert np.allclose(got, want, atol=1e-5)


def test_digits_quality_rejects_duplicate_runs(tmp_path):
    mod = _tool("digits_quality")
    with pytest.raises(SystemExit):
        mod.main([
            "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
            "--runs", "a,a",
        ])


def test_digits_quality_requires_run_dir(tmp_path):
    mod = _tool("digits_quality")
    os.makedirs(tmp_path / "not_a_run")
    with pytest.raises(SystemExit, match="config.json"):
        mod.main([
            "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
            "--runs", "not_a_run", "--platform", "cpu",
        ])


@pytest.mark.slow  # a CLI train subprocess + in-process quality measurement
def test_digits_quality_micro_end_to_end(tmp_path, monkeypatch):
    import shlex
    import subprocess
    import sys

    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "cpu")
    from triplegan_tpu.data.prepare import prepare

    data_dir, workdir = tmp_path / "data", tmp_path / "runs"
    prepare("digits", "", str(data_dir))
    env = dict(os.environ, PYTHONPATH=REPO)
    cmd = [
        sys.executable, "-m", "triplegan_tpu.cli", "train",
        "--config", "mnist100", "--data-dir", str(data_dir),
        "--workdir", str(workdir), "--platform", "cpu",
        "--set", "dataset=digits", "--set", "name=dq_micro",
        "--set", "epochs=1", "--set", "eval_every_epochs=1",
        "--set", "ckpt_every_epochs=1", "--set", "alpha_p_warmup_epochs=1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, f"{shlex.join(cmd)}\n{proc.stdout}\n{proc.stderr}"

    mod = _tool("digits_quality")
    rc = mod.main([
        "--data-dir", str(data_dir), "--workdir", str(workdir),
        "--runs", "dq_micro", "--n-samples", "100", "--platform", "cpu",
    ])
    assert rc == 0
    summary = json.loads((workdir / "digits_quality.json").read_text())
    refs = summary["references"]
    # The garbage ceiling must dominate the real-vs-real floor by orders.
    assert refs["fid_ceiling_noise_vs_test"] > refs["fid_floor_trainpool_vs_test"]
    (row,) = summary["runs"]
    assert row["run"] == "dq_micro"
    assert row["fid_vs_test"] >= 0.0
    assert 0.0 <= row["cond_fidelity_anchor"] <= 1.0
    assert row["is_anchor_self_judged"] is True
    assert row["nn_gen_to_trainpool_mean"] > 0.0
    assert summary["fid_min"] <= summary["fid_mean"] <= summary["fid_max"]


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
