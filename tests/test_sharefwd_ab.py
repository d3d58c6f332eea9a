"""tools/sharefwd_ab.py — the share_pseudo_forward quality-qualification
A/B (VERDICT r3 next-step #2): two arms per seed differing only in the
flag, paired statistics, WITHIN_NOISE/SIGNIFICANT verdict."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "sharefwd_ab", os.path.join(REPO, "tools", "sharefwd_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_digits(tmp_path, capsys):
    mod = _tool()
    rc = mod.main([
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(tmp_path / "runs"),
        "--seeds", "1,2",
        "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("prepare --dataset digits") == 1
    assert out.count("triplegan_tpu.cli train") == 4  # 2 seeds x 2 arms
    assert out.count("triplegan_tpu.cli eval") == 4
    assert out.count("--set share_pseudo_forward=false") == 4  # train+eval
    assert out.count("--set share_pseudo_forward=true") == 4
    assert "--set name=ab_digits_n100_s2_on" in out
    assert "--set name=ab_digits_n100_s1_off" in out


def test_dry_run_synthetic_skips_prepare(tmp_path, capsys):
    mod = _tool()
    rc = mod.main([
        "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
        "--dataset", "synthetic", "--config", "cifar10_4k",
        "--seeds", "1", "--epochs", "500", "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "prepare" not in out
    assert "--config cifar10_4k" in out
    assert "--set dataset=synthetic" in out
    assert "--set epochs=500" in out


def test_override_passthrough_reaches_both_arms(tmp_path, capsys):
    mod = _tool()
    rc = mod.main([
        "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
        "--seeds", "1", "--override", "scan_steps=12",
        "--override", "scan_metrics=mean", "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("--set scan_steps=12") == 4  # 2 arms x train+eval
    assert out.count("--set scan_metrics=mean") == 4


def test_resume_skips_completed_train_legs(tmp_path, monkeypatch):
    """--resume must skip the train leg for an arm whose log shows a
    completed run ('done: step=' — printed only on non-preempted
    completion, cli.py:88) and still run its eval; incomplete arms train
    normally. Restarting a tunnel-killed campaign must not retrain."""
    mod = _tool()
    wd = tmp_path / "runs"
    wd.mkdir()
    # seed 1 completed; seed 2's log exists but was cut off mid-train
    (wd / "ab_digits_n100_s1_off_train.log").write_text(
        "step 3600/3600 [9000 img/s] loss_c=1.0\ndone: step=3600 "
        "test_error=5.00%\n")
    (wd / "ab_digits_n100_s1_on_train.log").write_text(
        "step 1200/3600 [9000 img/s] loss_c=1.5\n")  # no done line

    calls = []

    def fake_run_cli(cmd, log_path=None, extra_env=None):
        calls.append(cmd[0])
        return "test error: 5.00%"

    monkeypatch.setattr(mod, "run_cli", fake_run_cli)
    rc = mod.main([
        "--data-dir", str(tmp_path / "data"), "--workdir", str(wd),
        "--seeds", "1", "--resume",
    ])
    assert rc == 0
    # prepare + (s1_off: no legs at all — scored from its train log's
    # final-eval line, round-5 tunnel-handshake saver) + (s1_on: train,
    # then eval because the fake train wrote no log)
    assert calls == ["prepare", "train", "eval"]

    assert mod.train_completed(str(wd / "ab_digits_n100_s1_off_train.log"))
    assert not mod.train_completed(str(wd / "ab_digits_n100_s1_on_train.log"))
    assert not mod.train_completed(str(wd / "nonexistent.log"))


def test_rejects_duplicate_seeds_and_unbalanced_budget(tmp_path):
    mod = _tool()
    with pytest.raises(SystemExit):
        mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                  "--seeds", "3,3", "--dry-run"])
    with pytest.raises(SystemExit):
        mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                  "--num-labeled", "55", "--dry-run"])


def test_parse_final_metrics(tmp_path):
    mod = _tool()
    log = tmp_path / "t.log"
    log.write_text(
        "name: x\n"
        "step 12/3600 [812 img/s] loss_c=2.1 loss_d=1.4 loss_g=0.7\n"
        "epoch 1: test error 55.00%\n"
        "step 24/3600 [950 img/s] loss_c=1.9 loss_d=1.38 loss_g=0.72\n"
        "done: step=24 test_error=50.00%\n"
    )
    m = mod.parse_final_metrics(str(log))
    assert m == {"loss_c": 1.9, "loss_d": 1.38, "loss_g": 0.72}
    assert mod.parse_final_metrics(str(tmp_path / "missing.log")) == {}
