"""tools/seed_campaign.py — single-arm N-seed campaign via the real CLI
(the 'this framework' population for distributional comparisons,
docs/PARITY.md §12)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "seed_campaign", os.path.join(REPO, "tools", "seed_campaign.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_shapes16(tmp_path, capsys):
    mod = _tool()
    rc = mod.main([
        "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
        "--config", "cifar10_4k", "--dataset", "shapes16",
        "--seeds", "1,2", "--num-labeled", "400",
        "--epochs", "15", "--warmup-epochs", "5",
        "--override", "image_size=16", "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("prepare --dataset shapes16") == 1
    assert out.count("triplegan_tpu.cli train") == 2
    assert out.count("triplegan_tpu.cli eval") == 2
    assert out.count("--set image_size=16") == 4
    assert "--set name=sc_cifar10_4k_shapes16_n400_s2" in out


def test_resume_and_summary(tmp_path, monkeypatch):
    mod = _tool()
    wd = tmp_path / "runs"
    wd.mkdir()
    (wd / "sc_mnist100_digits_n100_s1_train.log").write_text(
        "step 9/9 [1 img/s] loss_c=1.0 loss_d=1.2\ndone: step=9 "
        "test_error=6.0%\n")
    (wd / "sc_mnist100_digits_n100_s1_eval.json").write_text(
        '{"test_error_pct": 6.0}')
    calls = []

    def fake_run_cli(cmd, log_path=None, extra_env=None):
        calls.append(cmd[0])
        return "test error: 8.00%"

    monkeypatch.setattr(mod, "run_cli", fake_run_cli)
    rc = mod.main([
        "--data-dir", str(tmp_path / "d"), "--workdir", str(wd),
        "--seeds", "1,2", "--epochs", "1", "--warmup-epochs", "0",
        "--resume",
    ])
    assert rc == 0
    # prepare + (s1 fully cached) + (s2 train + eval)
    assert calls == ["prepare", "train", "eval"]
    summary = json.loads(
        (wd / "seed_campaign_mnist100_digits_n100.json").read_text())
    assert summary["errors_pct"] == [6.0, 8.0]
    assert summary["mean_pct"] == 7.0
    assert summary["final_metrics"][0] == {"loss_c": 1.0, "loss_d": 1.2}
