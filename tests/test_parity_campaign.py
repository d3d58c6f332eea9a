"""tools/parity_campaign.py — the one-command N-seed parity campaign
(docs/PARITY.md §3–§4): dry-run command plan, and a real tiny 2-seed
campaign driven end-to-end through CLI subprocesses (which also exercises
the TRIPLEGAN_PLATFORM=cpu backend override those children rely on when
the TPU is busy or dark)."""

import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _campaign():
    spec = importlib.util.spec_from_file_location(
        "parity_campaign", os.path.join(REPO, "tools", "parity_campaign.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TINY_SETS = [
    "dataset=synthetic",
    "image_size=16",
    "num_labeled=40",
    "z_dim=16",
    "gen.widths=(32, 16)",
    "disc.widths=(16, 16)",
    "disc.strides=(1, 2)",
    "clf.conv_blocks=((8, 8), (16,))",
    "clf.tail=(16, 8)",
    "batch_size=8",
    "steps_per_epoch=2",
    "epochs=1",
    "zca=False",
    "aug_translate=0",
    "aug_flip=False",
    "log_every=1",
    "scan_steps=1",
]


def test_campaign_dry_run_plans_runbook_commands(tmp_path, capsys):
    mod = _campaign()
    rc = mod.main([
        "--config", "cifar10_4k",
        "--raw-dir", str(tmp_path / "raw"),
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(tmp_path / "runs"),
        "--seeds", "1,2,3",
        "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # prepare first (no prepared npz exists), then 3 trains, then 3 evals
    assert "prepare --dataset cifar10" in out
    for s in (1, 2, 3):
        assert f"--set seed={s}" in out
    assert out.count(" eval ") == 3
    # the runbook's scan_steps=10 default rides along unless overridden
    assert "--set scan_steps=10" in out
    # train commands come before eval commands
    assert out.index(" train ") < out.index(" eval ")


def test_campaign_rejects_seed_via_set(tmp_path):
    mod = _campaign()
    with pytest.raises(SystemExit):
        mod.main([
            "--raw-dir", "r", "--data-dir", "d", "--workdir", "w",
            "--set", "seed=7", "--dry-run",
        ])


def test_campaign_parse_error():
    mod = _campaign()
    assert mod.parse_error("epoch 0: test error 90.00%\ntest error: 12.34%\n") == 12.34
    with pytest.raises(RuntimeError, match="no 'test error"):
        mod.parse_error("nothing useful")


def test_run_cli_failure_surfaces_child_output(tmp_path, capsys, monkeypatch):
    """A failing captured (eval) leg must print the child's output before
    raising, not die with a bare CalledProcessError."""
    import subprocess

    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "cpu")
    mod = _campaign()
    with pytest.raises(subprocess.CalledProcessError) as ei:
        # 'definitely-not-a-subcommand' makes the CLI print usage and exit 2
        mod.run_cli(["definitely-not-a-subcommand"])
    out = capsys.readouterr().out
    assert "definitely-not-a-subcommand" in out  # child's stderr→stdout shown
    assert ei.value.output  # and preserved on the exception


def test_campaign_tiny_end_to_end(tmp_path, monkeypatch):
    """A real 2-seed campaign on the synthetic dataset: subprocess CLI
    trains + evals, summary JSON with per-seed errors and the FAIL verdict
    (random-data errors are nowhere near the CIFAR reference band)."""
    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "cpu")  # children skip the TPU plugin
    mod = _campaign()
    wd = tmp_path / "runs"
    rc = mod.main([
        "--config", "mnist100",
        "--raw-dir", str(tmp_path / "raw"),
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(wd),
        "--seeds", "1,2",
        *[f for kv in TINY_SETS for f in ("--set", kv)],
    ])
    summary = json.loads((wd / "parity_summary.json").read_text())
    assert sorted(summary["errors_pct"]) == ["seed1", "seed2"]
    for err in summary["errors_pct"].values():
        assert 0.0 <= err <= 100.0
    assert summary["pass"] is False  # random tiny run vs the 16.99% band
    assert rc == 2  # FAIL exit code so deployments can gate on it
    assert summary["mean_error_pct"] == pytest.approx(
        sum(summary["errors_pct"].values()) / 2, abs=1e-3
    )
    # per-seed train logs were streamed to files
    assert (wd / "seed1.log").exists() and (wd / "seed2.log").exists()
    # seed-overlay curves rendered next to the summary (best-effort path)
    curves = wd / "curves.png"
    assert curves.exists() and curves.stat().st_size > 5000
    assert curves.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_campaign_rerun_resumes_training(tmp_path, monkeypatch):
    """PARITY.md §4 promises 'interrupting and rerunning the campaign
    resumes training from the last checkpoint' — pin it: a second campaign
    over the same workdir with a longer schedule must RESTORE the first
    run's final checkpoint (train prints 'resumed from step N' into the
    appended seed log) rather than restarting from step 0."""
    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "cpu")
    mod = _campaign()
    wd = tmp_path / "runs"

    def run(epochs):
        sets = [kv for kv in TINY_SETS if not kv.startswith("epochs=")]
        sets.append(f"epochs={epochs}")
        return mod.main([
            "--config", "mnist100",
            "--raw-dir", str(tmp_path / "raw"),
            "--data-dir", str(tmp_path / "data"),
            "--workdir", str(wd),
            "--seeds", "1",
            *[f for kv in sets for f in ("--set", kv)],
        ])

    assert run(epochs=1) == 2  # FAIL verdict on random tiny data, as above
    log1 = (wd / "seed1.log").read_text()
    assert "resumed" not in log1  # first run starts fresh

    assert run(epochs=2) == 2
    log2 = (wd / "seed1.log").read_text()
    # appended log: the rerun restored the epoch-1 final checkpoint (step 2
    # at steps_per_epoch=2) and continued to step 4
    assert "resumed from step 2" in log2
    assert "step 4/4" in log2
