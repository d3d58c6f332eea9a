"""tools/flagset_ab.py — the generalized arbitrary flag-set quality A/B
(VERDICT r4 next-step #1): two arms per seed differing in a DECLARED set of
config keys and/or env knobs (e.g. the full bench ensemble bf16 + rbg +
u8-dropout + share_fwd), paired statistics, WITHIN_NOISE/SIGNIFICANT
verdict. tools/sharefwd_ab.py delegates to this core (its own surface is
covered by tests/test_sharefwd_ab.py)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "flagset_ab", os.path.join(REPO, "tools", "flagset_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ENSEMBLE = [
    "--b-set", "compute_dtype=bfloat16",
    "--b-set", "prng_impl=rbg",
    "--b-set", "share_pseudo_forward=true",
    "--b-env", "TRIPLEGAN_DROPOUT_BITS=8",
]


def test_dry_run_ensemble_arms(tmp_path, capsys):
    """The bench-ensemble invocation: arm A is the SHIPPED semantics (no
    overrides), arm B stacks the four headline deviations — three config
    sets plus the u8-dropout env knob, which must print on arm B's
    commands only."""
    mod = _tool()
    rc = mod.main([
        "--data-dir", str(tmp_path / "data"),
        "--workdir", str(tmp_path / "runs"),
        "--name", "bench_ensemble",
        *ENSEMBLE,
        "--seeds", "1,2",
        "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("prepare --dataset digits") == 1
    assert out.count("triplegan_tpu.cli train") == 4  # 2 seeds x 2 arms
    assert out.count("triplegan_tpu.cli eval") == 4
    # arm B's sets appear on its train+eval for both seeds; never on arm A
    assert out.count("--set compute_dtype=bfloat16") == 4
    assert out.count("--set prng_impl=rbg") == 4
    assert out.count("--set share_pseudo_forward=true") == 4
    assert out.count("TRIPLEGAN_DROPOUT_BITS=8 ") == 4
    for line in out.splitlines():
        if "_s1_a" in line or "_s2_a" in line:
            assert "bfloat16" not in line and "DROPOUT_BITS" not in line
    assert "--set name=ab_bench_ensemble_digits_n100_s2_b" in out
    assert "--set name=ab_bench_ensemble_digits_n100_s1_a" in out


def test_identical_arms_rejected(tmp_path):
    mod = _tool()
    with pytest.raises(SystemExit):
        mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                  "--dry-run"])


def test_run_ab_env_reaches_only_variant_arm(tmp_path):
    """The env knob must reach arm B's train AND eval subprocess env and
    never arm A's; errors parse into the paired stats and the artifact
    lands at the named path with arm descriptors."""
    mod = _tool()
    wd = tmp_path / "runs"
    calls = []
    # B wins on both seeds by a clear margin -> perm p = 0.5 (n=2, within
    # noise at the 0.05 threshold)
    errs = iter(["6.00", "4.00", "8.00", "5.00"])  # s1 a,b then s2 a,b

    def fake_runner(cmd, log_path=None, extra_env=None):
        calls.append((cmd[0], dict(extra_env or {})))
        if cmd[0] == "eval":
            return f"test error: {next(errs)}%"
        return ""

    rc = mod.run_ab(
        workdir=str(wd), data_dir=str(tmp_path / "d"), config="mnist100",
        dataset="digits", num_labeled=100, seeds=[1, 2], epochs=10,
        warmup_epochs=3,
        arms={"a": {}, "b": {"sets": ["compute_dtype=bfloat16"],
                             "env": {"TRIPLEGAN_DROPOUT_BITS": "8"}}},
        artifact_path=str(wd / "out.json"), runner=fake_runner,
    )
    assert rc == 0
    # prepare, then per seed: a train, a eval, b train, b eval
    kinds = [c[0] for c in calls]
    assert kinds == ["prepare", "train", "eval", "train", "eval",
                     "train", "eval", "train", "eval"]
    a_envs = [e for k, e in calls[1:3] + calls[5:7]]
    b_envs = [e for k, e in calls[3:5] + calls[7:9]]
    assert all(e == {} for e in a_envs)
    assert all(e == {"TRIPLEGAN_DROPOUT_BITS": "8"} for e in b_envs)
    summary = json.loads((wd / "out.json").read_text())
    assert summary["a_errors_pct"] == [6.0, 8.0]
    assert summary["b_errors_pct"] == [4.0, 5.0]
    assert summary["b_minus_a_pct"] == -2.5
    assert summary["seed_wins_b"] == "2/2"
    assert summary["verdict"] == "WITHIN_NOISE"  # n=2 can't reach p<0.05
    assert summary["arms"]["b"]["env"] == {"TRIPLEGAN_DROPOUT_BITS": "8"}


def test_run_ab_resume_and_eval_cache(tmp_path):
    """--resume must skip completed train legs (done: marker) and reuse
    cached eval scores, exactly like the sharefwd original."""
    mod = _tool()
    wd = tmp_path / "runs"
    wd.mkdir()
    (wd / "x_digits_n100_s1_a_train.log").write_text(
        "step 10/10 [900 img/s] loss_c=1.0\ndone: step=10 test_error=5.0%\n")
    (wd / "x_digits_n100_s1_a_eval.json").write_text(
        '{"test_error_pct": 5.0}')

    calls = []

    def fake_runner(cmd, log_path=None, extra_env=None):
        calls.append(cmd[0])
        return "test error: 7.00%"

    rc = mod.run_ab(
        workdir=str(wd), data_dir=str(tmp_path / "d"), config="mnist100",
        dataset="digits", num_labeled=100, seeds=[1], epochs=10,
        warmup_epochs=3, arms={"a": {}, "b": {"sets": ["zca=false"]}},
        run_prefix="x", artifact_path=str(wd / "out.json"),
        resume=True, runner=fake_runner,
    )
    assert rc == 0
    # prepare + arm b's train+eval only; arm a fully cached
    assert calls == ["prepare", "train", "eval"]
    summary = json.loads((wd / "out.json").read_text())
    assert summary["a_errors_pct"] == [5.0]
    assert summary["b_errors_pct"] == [7.0]


def test_significant_verdict_names_worse_arm():
    mod = _tool()
    # 8 seeds, variant consistently ~2 pts worse -> p < 0.05
    a = [5.0, 6.0, 4.0, 5.5, 6.5, 5.2, 4.8, 5.9]
    b = [x + 2.0 for x in a]
    assert mod.paired_permutation_p(a, b) < 0.05


def test_sharefwd_delegation_matches_legacy_surface(tmp_path, capsys):
    """sharefwd_ab.py is now a front-end over run_ab: its dry-run must
    still emit the HISTORICAL run names and both arms' flag values."""
    spec = importlib.util.spec_from_file_location(
        "sharefwd_ab", os.path.join(REPO, "tools", "sharefwd_ab.py"))
    sfw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sfw)
    rc = sfw.main([
        "--data-dir", str(tmp_path), "--workdir", str(tmp_path),
        "--seeds", "7", "--dry-run",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "--set name=ab_digits_n100_s7_off" in out
    assert "--set name=ab_digits_n100_s7_on" in out
    assert out.count("--set share_pseudo_forward=false") == 2
    assert out.count("--set share_pseudo_forward=true") == 2


def test_scores_from_train_log_skipping_eval_leg(tmp_path):
    """When the train leg's log carries the driver's final-eval line
    ('done: step=N test_error=X%'), the campaign must score from it and
    skip the separate eval invocation (each costs ~10 min of tunnel
    handshake on this hardware); the score is cached like an eval."""
    mod = _tool()
    wd = tmp_path / "runs"
    wd.mkdir()
    calls = []

    def fake_runner(cmd, log_path=None, extra_env=None):
        calls.append(cmd[0])
        if cmd[0] == "train":
            with open(log_path, "w") as f:
                f.write("step 10/10 [9000 img/s] loss_c=1.0\n"
                        "done: step=10 test_error=4.50%\n")
        return ""

    rc = mod.run_ab(
        workdir=str(wd), data_dir=str(tmp_path / "d"), config="mnist100",
        dataset="digits", num_labeled=100, seeds=[1], epochs=10,
        warmup_epochs=3, arms={"a": {}, "b": {"sets": ["zca=false"]}},
        artifact_path=str(wd / "out.json"), runner=fake_runner,
    )
    assert rc == 0
    assert calls == ["prepare", "train", "train"]  # zero eval legs
    summary = json.loads((wd / "out.json").read_text())
    assert summary["a_errors_pct"] == [4.5]
    assert summary["b_errors_pct"] == [4.5]
    # the score was cached for future --resume restarts
    cached = json.loads(
        (wd / "ab_digits_n100_s1_a_eval.json").read_text())
    assert cached == {"test_error_pct": 4.5}
    assert mod.parse_train_final_error(str(wd / "missing.log")) is None
