"""tools/tf_parity_train.py — the full-training cross-implementation
parity harness (VERDICT r3 next-step #4): an independent TF-2
implementation of the complete mnist100 recipe (stochastic layers ON)
trained to completion on real digits, compared distributionally against
this framework's errors."""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "tf_parity_train", os.path.join(REPO, "tools", "tf_parity_train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_and_arg_validation(tmp_path, capsys):
    mod = _tool()
    rc = mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                   "--seeds", "1,2", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "seeds=[1, 2]" in out
    with pytest.raises(SystemExit):
        mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                  "--seeds", "1,1", "--dry-run"])
    with pytest.raises(SystemExit):
        mod.main(["--data-dir", str(tmp_path), "--workdir", str(tmp_path),
                  "--num-labeled", "55", "--dry-run"])


def test_two_sample_perm_p():
    mod = _tool()
    # identical samples: no effect
    assert mod.two_sample_perm_p([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) > 0.5
    # wildly separated samples: significant
    assert mod.two_sample_perm_p(
        [1.0, 1.1, 0.9, 1.05, 0.95], [9.0, 9.1, 8.9, 9.05, 8.95]) < 0.05


def test_equivalence_analysis_band():
    """VERDICT r4 #4: the comparison must report an explicit equivalence
    band, not only a p-value. Tight overlapping populations → TOST
    equivalent within ±2 pts; a 5-pt systematic shift → NOT equivalent,
    CI excludes zero."""
    mod = _tool()
    a = [5.4, 6.1, 5.8, 6.3, 5.6, 6.0, 5.9, 5.7]
    b = [5.9, 5.5, 6.2, 5.6, 6.1, 5.8, 5.5, 6.4, 5.7, 6.0]
    eq = mod.equivalence_analysis(a, b)
    assert eq["tost_equivalent"] is True
    lo, hi = eq["diff_ci90_pct"]
    assert lo <= eq["mean_diff_pct"] <= hi
    assert -2.0 < lo and hi < 2.0

    shifted = [x + 5.0 for x in b]
    eq2 = mod.equivalence_analysis(shifted, b)
    assert eq2["tost_equivalent"] is False
    assert eq2["diff_ci90_pct"][0] > 2.0  # whole CI above the margin
    # and underpowered disagreement is not declared equivalent either:
    eq3 = mod.equivalence_analysis([4.0, 9.0], [5.0, 8.5])
    assert eq3["tost_equivalent"] is False  # CI spans far beyond ±2


@pytest.mark.slow  # trains real TF for a few hundred steps
def test_tf_micro_training_learns_and_summary_schema(tmp_path):
    """A micro TF run (real digits, 20 epochs) must beat chance by a wide
    margin — the TF implementation genuinely trains — and the summary JSON
    must carry the comparison fields when --compare-json is given.

    20 epochs (240 steps), not fewer: BN running statistics use momentum
    0.99 (timescale ~100 steps), so eval-mode predictions stay at the 90%
    chance floor until the running stats warm up — measured 90.00% at 8
    epochs vs 32.2% at 20 epochs on this box."""
    pytest.importorskip("tensorflow")
    from triplegan_tpu.data.prepare import prepare

    data_dir = str(tmp_path / "data")
    prepare("digits", "", data_dir)

    ours = {"off_errors_pct": [5.0, 6.0, 7.0]}
    cmp_path = str(tmp_path / "ours.json")
    with open(cmp_path, "w") as f:
        json.dump(ours, f)

    mod = _tool()
    rc = mod.main([
        "--data-dir", data_dir, "--workdir", str(tmp_path / "runs"),
        "--seeds", "1", "--epochs", "20", "--warmup-epochs", "10",
        "--compare-json", cmp_path, "--compare-key", "off_errors_pct",
    ])
    assert rc == 0
    with open(tmp_path / "runs" / "tf_parity_summary_n100.json") as f:
        summary = json.load(f)
    assert summary["implementation"] == "independent-tf2"
    # 240 steps of the full stochastic recipe: far better than the 90%
    # chance floor (measured 32.2% on this box), though far from converged.
    assert summary["tf_errors_pct"][0] < 65.0
    assert summary["perm_test_p"] is not None
    assert summary["verdict"] in ("AGREE", "DISAGREE")
    assert np.isclose(summary["ours_mean_pct"], 6.0)
