"""tools/plot_metrics.py — offline training-curve renderer over the
run-dir metrics.jsonl contract (utils/logging.py writes it; the reference's
equivalent verification surface is TensorBoard curves, SURVEY.md §4)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "plot_metrics", os.path.join(REPO, "tools", "plot_metrics.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_run(tmp_path, name, n=20, with_eval=True):
    d = tmp_path / name
    d.mkdir()
    with open(d / "metrics.jsonl", "w") as f:
        for i in range(n):
            rec = {"step": i * 10, "time": 0.0, "loss_d": 1.0 / (i + 1),
                   "loss_g": 0.5, "images_per_sec": 1000.0 + i}
            f.write(json.dumps(rec) + "\n")
            if with_eval and i % 5 == 0:  # sparse eval-only lines
                f.write(json.dumps({"step": i * 10, "test_error": 0.9 - 0.01 * i}) + "\n")
    return str(d)


def test_load_series_sparse_lines(tmp_path):
    mod = _mod()
    series = mod.load_series(_write_run(tmp_path, "run"))
    assert len(series["loss_d"][0]) == 20
    assert len(series["test_error"][0]) == 4  # only the eval lines
    assert "time" not in series and "step" not in series
    assert series["loss_d"][1][0] == pytest.approx(1.0)


def test_ema_smoothing():
    mod = _mod()
    sm = mod.ema([0.0, 1.0, 1.0], 0.5)
    assert sm == [0.0, 0.5, 0.75]


def test_plot_two_runs_writes_png(tmp_path):
    mod = _mod()
    r1 = _write_run(tmp_path, "seed1")
    r2 = _write_run(tmp_path, "seed2")
    out = str(tmp_path / "curves.png")
    rc = mod.main([r1, r2, "--out", out, "--smooth", "0.9"])
    assert rc == 0
    assert os.path.getsize(out) > 5000  # a real rendered figure, not a stub
    # PNG magic bytes
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_unknown_key_fails_with_available_list(tmp_path, capsys):
    mod = _mod()
    r1 = _write_run(tmp_path, "run")
    rc = mod.main([r1, "--out", str(tmp_path / "x.png"), "--keys", "nope"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "nope" in err and "loss_d" in err  # names the fix


def test_plot_missing_jsonl_raises(tmp_path):
    mod = _mod()
    with pytest.raises(FileNotFoundError):
        mod.load_series(str(tmp_path / "empty"))
