"""tools/roofline_audit.py — reproducible per-kernel roofline audit of a
BENCH_PROFILE trace (the evidence behind docs/DESIGN.md's "% of hardware
bound" claims). Tested against a synthetic trace-viewer JSON with
hand-computable bounds."""

import gzip
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "roofline_audit", os.path.join(REPO, "tools", "roofline_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


# MXU ceiling 100 TF/s = 100e6 flops/µs; HBM 1000 GB/s = 1e6 bytes/µs.
EVENTS = [
    # device conv kernel: 2e9 flops → bound 20 µs; measured 25 µs (80%)
    {"ph": "X", "name": "fusion.1", "dur": 25.0,
     "args": {"hlo_category": "convolution fusion",
              "model_flops": "2000000000", "raw_bytes_accessed": "1000000"}},
    # HBM-bound copy: 5e6 bytes → bound 5 µs; measured 10 µs (50%)
    {"ph": "X", "name": "copy.2", "dur": 10.0,
     "args": {"raw_bytes_accessed": "5000000"}},
    # host/python lane event (no cost args) must be EXCLUDED
    {"ph": "X", "name": "python_dispatch", "dur": 1e6, "args": {}},
    # control-flow CONTAINER op: carries cost args AND a duration spanning
    # its children (observed on the real TPU trace: the scan's `while`) —
    # must be excluded or the whole step double-counts
    {"ph": "X", "name": "while.543", "dur": 500.0,
     "args": {"hlo_category": "while",
              "model_flops": "2000000000", "raw_bytes_accessed": "9000000"}},
    # metadata event must be ignored
    {"ph": "M", "name": "process_name", "args": {"name": "/host:CPU"}},
]


def test_audit_math(tmp_path):
    mod = _mod()
    ops, excluded = mod.device_op_events(EVENTS)
    assert [e["name"] for e in ops] == ["fusion.1", "copy.2"]
    assert excluded["n"] == 1 and excluded["us"] == pytest.approx(500.0)
    assert excluded["names"] == {"while.543"}
    per_class, per_op = mod.audit(ops, mxu_tflops=100.0, hbm_gbps=1000.0)
    conv = per_class["conv fusions"]
    assert conv["us"] == pytest.approx(25.0)
    assert conv["bound_us"] == pytest.approx(20.0)  # flops bound > bytes bound
    assert conv["clamped_us"] == pytest.approx(20.0)  # bound binds: min(25,20)
    cp = per_class["copies/relayout"]
    assert cp["us"] == pytest.approx(10.0)
    assert cp["bound_us"] == pytest.approx(5.0)
    assert per_op["fusion.1"]["n"] == 1


def test_audit_clamps_non_binding_bounds():
    """An op whose cost-model bound EXCEEDS its measured time (bitcast
    copies, async overlap) must clamp to measured in clamped_us."""
    mod = _mod()
    ops, _ = mod.device_op_events([
        {"ph": "X", "name": "copy.9", "dur": 2.0,
         "args": {"raw_bytes_accessed": "5000000"}},  # bound 5 µs > 2 µs
    ])
    per_class, _ = mod.audit(ops, mxu_tflops=100.0, hbm_gbps=1000.0)
    cp = per_class["copies/relayout"]
    assert cp["bound_us"] == pytest.approx(5.0)
    assert cp["clamped_us"] == pytest.approx(2.0)


def test_container_excluded_by_name_when_category_missing():
    mod = _mod()
    ops, excluded = mod.device_op_events([
        {"ph": "X", "name": "while.1", "dur": 9.0,
         "args": {"model_flops": "1"}},
    ])
    assert ops == [] and excluded["n"] == 1


def test_classify_prefers_hlo_category():
    mod = _mod()
    assert mod.classify({"name": "fusion.9", "args": {"hlo_category": "convolution"}}) \
        == "conv fusions"
    assert mod.classify({"name": "fusion.9", "args": {}}) == "loop fusions"
    assert mod.classify({"name": "rng-bit-generator.1", "args": {}}) == "rng"
    assert mod.classify({"name": "select-and-scatter.3", "args": {}}) \
        == "maxpool bwd (select_and_scatter)"


def test_cli_end_to_end(tmp_path, capsys):
    mod = _mod()
    trace = str(tmp_path / "plugins" / "profile" / "2026_01_01" / "vm.trace.json.gz")
    _write_trace(trace, EVENTS)
    rc = mod.main([str(tmp_path), "--mxu-tflops", "100", "--hbm-gbps", "1000"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "conv fusions" in out and "copies/relayout" in out
    # totals: 35 µs measured vs 25 µs bound = 71.4%
    assert "71.4%" in out
    assert "fusion.1" in out  # headroom ranking lists the op
    # the synthetic while container is reported as excluded
    assert "excluded 1 control-flow container" in out
    assert "while.543" in out


def test_cli_empty_trace(tmp_path, capsys):
    mod = _mod()
    trace = str(tmp_path / "p" / "vm.trace.json.gz")
    _write_trace(trace, [{"ph": "M", "name": "process_name"}])
    rc = mod.main([str(tmp_path)])
    assert rc == 1
    assert "no device op events" in capsys.readouterr().err
