"""Per-kernel roofline audit of a BENCH_PROFILE trace.

Reproduces the perf-journal claim (docs/DESIGN.md "Roofline update
(round 3)") from raw data: every device kernel in the trace is scored
against its own hardware bound

    bound_us = max(model_flops / MXU_ceiling, raw_bytes_accessed / HBM_bw)

and the tool reports, per kernel class and overall, measured time vs the
summed bound — i.e. how close the compiled step runs to what this chip
demonstrably supports. Usage:

    BENCH_PROFILE=/tmp/benchtrace python bench.py
    python tools/roofline_audit.py /tmp/benchtrace [--steps 160]

The ceilings default to this chip's MEASURED numbers (175.8 TF/s bf16
matmul at 20480², 819 GB/s HBM — journal rows with the probes), not the
nominal datasheet peaks; override with --mxu-tflops / --hbm-gbps.

Input format: the trace-viewer JSON (``*.trace.json.gz``) that
``jax.profiler`` writes under ``plugins/profile/<ts>/``. Device op events
carry ``model_flops`` / ``raw_bytes_accessed`` in their args (XLA's cost
model per executed kernel); host/python lanes don't and are excluded.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

# Kernel classes, matched in order against the event name (first hit wins).
# These mirror the perf journal's decomposition classes.
CLASSES = (
    ("conv fusions", ("conv",)),
    ("maxpool bwd (select_and_scatter)", ("select-and-scatter", "select_and_scatter")),
    ("rng", ("rng",)),
    ("copies/relayout", ("copy", "transpose")),
    ("data formatting", ("slice", "concatenate", "gather", "reshape", "pad")),
    ("reductions", ("reduce",)),
    ("loop fusions", ("fusion", "loop")),
)


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]  # newest profile dir sorts last (timestamped names)


def load_events(trace_path: str) -> list[dict]:
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rt") as f:
        tr = json.load(f)
    return tr["traceEvents"]


# HLO container ops whose trace event SPANS its children (which are
# separately present in the same lane): counting them double-counts the
# whole loop body. Verified on a real TPU trace (2026-08-17 batch-384
# final-defaults run): the scan's `while` op carries model_flops /
# raw_bytes_accessed AND a duration covering all 20 body iterations —
# 6.7 s of a 7.0 s trace.
CONTAINER_CATEGORIES = {"while", "conditional", "call"}


def device_op_events(events: list[dict]) -> tuple[list[dict], dict]:
    """X-phase events that carry XLA cost-model args — these are the
    device kernels. (Host/python lanes have no model_flops; the XLA
    Modules lane's whole-program events carry neither arg — verified on a
    real TPU trace.) Control-flow container events (while/cond/call) are
    excluded: their duration spans their children, which appear
    separately. Returns (kernel_events, excluded_summary)."""
    out = []
    excluded = {"n": 0, "us": 0.0, "names": set()}
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        if "model_flops" not in args and "raw_bytes_accessed" not in args:
            continue
        cat = str(args.get("hlo_category", "")).lower()
        name = str(e.get("name", ""))
        if cat in CONTAINER_CATEGORIES or (
            not cat and name.split(".")[0] in CONTAINER_CATEGORIES
        ):
            excluded["n"] += 1
            excluded["us"] += float(e.get("dur", 0.0))
            excluded["names"].add(name)
            continue
        out.append(e)
    return out, excluded


def classify(e: dict) -> str:
    """Prefer the trace's own HLO category (TPU traces carry it per op);
    fall back to name keywords."""
    args = e.get("args") or {}
    cat = str(args.get("hlo_category", "")).lower()
    low = (cat + " " + e.get("name", "")).lower()
    for cls, keys in CLASSES:
        if any(k in low for k in keys):
            return cls
    return "misc"


def audit(events: list[dict], mxu_tflops: float, hbm_gbps: float):
    """Returns (per_class, per_op) dicts: measured µs, bound µs, counts."""
    per_class = defaultdict(
        lambda: {"us": 0.0, "bound_us": 0.0, "clamped_us": 0.0, "n": 0}
    )
    per_op = defaultdict(
        lambda: {"us": 0.0, "bound_us": 0.0, "clamped_us": 0.0, "n": 0}
    )
    for e in events:
        args = e.get("args") or {}
        dur = float(e.get("dur", 0.0))  # trace-viewer durations are µs
        flops = float(args.get("model_flops", 0) or 0)
        bbytes = float(args.get("raw_bytes_accessed", 0) or 0)
        bound = max(flops / (mxu_tflops * 1e6), bbytes / (hbm_gbps * 1e3))
        name = e.get("name", "?")
        for bucket in (per_class[classify(e)], per_op[name]):
            bucket["us"] += dur
            bucket["bound_us"] += bound
            # The cost model counts LOGICAL bytes; ops XLA made free
            # (bitcast copies) or overlapped (async copy-done) can beat
            # their "bound". Clamping per event gives a floor that only
            # binds where it demonstrably binds.
            bucket["clamped_us"] += min(dur, bound)
            bucket["n"] += 1
    return per_class, per_op


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="per-kernel roofline audit")
    p.add_argument("trace", help="profile dir (BENCH_PROFILE) or *.trace.json.gz")
    p.add_argument("--mxu-tflops", type=float, default=175.8,
                   help="measured matmul ceiling, TF/s (nominal v5e bf16: 197)")
    p.add_argument("--hbm-gbps", type=float, default=819.0,
                   help="measured HBM bandwidth, GB/s")
    p.add_argument("--steps", type=int, default=0,
                   help="train steps the trace covers → per-step ms column")
    p.add_argument("--top", type=int, default=10,
                   help="also list the N ops with the most headroom")
    args = p.parse_args(argv)

    try:
        trace_path = find_trace(args.trace)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 1
    ops, excluded = device_op_events(load_events(trace_path))
    if not ops:
        print(f"no device op events with cost-model args in {trace_path}",
              file=sys.stderr)
        return 1
    per_class, per_op = audit(ops, args.mxu_tflops, args.hbm_gbps)

    def fmt(us: float) -> str:
        return f"{us / 1e3 / args.steps:8.3f}" if args.steps else f"{us / 1e3:8.2f}"

    unit = "ms/step" if args.steps else "ms total"
    print(f"trace: {trace_path}")
    print(f"ceilings: MXU {args.mxu_tflops} TF/s, HBM {args.hbm_gbps} GB/s")
    if excluded["n"]:
        names = ", ".join(sorted(excluded["names"])[:4])
        print(f"excluded {excluded['n']} control-flow container event(s) "
              f"spanning {fmt(excluded['us']).strip()} {unit} ({names}) — "
              "their children are counted individually")
    print(f"{'class':36s} {unit:>9s} {'bound':>9s} {'% of bound':>10s} {'kernels':>8s}")
    tot_us = tot_bound = tot_clamped = 0.0
    for cls, b in sorted(per_class.items(), key=lambda kv: -kv[1]["us"]):
        pct = 100.0 * b["bound_us"] / b["us"] if b["us"] else 0.0
        note = "  (bound not binding)" if b["bound_us"] > b["us"] else ""
        print(f"{cls:36s} {fmt(b['us'])} {fmt(b['bound_us'])} {pct:9.1f}% "
              f"{b['n']:8d}{note}")
        tot_us += b["us"]
        tot_bound += b["bound_us"]
        tot_clamped += b["clamped_us"]
    pct = 100.0 * tot_bound / tot_us if tot_us else 0.0
    print(f"{'TOTAL':36s} {fmt(tot_us)} {fmt(tot_bound)} {pct:9.1f}%")
    if tot_clamped:
        print(f"{'TOTAL (bound clamped at measured)':36s} {fmt(tot_us)} "
              f"{fmt(tot_clamped)} — step runs at "
              f"{100.0 * tot_clamped / tot_us:.1f}% of its demonstrated "
              "per-kernel floor (classes whose cost-model bytes never "
              "materialize — bitcasts, async overlap — clamp to measured)")
    print(f"\ntop {args.top} ops by absolute headroom (measured − bound):")
    ranked = sorted(per_op.items(), key=lambda kv: kv[1]["bound_us"] - kv[1]["us"])
    for name, b in ranked[: args.top]:
        gap_ms = (b["us"] - b["bound_us"]) / 1e3
        pct = 100.0 * b["bound_us"] / b["us"] if b["us"] else 0.0
        print(f"  {gap_ms:7.3f} ms gap  {pct:5.1f}% of bound  ×{b['n']:<4d} {name[:80]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
