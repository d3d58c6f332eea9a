"""Render training curves from run-dir metrics.jsonl files to one PNG.

The reference's de-facto verification is inspecting TensorBoard loss
curves ([ref-expected] Training/train_base.py summaries — SURVEY.md §2.1
#12, §4); this framework writes the same scalars to both TensorBoard and
a plain `metrics.jsonl` (utils/logging.py). This tool renders the JSONL
directly — no TensorBoard needed — and overlays multiple runs (e.g. the
parity campaign's seeds, docs/PARITY.md §4) for the three-player
equilibrium / error-curve comparison.

    python tools/plot_metrics.py WORKDIR/seed1/cifar10_4k WORKDIR/seed2/cifar10_4k \
        [--out curves.png] [--keys loss_d,loss_g,...] [--smooth 0.9]

Each argument is a run dir containing metrics.jsonl (or a direct path to
a .jsonl file). Default keys are the curated three-player set, filtered
to what the logs actually contain; --keys overrides. --smooth is an EMA
coefficient in [0, 1) — smoothed line drawn bold over the faint raw one.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from collections import defaultdict

# Curated default panel order: the three player losses, their main terms,
# the quality/schedule signals. Filtered to keys present in the data.
DEFAULT_KEYS = (
    "loss_d", "loss_g", "loss_c", "c_sup", "c_pseudo", "c_adv",
    "d_real", "d_cla", "d_gen", "test_error", "images_per_sec",
    "lr_frac", "alpha_p",
)


def load_series(path: str) -> dict[str, tuple[list[float], list[float]]]:
    """{key: (steps, values)} from one metrics.jsonl (lines are sparse:
    eval lines carry only test_error, train lines carry the loss terms)."""
    jsonl = path if path.endswith(".jsonl") else os.path.join(path, "metrics.jsonl")
    if not os.path.isfile(jsonl):
        raise FileNotFoundError(f"no metrics.jsonl at {jsonl}")
    series: dict[str, tuple[list[float], list[float]]] = defaultdict(
        lambda: ([], [])
    )
    with open(jsonl) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = float(rec.get("step", 0))
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, (int, float)):
                    continue
                s, vals = series[k]
                s.append(step)
                vals.append(float(v))
    return dict(series)


def ema(values: list[float], coef: float) -> list[float]:
    out, acc = [], None
    for v in values:
        acc = v if acc is None else coef * acc + (1.0 - coef) * v
        out.append(acc)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="plot metrics.jsonl training curves")
    p.add_argument("runs", nargs="+",
                   help="run dirs containing metrics.jsonl (or .jsonl paths)")
    p.add_argument("--out", default="curves.png")
    p.add_argument("--keys", default="",
                   help="comma-separated metric keys (default: curated set "
                        "filtered to available keys)")
    p.add_argument("--smooth", type=float, default=0.0,
                   help="EMA coefficient in [0,1); 0 = raw only")
    args = p.parse_args(argv)
    if not 0.0 <= args.smooth < 1.0:
        p.error(f"--smooth must be in [0, 1): {args.smooth}")

    import matplotlib

    matplotlib.use("Agg")  # headless: never require a display
    import matplotlib.pyplot as plt

    data: dict[str, dict] = {}
    for run in args.runs:
        label = os.path.basename(os.path.normpath(run)) or run
        if label in data:  # two runs with the same basename: disambiguate
            label = run
        data[label] = load_series(run)

    available = [k for d in data.values() for k in d]
    if args.keys:
        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        missing = [k for k in keys if k not in available]
        if missing:
            print(f"keys not in any run's metrics.jsonl: {missing} "
                  f"(available: {sorted(set(available))})", file=sys.stderr)
            return 1
    else:
        keys = [k for k in DEFAULT_KEYS if k in available]
        keys += sorted(k for k in set(available) if k not in DEFAULT_KEYS)
    if not keys:
        print("no scalar series found", file=sys.stderr)
        return 1

    ncols = math.ceil(math.sqrt(len(keys)))
    nrows = math.ceil(len(keys) / ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4.2 * ncols, 3.0 * nrows), squeeze=False
    )
    for i, key in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        for label, series in data.items():
            if key not in series:
                continue
            steps, vals = series[key]
            if args.smooth and len(vals) > 2:
                # raw + smoothed share one color so the pair reads as one run
                (raw_line,) = ax.plot(steps, vals, alpha=0.25, lw=0.8)
                ax.plot(steps, ema(vals, args.smooth), lw=1.4, label=label,
                        color=raw_line.get_color())
            else:
                ax.plot(steps, vals, lw=1.0, label=label)
        ax.set_title(key, fontsize=10)
        ax.tick_params(labelsize=8)
        if len(data) > 1 and i == 0:
            ax.legend(fontsize=7)
    for j in range(len(keys), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    plt.close(fig)
    print(f"wrote {args.out} ({len(keys)} panels, {len(data)} run(s))")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
