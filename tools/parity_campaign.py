"""One-command real-data parity campaign (docs/PARITY.md §3–§4, §6).

The runbook's download → prepare → N-seed train → eval sequence, run
unattended by one process the moment real data exists:

    python tools/parity_campaign.py --config cifar10_4k \
        --raw-dir /data/raw --data-dir /data/prepared --workdir /data/runs \
        [--download] [--seeds 1,2,3] [--reference-error 16.99] [--band 0.3]

Each stage is the EXACT CLI command the runbook documents (subprocesses of
this interpreter — one device process at a time, trains auto-resume on
rerun), so the campaign is a convenience wrapper, not a second code path.
It finishes by writing ``<workdir>/parity_summary.json`` with the per-seed
errors, their mean/spread, and the pass/fail verdict against the
acceptance band (mean within ±band of the reference error, PARITY.md §1),
and exits 0 on pass / 2 on fail so deployments can gate on it.

The conditional-CIFAR Inception-score leg (PARITY.md §5) needs an external
Inception-v3 SavedModel and stays a manual follow-up.

Reference lineage: the TF reference's equivalent is hand-running its train
and eval entry scripts per seed ([ref-expected] Training/train_triple_gan.py,
Testing/ — SURVEY.md §3.2/§3.4); it ships no campaign automation.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shlex
import subprocess
import sys

# tools/ scripts run without a pip install: the repo root is one level up
# (children also need it on PYTHONPATH — see run_cli).
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ERROR_RE = re.compile(r"test error: ([0-9.]+)%")


def cli_cmd(args: list[str]) -> list[str]:
    """The exact stage command — shared by --dry-run and execution so the
    printed plan can never diverge from what actually runs."""
    return [sys.executable, "-m", "triplegan_tpu.cli", *args]


def run_cli(args: list[str], log_path: str | None = None) -> str:
    """Run one ``python -m triplegan_tpu.cli ...`` stage; stream output to
    ``log_path`` (train legs run for hours) or capture it (eval legs).
    Returns captured stdout ('' when logging to a file)."""
    cmd = cli_cmd(args)
    print("+ " + shlex.join(cmd), flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if log_path:
        with open(log_path, "a") as log:
            proc = subprocess.run(
                cmd, stdout=log, stderr=subprocess.STDOUT, env=env
            )
        if proc.returncode != 0:
            # Name the log that holds the actual error — an unattended
            # campaign must not die with a bare CalledProcessError.
            print(f"stage failed (rc={proc.returncode}) — see {log_path}",
                  file=sys.stderr, flush=True)
            raise subprocess.CalledProcessError(proc.returncode, cmd)
        return ""
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        # Surface the child's output BEFORE raising — a failing eval leg in
        # an hours-long campaign must not die with a bare traceback.
        raise subprocess.CalledProcessError(
            proc.returncode, cmd, output=proc.stdout
        )
    return proc.stdout


def parse_error(eval_stdout: str) -> float:
    m = ERROR_RE.findall(eval_stdout)
    if not m:
        raise RuntimeError(
            "eval printed no 'test error: X.XX%' line — see output above"
        )
    return float(m[-1])


def dataset_of(config_name: str, sets: list[str]) -> str:
    for kv in sets:  # a --set dataset= override wins over the config default
        key, _, val = kv.partition("=")
        if key == "dataset":
            return val
    from triplegan_tpu.configs import get_config

    return str(get_config(config_name).dataset)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Unattended N-seed parity campaign (docs/PARITY.md)"
    )
    p.add_argument("--config", default="cifar10_4k")
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--seeds", default="1,2,3", help="comma-separated")
    p.add_argument("--download", action="store_true",
                   help="fetch raw archives (checksummed) before prepare")
    p.add_argument("--reference-error", type=float, default=16.99,
                   help="TF reference's achieved test error, %% (PARITY.md §1)")
    p.add_argument("--band", type=float, default=0.3,
                   help="acceptance half-width, absolute %% (PARITY.md §1)")
    p.add_argument("--set", dest="sets", action="append", default=[],
                   metavar="KEY=VAL",
                   help="extra --set overrides passed to train AND eval "
                        "(seed is campaign-managed; scan_steps defaults to "
                        "10 per the runbook unless overridden here)")
    p.add_argument("--dry-run", action="store_true",
                   help="print the exact commands without running anything")
    args = p.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    if not seeds:
        p.error("--seeds is empty")
    if len(set(seeds)) != len(seeds):
        # Duplicates would silently collapse in the per-seed dict and the
        # summary would present an N-seed verdict computed over fewer runs.
        p.error(f"--seeds has duplicates: {seeds}")
    for kv in args.sets:
        key = kv.split("=", 1)[0]
        if key == "seed":
            p.error("pass seeds via --seeds, not --set seed=")
    extra = list(args.sets)
    if not any(kv.split("=", 1)[0] == "scan_steps" for kv in extra):
        extra += ["scan_steps=10"]  # runbook default: execution-only key
    set_flags = [f for kv in extra for f in ("--set", kv)]

    dataset = dataset_of(args.config, extra)
    prepared = os.path.join(args.data_dir, dataset, "train.npz")
    stages: list[tuple[list[str], str | None]] = []
    if dataset != "synthetic" and (args.download or not os.path.exists(prepared)):
        prep = ["prepare", "--dataset", dataset, "--raw-dir", args.raw_dir,
                "--data-dir", args.data_dir]
        if args.download:
            prep.append("--download")
        stages.append((prep, None))
    elif dataset != "synthetic":
        print(f"prepared data found at {prepared} — skipping prepare")
    for seed in seeds:
        seed_wd = os.path.join(args.workdir, f"seed{seed}")
        train = ["train", "--config", args.config, "--data-dir", args.data_dir,
                 "--workdir", seed_wd, "--set", f"seed={seed}", *set_flags]
        stages.append((train, os.path.join(args.workdir, f"seed{seed}.log")))
    for seed in seeds:
        seed_wd = os.path.join(args.workdir, f"seed{seed}")
        # eval merges the run dir's persisted config.json (seed included),
        # but EXECUTION-only keys (mesh_shape, data_on_device, scan_steps —
        # configs/base.py EXEC_KEYS) are deliberately NOT persisted, so the
        # campaign's --set overrides must ride along to eval too.
        stages.append((["eval", "--config", args.config, "--data-dir",
                        args.data_dir, "--workdir", seed_wd, *set_flags],
                       None))

    if args.dry_run:
        for cli_args, _ in stages:
            print("+ " + shlex.join(cli_cmd(cli_args)))
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    errors: dict[str, float] = {}
    for cli_args, log in stages:
        out = run_cli(cli_args, log)
        if cli_args[0] == "eval":
            seed_wd = cli_args[cli_args.index("--workdir") + 1]
            errors[os.path.basename(seed_wd)] = parse_error(out)

    vals = list(errors.values())
    mean = sum(vals) / len(vals)
    spread = max(vals) - min(vals)
    passed = abs(mean - args.reference_error) <= args.band
    summary = {
        "config": args.config,
        "seeds": seeds,
        "errors_pct": errors,
        "mean_error_pct": round(mean, 4),
        "spread_pct": round(spread, 4),
        "reference_error_pct": args.reference_error,
        "band_pct": args.band,
        "pass": passed,
    }
    path = os.path.join(args.workdir, "parity_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    try:  # seed-overlay training curves next to the summary (best-effort)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "plot_metrics",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plot_metrics.py"),
        )
        plot_metrics = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(plot_metrics)
        run_dirs = [
            os.path.join(args.workdir, f"seed{s}", args.config) for s in seeds
        ]
        plot_metrics.main(
            [d for d in run_dirs if os.path.isdir(d)]
            + ["--out", os.path.join(args.workdir, "curves.png"),
               "--smooth", "0.9"]
        )
    except Exception as e:  # plotting must never fail the campaign verdict
        print(f"curve rendering skipped: {e}", file=sys.stderr)
    print(json.dumps(summary))
    print(f"wrote {path} — {'PASS' if passed else 'FAIL'} "
          f"(mean {mean:.2f}% vs {args.reference_error:.2f}±{args.band}%)")
    return 0 if passed else 2


if __name__ == "__main__":
    raise SystemExit(main())
