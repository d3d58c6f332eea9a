"""N-seed train+eval campaign of ONE recipe via the real CLI → errors JSON.

The single-arm sibling of tools/flagset_ab.py: trains ``--seeds`` runs of a
config/dataset recipe (identical flags, varying seed), evals each final
checkpoint, and writes ``--out`` (default
``<workdir>/seed_campaign_<config>_<dataset>_n<labels>.json``) with the
per-seed final test errors and their mean/std — the "this framework"
population for distributional cross-implementation comparisons
(tools/tf_parity_train.py --compare-json <out> --compare-key errors_pct;
docs/PARITY.md §10/§12).

    python tools/seed_campaign.py --data-dir /tmp/shapes_data \
        --workdir /tmp/shapes_parity --config cifar10_4k --dataset shapes16 \
        --seeds 1,2,3,4,5,6 --num-labeled 400 --epochs 15 \
        --warmup-epochs 5 --override image_size=16 --platform tpu --resume

Same resume semantics as the A/B tool: completed train legs (the CLI's
``done: step=`` marker) are skipped, eval scores are cached per seed.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_flagset():
    spec = importlib.util.spec_from_file_location(
        "flagset_ab", os.path.join(REPO, "tools", "flagset_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_fab = _load_flagset()
run_cli = _fab.run_cli
cli_cmd = _fab.cli_cmd
ERROR_RE = _fab.ERROR_RE
train_completed = _fab.train_completed
parse_final_metrics = _fab.parse_final_metrics


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--config", default="mnist100")
    ap.add_argument("--dataset", default="digits")
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--num-labeled", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--warmup-epochs", type=int, default=100)
    ap.add_argument("--override", action="append", default=[], metavar="K=V",
                    help="extra --set k=v for every train+eval leg")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s]
    if len(set(seeds)) != len(seeds):
        ap.error(f"duplicate seeds in --seeds {args.seeds!r}")
    if args.platform:
        os.environ["TRIPLEGAN_PLATFORM"] = args.platform

    def stage_cmds(seed: int) -> dict:
        name = f"sc_{args.config}_{args.dataset}_n{args.num_labeled}_s{seed}"
        common = ["--workdir", args.workdir, "--data-dir", args.data_dir]
        sets = [
            "--set", f"dataset={args.dataset}",
            "--set", f"name={name}",
            "--set", f"seed={seed}",
            "--set", f"num_labeled={args.num_labeled}",
        ]
        for kv in args.override:
            sets += ["--set", kv]
        return {
            "train": ["train", "--config", args.config, *common, *sets,
                      "--set", f"epochs={args.epochs}",
                      "--set", f"alpha_p_warmup_epochs={args.warmup_epochs}",
                      "--set", "eval_every_epochs=0",
                      "--set", "ckpt_every_epochs=0"],
            "eval": ["eval", "--config", args.config, *common, *sets],
            "log": os.path.join(args.workdir, f"{name}_train.log"),
            "eval_cache": os.path.join(args.workdir, f"{name}_eval.json"),
        }

    prepare_cmd = ["prepare", "--dataset", args.dataset,
                   "--data-dir", args.data_dir]
    needs_prepare = args.dataset in _fab._PREPARE_RAW_FREE

    if args.dry_run:
        import shlex
        if needs_prepare:
            print(f"+ {shlex.join(cli_cmd(prepare_cmd))}")
        for seed in seeds:
            cmds = stage_cmds(seed)
            for leg in ("train", "eval"):
                print(f"+ {shlex.join(cli_cmd(cmds[leg]))}")
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    if needs_prepare:
        run_cli(prepare_cmd)

    errors, metrics = [], []
    for seed in seeds:
        cmds = stage_cmds(seed)
        print(f"=== seed {seed} ===", flush=True)
        if args.resume and train_completed(cmds["log"]):
            print(f"  resume: {cmds['log']} already complete, skipping train",
                  flush=True)
        else:
            run_cli(cmds["train"], log_path=cmds["log"])
        # Cached eval → the train log's final-eval line (free; saves a
        # ~10 min tunnel handshake per seed) → real eval leg as fallback.
        if args.resume and os.path.exists(cmds["eval_cache"]):
            with open(cmds["eval_cache"]) as f:
                err_pct = json.load(f)["test_error_pct"]
            print(f"  resume: eval cached ({err_pct}%), skipping", flush=True)
        else:
            err_pct = _fab.parse_train_final_error(cmds["log"])
            if err_pct is not None:
                print(f"  scored from train log final eval ({err_pct}%)",
                      flush=True)
            else:
                out = run_cli(cmds["eval"])
                m = ERROR_RE.search(out)
                if not m:
                    print(f"could not parse test error for seed {seed}",
                          file=sys.stderr)
                    return 1
                err_pct = float(m.group(1))
            with open(cmds["eval_cache"], "w") as f:
                json.dump({"test_error_pct": err_pct}, f)
        errors.append(err_pct)
        metrics.append(parse_final_metrics(cmds["log"]))

    summary = {
        "implementation": "triplegan_tpu",
        "recipe": f"{args.config}-on-{args.dataset}",
        "overrides": args.override,
        "num_labeled": args.num_labeled,
        "epochs": args.epochs,
        "warmup_epochs": args.warmup_epochs,
        "seeds": seeds,
        "errors_pct": [round(e, 2) for e in errors],
        "mean_pct": round(float(np.mean(errors)), 2),
        "std_pct": round(float(np.std(errors)), 2),
        "final_metrics": metrics,
    }
    out_path = args.out or os.path.join(
        args.workdir,
        f"seed_campaign_{args.config}_{args.dataset}_n{args.num_labeled}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
