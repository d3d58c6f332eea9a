"""Quality qualification A/B for the ``share_pseudo_forward`` FLOP lever.

``share_pseudo_forward`` (train/step.py, DESIGN.md deviations #11) reuses
ONE classifier forward for D's pseudo-labeling and C's unlabeled stream,
cutting −9% of the step FLOPs (measured 9,305 vs 8,717 img/s on-chip). Its
gradient composition is proven exact under a shared batch
(tests/test_step.py::test_share_pseudo_forward_grads_match_naive); the open
question this tool answers is the SEMANTIC deviation: D's and C's unlabeled
draws become the same batch per iteration (correlated), which changes the
training trajectory. Does that measurably affect final classifier quality?

    python tools/sharefwd_ab.py --data-dir /tmp/digits_data \
        --workdir /tmp/sharefwd_ab [--seeds 1,...,10] [--dataset digits] \
        [--config mnist100] [--epochs 300] [--platform tpu] [--dry-run]

Per seed it trains TWO arms via the real CLI (identical config, identical
seed → identical init/split/data stream structure), differing ONLY in the
flag:

  A. control — ``share_pseudo_forward=false`` (the reference semantics:
     independent unlabeled draws for D and C);
  B. variant — ``share_pseudo_forward=true`` (shared draw + vjp graft).

It writes ``<workdir>/sharefwd_ab_<dataset>_n<labels>.json`` with per-seed
final test errors for both arms, their means, the paired sign + exact
permutation tests (same statistics as tools/digits_experiment.py), and a
verdict: ``WITHIN_NOISE`` when the permutation p ≥ 0.05 (no measurable
quality effect — the lever is safe to adopt for throughput configs) else
``SIGNIFICANT`` with the direction. Exit 0 either way (the verdict is data,
not a failure); non-zero only on infrastructure errors.

Two recommended legs (VERDICT r3 next-step #2):
  * real data: ``--dataset digits --config mnist100 --num-labeled 100``
    (the in-regime budget from docs/PARITY.md §8);
  * flagship architecture: ``--dataset synthetic --config cifar10_4k
    --epochs 500`` — the synthetic stand-in is noise-dominated by
    construction (per-pixel SNR ≈ 1, DESIGN.md "deploy rehearsal"), so
    test errors stay near chance level in BOTH arms and carry no quality
    signal; this leg qualifies STABILITY at the cifar10_4k architecture
    instead: both arms must hold the same healthy adversarial equilibrium
    (the recorded final loss terms must land in the same range — see
    ``final_metrics_off/on`` in the artifact and PARITY.md §9).

Reference lineage: the reference has no such lever ([ref-expected]
Training/train_triple_gan.py runs three independent sess.run input pulls);
this tool exists to qualify a rebuild-only optimization before it can
carry the headline bench number.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import re
import shlex
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_experiment():
    spec = importlib.util.spec_from_file_location(
        "digits_experiment", os.path.join(REPO, "tools", "digits_experiment.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_exp = _load_experiment()
run_cli = _exp.run_cli
cli_cmd = _exp.cli_cmd
ERROR_RE = _exp.ERROR_RE
paired_permutation_p = _exp.paired_permutation_p

# Final training-metrics line in a train log: "step N/M [X img/s] k=v ..."
METRICS_RE = re.compile(r"^step \d+/\d+ \[[0-9.]+ img/s\] (.+)$")


def train_completed(log_path: str) -> bool:
    """True when a prior train leg ran to completion: the CLI prints
    ``done: step=N ...`` ONLY on non-preempted completion (cli.py:88 —
    preemption exits 75 before it, crashes never reach it), so its
    presence in the log is a sound resume marker."""
    try:
        with open(log_path) as f:
            return bool(re.search(r"^done: step=\d+", f.read(), re.M))
    except OSError:
        return False


def parse_final_metrics(log_path: str) -> dict:
    """Last per-step metrics line of a train log → {term: value}. Used by
    the synthetic leg to compare arm stability (loss terms in range): the
    noise-dominated synthetic data pins test error near chance in both
    arms, so the equilibrium loss terms are the informative signal."""
    last = None
    try:
        with open(log_path) as f:
            for line in f:
                m = METRICS_RE.match(line.strip())
                if m:
                    last = m.group(1)
    except OSError:
        return {}
    if not last:
        return {}
    out = {}
    for kv in last.split():
        k, _, v = kv.partition("=")
        try:
            out[k] = float(v)
        except ValueError:
            pass
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--dataset", default="digits",
                    choices=("digits", "synthetic"))
    ap.add_argument("--config", default="mnist100")
    ap.add_argument("--num-labeled", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--warmup-epochs", type=int, default=100)
    ap.add_argument("--eval-every-epochs", type=int, default=0,
                    help="0 = final eval only (the compared number)")
    ap.add_argument("--ckpt-every-epochs", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--override", action="append", default=[],
                    help="extra --set k=v applied to BOTH arms' train+eval "
                         "(e.g. scan_steps=12 to amortize tunnel dispatch "
                         "round-trips — trajectory-identical, "
                         "tests/test_parallel.py scan≡sequential)")
    ap.add_argument("--resume", action="store_true",
                    help="skip an arm's train leg when its log already shows "
                         "a completed run ('done: step=' line); the eval leg "
                         "then scores the existing checkpoint. Trusts that "
                         "the prior run used the same settings (run names "
                         "encode dataset/n/seed/arm but not epochs). For "
                         "restarting a campaign the flaky tunnel killed "
                         "mid-way without retraining finished arms.")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the stage commands without running anything")
    args = ap.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s]
    if len(set(seeds)) != len(seeds):
        ap.error(f"duplicate seeds in --seeds {args.seeds!r}")
    if args.num_labeled % 10 != 0 or args.num_labeled <= 0:
        ap.error(f"--num-labeled must be a positive multiple of 10, got "
                 f"{args.num_labeled}")
    if args.platform:
        os.environ["TRIPLEGAN_PLATFORM"] = args.platform

    arms = (("off", "false"), ("on", "true"))

    def stage_cmds(seed: int, arm: str, value: str) -> dict[str, list[str]]:
        name = f"ab_{args.dataset}_n{args.num_labeled}_s{seed}_{arm}"
        common = ["--workdir", args.workdir, "--data-dir", args.data_dir]
        overrides = [
            "--set", f"dataset={args.dataset}",
            "--set", f"name={name}",
            "--set", f"seed={seed}",
            "--set", f"num_labeled={args.num_labeled}",
            "--set", f"share_pseudo_forward={value}",
        ]
        for kv in args.override:
            overrides += ["--set", kv]
        return {
            "train": ["train", "--config", args.config, *common, *overrides,
                      "--set", f"epochs={args.epochs}",
                      "--set", f"alpha_p_warmup_epochs={args.warmup_epochs}",
                      "--set", f"eval_every_epochs={args.eval_every_epochs}",
                      "--set", f"ckpt_every_epochs={args.ckpt_every_epochs}"],
            "eval": ["eval", "--config", args.config, *common, *overrides],
            "log": os.path.join(args.workdir, f"{name}_train.log"),
            "eval_cache": os.path.join(args.workdir, f"{name}_eval.json"),
        }

    prepare_cmd = ["prepare", "--dataset", "digits", "--data-dir", args.data_dir]

    if args.dry_run:
        if args.dataset == "digits":
            print(f"+ {shlex.join(cli_cmd(prepare_cmd))}")
        for seed in seeds:
            for arm, value in arms:
                cmds = stage_cmds(seed, arm, value)
                for leg in ("train", "eval"):
                    print(f"+ {shlex.join(cli_cmd(cmds[leg]))}")
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    if args.dataset == "digits":
        run_cli(prepare_cmd)

    errors = {"off": [], "on": []}
    final_metrics = {"off": [], "on": []}
    for seed in seeds:
        for arm, value in arms:
            cmds = stage_cmds(seed, arm, value)
            print(f"=== seed {seed}: share_pseudo_forward={value} ===",
                  flush=True)
            if args.resume and train_completed(cmds["log"]):
                print(f"  resume: {cmds['log']} already complete, "
                      "skipping train", flush=True)
            else:
                run_cli(cmds["train"], log_path=cmds["log"])
            # Evals over the flaky tunnel cost ~6 min each; cache each
            # arm's scored error so a killed campaign never re-evals.
            if args.resume and os.path.exists(cmds["eval_cache"]):
                with open(cmds["eval_cache"]) as f:
                    err_pct = json.load(f)["test_error_pct"]
                print(f"  resume: eval cached ({err_pct}%), skipping",
                      flush=True)
            else:
                out = run_cli(cmds["eval"])
                m = ERROR_RE.search(out)
                if not m:
                    print(f"could not parse test error for seed {seed} "
                          f"arm {arm}", file=sys.stderr)
                    return 1
                err_pct = float(m.group(1))
                with open(cmds["eval_cache"], "w") as f:
                    json.dump({"test_error_pct": err_pct}, f)
            errors[arm].append(err_pct / 100.0)
            final_metrics[arm].append(parse_final_metrics(cmds["log"]))

    off, on = errors["off"], errors["on"]
    off_mean = sum(off) / len(off)
    on_mean = sum(on) / len(on)
    diff = on_mean - off_mean  # >0: variant is WORSE

    import math

    wins_on = sum(1 for a, b in zip(off, on) if b < a)
    wins_off = sum(1 for a, b in zip(off, on) if b > a)
    n_pairs = wins_on + wins_off
    if n_pairs:
        k = max(wins_on, wins_off)
        tail = sum(math.comb(n_pairs, i) for i in range(k, n_pairs + 1))
        sign_p = min(1.0, 2.0 * tail / 2.0**n_pairs)
    else:
        sign_p = 1.0
    perm_p = paired_permutation_p(off, on)
    if perm_p >= 0.05:
        verdict = "WITHIN_NOISE"
    else:
        verdict = ("SIGNIFICANT_VARIANT_WORSE" if diff > 0
                   else "SIGNIFICANT_VARIANT_BETTER")
    summary = {
        "lever": "share_pseudo_forward",
        "dataset": args.dataset,
        "config": args.config,
        "num_labeled": args.num_labeled,
        "seeds": seeds,
        "off_errors_pct": [round(100 * e, 2) for e in off],
        "on_errors_pct": [round(100 * e, 2) for e in on],
        "off_mean_pct": round(100 * off_mean, 2),
        "on_mean_pct": round(100 * on_mean, 2),
        "on_minus_off_pct": round(100 * diff, 2),
        "seed_wins_on": f"{wins_on}/{len(seeds)}",
        "sign_test_p": round(sign_p, 4),
        "perm_test_p": round(perm_p, 4),
        "epochs": args.epochs,
        "final_metrics_off": final_metrics["off"],
        "final_metrics_on": final_metrics["on"],
        "verdict": verdict,
    }
    path = os.path.join(
        args.workdir, f"sharefwd_ab_{args.dataset}_n{args.num_labeled}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary → {path}\nverdict: {verdict} "
          f"(on {100 * on_mean:.2f}% vs off {100 * off_mean:.2f}%, "
          f"perm p={perm_p:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
