"""Arbitrary flag-set quality A/B: train two arms per seed via the real CLI,
differing ONLY in a declared set of config keys and/or env knobs, and decide
WITHIN_NOISE vs SIGNIFICANT with paired statistics.

Generalization of tools/sharefwd_ab.py (VERDICT r4 next-step #1): that tool
A/Bs exactly one boolean lever; this one A/Bs ANY flag ensemble — e.g. the
full headline bench configuration, which stacks FOUR deviations from the
shipped semantics (bench.py _HEADLINE_KNOBS):

    python tools/flagset_ab.py --data-dir /tmp/digits_data \
        --workdir /tmp/ensemble_ab --name bench_ensemble \
        --b-set compute_dtype=bfloat16 --b-set prng_impl=rbg \
        --b-set share_pseudo_forward=true --b-env TRIPLEGAN_DROPOUT_BITS=8 \
        [--a-set k=v] [--a-env K=V] [--seeds 1,...,10] [--dataset digits] \
        [--config mnist100] [--epochs 300] [--platform tpu] [--dry-run]

Arm A (control) defaults to the SHIPPED config semantics — no overrides —
and arm B (variant) applies the declared flag set. Both arms share seed,
config, dataset, split and schedule; per-arm env knobs (``--a-env``/
``--b-env``) cover levers with no config-key surface (u8 dropout's
``TRIPLEGAN_DROPOUT_BITS``, nn/layers.py:411). The eval leg re-applies the
same ``--set`` overrides and env as its train leg, so checkpoints are scored
under their own semantics (the run-dir config merge makes the ``--set``
repeats redundant but harmless — configs/base.py).

Output: ``<workdir>/<name>_ab_<dataset>_n<labels>.json`` with per-seed final
test errors for both arms, their means, the paired sign + exact permutation
tests (same statistics as tools/digits_experiment.py), per-arm final
training-metrics (equilibrium stability on datasets where error saturates),
and the verdict: ``WITHIN_NOISE`` when the permutation p ≥ 0.05, else
``SIGNIFICANT_<ARM>_WORSE``. Exit 0 either way (the verdict is data); non-
zero only on infrastructure errors.

Reference lineage: the reference has no quality-qualification harness
([ref-expected] Training/ runs one fixed recipe); this tool exists so
rebuild-only throughput levers must EARN a real-data quality verdict before
carrying the headline bench number (docs/PARITY.md §9/§11).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
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

# The train driver's completion line carries the FINAL test error (the
# staleness-fixed final eval, train/loop.py): on this hardware each extra
# CLI invocation costs ~10 min of tunnel handshake, so scoring from the
# train log instead of a separate eval leg halves a campaign's wall-clock.
# tests/test_cli.py asserts eval reproduces this exact number.
DONE_RE = re.compile(r"^done: step=\d+ .*test_error=([0-9.]+)%", re.M)


def parse_train_final_error(log_path: str):
    """Final test error (percent) from a completed train log, or None."""
    try:
        with open(log_path) as f:
            m = DONE_RE.search(f.read())
    except OSError:
        return None
    return float(m.group(1)) if m else None

# Datasets whose prepare step needs no raw files (data/prepare.py RAW_FREE);
# 'synthetic' is generated in-process by the trainer and never prepared.
_PREPARE_RAW_FREE = ("digits", "shapes", "shapes16")


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
    """Last per-step metrics line of a train log → {term: value}. On
    datasets where test error saturates (noise-dominated synthetic), the
    equilibrium loss terms are the informative arm-stability signal."""
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


def run_ab(
    *,
    workdir: str,
    data_dir: str,
    config: str,
    dataset: str,
    num_labeled: int,
    seeds: list[int],
    epochs: int,
    warmup_epochs: int,
    arms: dict[str, dict],  # ordered {arm_name: {"sets": [..], "env": {..}}}
    eval_every_epochs: int = 0,
    ckpt_every_epochs: int = 0,
    overrides: list[str] | None = None,
    run_prefix: str | None = None,
    artifact_path: str | None = None,
    summary_extra: dict | None = None,
    resume: bool = False,
    dry_run: bool = False,
    runner=None,
) -> int:
    """Core two-arm paired campaign. ``arms`` maps arm name → flag set;
    exactly two arms, iteration order = (control, variant). ``runner``
    defaults to this module's ``run_cli`` (injectable for tests)."""
    if len(arms) != 2:
        raise ValueError(f"exactly two arms required, got {list(arms)}")
    overrides = overrides or []
    if runner is None:
        def runner(args, log_path=None, extra_env=None):
            return run_cli(args, log_path=log_path, extra_env=extra_env)
    arm_names = list(arms)
    a_name, b_name = arm_names
    run_prefix = run_prefix or "ab"

    def stage_cmds(seed: int, arm: str) -> dict:
        name = f"{run_prefix}_{dataset}_n{num_labeled}_s{seed}_{arm}"
        common = ["--workdir", workdir, "--data-dir", data_dir]
        sets = [
            "--set", f"dataset={dataset}",
            "--set", f"name={name}",
            "--set", f"seed={seed}",
            "--set", f"num_labeled={num_labeled}",
        ]
        for kv in arms[arm].get("sets", []):
            sets += ["--set", kv]
        for kv in overrides:
            sets += ["--set", kv]
        return {
            "train": ["train", "--config", config, *common, *sets,
                      "--set", f"epochs={epochs}",
                      "--set", f"alpha_p_warmup_epochs={warmup_epochs}",
                      "--set", f"eval_every_epochs={eval_every_epochs}",
                      "--set", f"ckpt_every_epochs={ckpt_every_epochs}"],
            "eval": ["eval", "--config", config, *common, *sets],
            "env": dict(arms[arm].get("env", {})),
            "log": os.path.join(workdir, f"{name}_train.log"),
            "eval_cache": os.path.join(workdir, f"{name}_eval.json"),
        }

    prepare_cmd = ["prepare", "--dataset", dataset, "--data-dir", data_dir]
    needs_prepare = dataset in _PREPARE_RAW_FREE

    if dry_run:
        if needs_prepare:
            print(f"+ {shlex.join(cli_cmd(prepare_cmd))}")
        for seed in seeds:
            for arm in arm_names:
                cmds = stage_cmds(seed, arm)
                for leg in ("train", "eval"):
                    env = "".join(f"{k}={v} " for k, v in cmds["env"].items())
                    print(f"+ {env}{shlex.join(cli_cmd(cmds[leg]))}")
        return 0

    os.makedirs(workdir, exist_ok=True)
    if needs_prepare:
        runner(prepare_cmd)

    errors = {a_name: [], b_name: []}
    final_metrics = {a_name: [], b_name: []}
    for seed in seeds:
        for arm in arm_names:
            cmds = stage_cmds(seed, arm)
            extra_env = cmds["env"] or None
            print(f"=== seed {seed}: arm {arm} ===", flush=True)
            if resume and train_completed(cmds["log"]):
                print(f"  resume: {cmds['log']} already complete, "
                      "skipping train", flush=True)
            else:
                runner(cmds["train"], log_path=cmds["log"],
                       extra_env=extra_env)
            # Scoring order: cached eval → the train log's own final-eval
            # line (free — saves the ~10 min tunnel handshake of a separate
            # CLI invocation) → a real eval leg as fallback.
            if resume and os.path.exists(cmds["eval_cache"]):
                with open(cmds["eval_cache"]) as f:
                    err_pct = json.load(f)["test_error_pct"]
                print(f"  resume: eval cached ({err_pct}%), skipping",
                      flush=True)
            else:
                err_pct = parse_train_final_error(cmds["log"])
                if err_pct is not None:
                    print(f"  scored from train log final eval ({err_pct}%)",
                          flush=True)
                else:
                    out = runner(cmds["eval"], extra_env=extra_env)
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

    a, b = errors[a_name], errors[b_name]
    a_mean = sum(a) / len(a)
    b_mean = sum(b) / len(b)
    diff = b_mean - a_mean  # >0: variant arm is WORSE

    wins_b = sum(1 for x, y in zip(a, b) if y < x)
    wins_a = sum(1 for x, y in zip(a, b) if y > x)
    n_pairs = wins_a + wins_b
    if n_pairs:
        k = max(wins_a, wins_b)
        tail = sum(math.comb(n_pairs, i) for i in range(k, n_pairs + 1))
        sign_p = min(1.0, 2.0 * tail / 2.0**n_pairs)
    else:
        sign_p = 1.0
    perm_p = paired_permutation_p(a, b)
    if perm_p >= 0.05:
        verdict = "WITHIN_NOISE"
    else:
        worse = b_name if diff > 0 else a_name
        verdict = f"SIGNIFICANT_{worse.upper()}_WORSE"
    summary = {
        **(summary_extra or {}),
        "arms": {n: {"sets": arms[n].get("sets", []),
                     "env": arms[n].get("env", {})} for n in arm_names},
        "dataset": dataset,
        "config": config,
        "num_labeled": num_labeled,
        "seeds": seeds,
        f"{a_name}_errors_pct": [round(100 * e, 2) for e in a],
        f"{b_name}_errors_pct": [round(100 * e, 2) for e in b],
        f"{a_name}_mean_pct": round(100 * a_mean, 2),
        f"{b_name}_mean_pct": round(100 * b_mean, 2),
        f"{b_name}_minus_{a_name}_pct": round(100 * diff, 2),
        f"seed_wins_{b_name}": f"{wins_b}/{len(seeds)}",
        "sign_test_p": round(sign_p, 4),
        "perm_test_p": round(perm_p, 4),
        "epochs": epochs,
        f"final_metrics_{a_name}": final_metrics[a_name],
        f"final_metrics_{b_name}": final_metrics[b_name],
        "verdict": verdict,
    }
    if artifact_path is None:
        artifact_path = os.path.join(
            workdir,
            f"{summary.get('name', 'flagset')}_ab_{dataset}_n{num_labeled}.json")
    with open(artifact_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary → {artifact_path}\nverdict: {verdict} "
          f"({b_name} {100 * b_mean:.2f}% vs {a_name} {100 * a_mean:.2f}%, "
          f"perm p={perm_p:.3f})")
    return 0


def _parse_env(items: list[str], flag: str) -> dict[str, str]:
    out = {}
    for kv in items:
        k, sep, v = kv.partition("=")
        if not sep or not k:
            raise SystemExit(f"{flag} wants K=V, got {kv!r}")
        out[k] = v
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--name", default="flagset",
                    help="experiment name: prefixes run dirs + the artifact")
    ap.add_argument("--a-set", action="append", default=[], metavar="K=V",
                    help="config override applied to arm A (control) only")
    ap.add_argument("--b-set", action="append", default=[], metavar="K=V",
                    help="config override applied to arm B (variant) only")
    ap.add_argument("--a-env", action="append", default=[], metavar="K=V",
                    help="env var for arm A's train+eval subprocesses")
    ap.add_argument("--b-env", action="append", default=[], metavar="K=V",
                    help="env var for arm B's train+eval subprocesses")
    ap.add_argument("--seeds", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--dataset", default="digits")
    ap.add_argument("--config", default="mnist100")
    ap.add_argument("--num-labeled", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--warmup-epochs", type=int, default=100)
    ap.add_argument("--eval-every-epochs", type=int, default=0,
                    help="0 = final eval only (the compared number)")
    ap.add_argument("--ckpt-every-epochs", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--override", action="append", default=[], metavar="K=V",
                    help="extra --set k=v applied to BOTH arms' train+eval "
                         "(e.g. scan_steps=12 to amortize tunnel dispatch)")
    ap.add_argument("--resume", action="store_true",
                    help="skip an arm's train leg when its log already shows "
                         "a completed run ('done: step=' line) and reuse "
                         "cached eval scores — for restarting a campaign the "
                         "flaky tunnel killed mid-way")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the stage commands without running anything")
    args = ap.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s]
    if len(set(seeds)) != len(seeds):
        ap.error(f"duplicate seeds in --seeds {args.seeds!r}")
    if args.num_labeled % 10 != 0 or args.num_labeled <= 0:
        ap.error(f"--num-labeled must be a positive multiple of 10, got "
                 f"{args.num_labeled}")
    if not (args.a_set or args.b_set or args.a_env or args.b_env):
        ap.error("the arms are identical — declare at least one "
                 "--a-set/--b-set/--a-env/--b-env difference")
    if args.platform:
        os.environ["TRIPLEGAN_PLATFORM"] = args.platform

    arms = {
        "a": {"sets": args.a_set, "env": _parse_env(args.a_env, "--a-env")},
        "b": {"sets": args.b_set, "env": _parse_env(args.b_env, "--b-env")},
    }
    return run_ab(
        workdir=args.workdir,
        data_dir=args.data_dir,
        config=args.config,
        dataset=args.dataset,
        num_labeled=args.num_labeled,
        seeds=seeds,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        eval_every_epochs=args.eval_every_epochs,
        ckpt_every_epochs=args.ckpt_every_epochs,
        arms=arms,
        overrides=args.override,
        run_prefix=f"ab_{args.name}",
        artifact_path=os.path.join(
            args.workdir,
            f"{args.name}_ab_{args.dataset}_n{args.num_labeled}.json"),
        summary_extra={"name": args.name},
        resume=args.resume,
        dry_run=args.dry_run,
    )


if __name__ == "__main__":
    raise SystemExit(main())
