"""Real-data semi-supervised validation on sklearn's bundled digits set.

The rebuild's parity metric (CIFAR-10 4k) is environment-blocked: no
datasets, no network. The ONE real image dataset reachable offline is
scikit-learn's bundled UCI optdigits sample — 1,797 genuine handwritten
8×8 digits. This tool runs the first REAL-data validation of the
semi-supervised machinery end to end:

    python tools/digits_experiment.py --data-dir /tmp/digits_data \
        --workdir /tmp/digits_runs [--seeds 1,2,3] [--epochs 300] \
        [--num-labeled 100] [--baseline-steps 3000] [--platform tpu] \
        [--dry-run]

Per seed it runs TWO arms on the SAME class-balanced ``--num-labeled``
subset (``semi_split`` is seed-deterministic, so both arms see identical
labels):

  A. **supervised baseline** — the framework's own Classifier network (the
     ``mnist100`` architecture, identical input rescale, identical
     noise/dropout regularization) trained in-process with Adam on ONLY
     the labeled images;
  B. **Triple-GAN semi-supervised** — the real CLI ``train``/``eval``
     commands (subprocesses, exactly like tools/parity_campaign.py), which
     additionally exploit the 1,297-image unlabeled pool through the
     three-player objective.

It writes ``<workdir>/digits_summary_n<labels>.json`` with per-seed test
errors for both arms, their means, a paired sign test, and the verdict:
PASS when the semi-supervised mean error beats the supervised mean (the
machinery demonstrably extracts signal from real unlabeled images), exit
0; FAIL exits 2. Sweeping ``--num-labeled`` (e.g. 50/100/200) probes the
semi-supervised signature — the gain should grow as labels shrink.

Reference lineage: the reference has no equivalent ([ref-expected] covers
MNIST/SVHN/CIFAR only); this experiment exists because the parity number
itself cannot be measured in this environment (docs/PARITY.md §8).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shlex
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ERROR_RE = re.compile(r"test error: ([0-9.]+)%")


def cli_cmd(args: list[str]) -> list[str]:
    return [sys.executable, "-m", "triplegan_tpu.cli", *args]


def run_cli(args: list[str], log_path: str | None = None,
            extra_env: dict[str, str] | None = None) -> str:
    """One CLI stage as a subprocess (one device process at a time); output
    streams to ``log_path`` for long train legs, else is captured.
    ``extra_env`` overlays the inherited environment — used by
    tools/flagset_ab.py for per-arm env knobs (e.g.
    ``TRIPLEGAN_DROPOUT_BITS=8``) that have no config-key surface."""
    cmd = cli_cmd(args)
    print("+ " + shlex.join(cmd)
          + (f"  [env {' '.join(f'{k}={v}' for k, v in extra_env.items())}]"
             if extra_env else ""), flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    if log_path:
        with open(log_path, "a") as log:
            proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)
        if proc.returncode != 0:
            print(f"stage failed (rc={proc.returncode}) — see {log_path}",
                  file=sys.stderr, flush=True)
            raise subprocess.CalledProcessError(proc.returncode, cmd)
        return ""
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        raise subprocess.CalledProcessError(proc.returncode, cmd, output=proc.stdout)
    return proc.stdout


def paired_permutation_p(a: list[float], b: list[float]) -> float:
    """Exact two-sided paired permutation test on the mean difference.

    Under H0 (no arm effect) each seed's (a_i, b_i) pair is exchangeable,
    so every sign assignment of the differences is equally likely; the
    p-value is the fraction of the 2^n assignments whose |mean| reaches the
    observed one. Unlike the sign test this uses the magnitudes. Exact
    enumeration — fine for the seed counts this tool runs (2^20 ≈ 1M)."""
    diffs = [x - y for x, y in zip(a, b)]
    n = len(diffs)
    if n == 0 or all(d == 0 for d in diffs):
        return 1.0
    observed = abs(sum(diffs))
    hits = 0
    for mask in range(1 << n):
        s = sum(d if (mask >> i) & 1 else -d for i, d in enumerate(diffs))
        if abs(s) >= observed - 1e-12:
            hits += 1
    return hits / float(1 << n)


def supervised_baseline(
    data_dir: str, seed: int, steps: int, num_labeled: int = 100,
    lr: float = 3e-4, log_every: int = 500,
) -> float:
    """Arm A: the framework's Classifier trained on ONLY the labeled subset.

    Identical network, init scheme, input transform ([-1,1] rescale — the
    mnist100 recipe has no ZCA/augmentation) and train-mode stochasticity
    (input noise σ=0.15, block dropout) as the semi-supervised classifier;
    the only difference is the objective: plain cross-entropy on the
    labeled subset, full-batch (the whole labeled set is one batch).
    Returns the final test error in [0, 1], evaluated with running BN
    stats like ``make_eval_step``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from triplegan_tpu.configs import get_config
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.data.datasets import load_dataset

    cfg = get_config("mnist100")
    cfg.dataset = "digits"
    cfg.seed = seed
    cfg.data_dir = data_dir
    cfg.num_labeled = num_labeled
    apply_runtime(cfg)
    data = load_dataset(data_dir, "digits", cfg.num_labeled, cfg.num_classes, seed)
    _, _, clf = make_networks(cfg)

    key = jax.random.PRNGKey(seed)
    kinit, krun = jax.random.split(key)
    params, bn = clf.init(kinit)
    opt = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    opt_state = opt.init(params)

    x = jnp.asarray(data.x_label.astype(np.float32) / 127.5 - 1.0)
    y = jnp.asarray(data.y_label)

    @jax.jit
    def train_step(params, bn, opt_state, rng):
        rng, sub = jax.random.split(rng)

        def loss_fn(p):
            logits, new_bn = clf.apply(p, bn, x, train=True, rng=sub)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, new_opt, rng, loss

    for i in range(steps):
        params, bn, opt_state, krun, loss = train_step(params, bn, opt_state, krun)
        if log_every and (i + 1) % log_every == 0:
            print(f"  baseline seed={seed} step {i + 1}/{steps} "
                  f"loss={float(loss):.4f}", flush=True)

    @jax.jit
    def eval_logits(params, bn, xt):
        logits, _ = clf.apply(params, bn, xt, train=False)
        return logits

    xt = jnp.asarray(data.x_test.astype(np.float32) / 127.5 - 1.0)
    pred = np.argmax(np.asarray(eval_logits(params, bn, xt)), axis=-1)
    return float((pred != data.y_test).mean())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", default="1,2,3")
    # Schedule defaults are the mnist100 recipe VERBATIM (epochs=300,
    # alpha_p_warmup_epochs=100, configs/__init__.py) — chosen a priori, not
    # tuned on digits. The first on-chip campaign (DESIGN.md "real-data
    # validation") showed 1000 epochs overtrains the 1,297-image pool badly:
    # 3.8% at epoch 100 degrading to 15.4% by epoch 1000.
    ap.add_argument("--epochs", type=int, default=300,
                    help="Triple-GAN epochs (12 steps each at batch 100)")
    ap.add_argument("--warmup-epochs", type=int, default=100,
                    help="alpha_p warm-up for the semi-supervised arm")
    ap.add_argument("--baseline-steps", type=int, default=3000)
    ap.add_argument("--num-labeled", type=int, default=100,
                    help="label budget for BOTH arms (must be a multiple of "
                         "10 for a class-balanced split)")
    ap.add_argument("--eval-every-epochs", type=int, default=100)
    ap.add_argument("--ckpt-every-epochs", type=int, default=200)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--dry-run", action="store_true",
                    help="print the stage commands without running anything")
    args = ap.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s]
    if args.num_labeled % 10 != 0 or args.num_labeled <= 0:
        ap.error(f"--num-labeled must be a positive multiple of 10, got "
                 f"{args.num_labeled}")
    if len(set(seeds)) != len(seeds):
        ap.error(f"duplicate seeds in --seeds {args.seeds!r}")
    if args.platform:
        # Resolved once here; CLI children inherit it via the env, and the
        # in-process baseline applies it before first jax use below.
        os.environ["TRIPLEGAN_PLATFORM"] = args.platform
    platform = os.environ.get("TRIPLEGAN_PLATFORM")

    def stage_cmds(seed: int) -> dict[str, list[str]]:
        common = ["--workdir", args.workdir, "--data-dir", args.data_dir]
        overrides = [
            "--set", "dataset=digits",
            "--set", f"name=digits_n{args.num_labeled}_s{seed}",
            "--set", f"seed={seed}",
            "--set", f"num_labeled={args.num_labeled}",
        ]
        return {
            "prepare": ["prepare", "--dataset", "digits",
                        "--data-dir", args.data_dir],
            "train": ["train", "--config", "mnist100", *common, *overrides,
                      "--set", f"epochs={args.epochs}",
                      "--set", f"alpha_p_warmup_epochs={args.warmup_epochs}",
                      "--set", f"eval_every_epochs={args.eval_every_epochs}",
                      "--set", f"ckpt_every_epochs={args.ckpt_every_epochs}"],
            "eval": ["eval", "--config", "mnist100", *common, *overrides],
        }

    if args.dry_run:
        print(f"+ {shlex.join(cli_cmd(stage_cmds(seeds[0])['prepare']))}")
        for seed in seeds:
            cmds = stage_cmds(seed)
            print(f"# seed {seed}: supervised baseline "
                  f"({args.baseline_steps} steps, in-process)")
            for leg in ("train", "eval"):
                print(f"+ {shlex.join(cli_cmd(cmds[leg]))}")
        return 0

    os.makedirs(args.workdir, exist_ok=True)
    run_cli(stage_cmds(seeds[0])["prepare"])

    if platform:
        from triplegan_tpu.utils.platform import apply_platform

        apply_platform(platform)

    baseline_errors, triplegan_errors = [], []
    for seed in seeds:
        cmds = stage_cmds(seed)
        print(f"=== seed {seed}: supervised baseline ===", flush=True)
        be = supervised_baseline(
            args.data_dir, seed, args.baseline_steps, args.num_labeled)
        print(f"  baseline seed={seed} test error: {100 * be:.2f}%", flush=True)
        baseline_errors.append(be)

        print(f"=== seed {seed}: Triple-GAN semi-supervised ===", flush=True)
        log = os.path.join(
            args.workdir, f"digits_n{args.num_labeled}_s{seed}_train.log")
        run_cli(cmds["train"], log_path=log)
        out = run_cli(cmds["eval"])
        m = ERROR_RE.search(out)
        if not m:
            print(f"could not parse test error from eval output for seed "
                  f"{seed}", file=sys.stderr)
            return 1
        triplegan_errors.append(float(m.group(1)) / 100.0)

    b_mean = sum(baseline_errors) / len(baseline_errors)
    t_mean = sum(triplegan_errors) / len(triplegan_errors)
    gain = b_mean - t_mean
    verdict = "PASS" if gain > 0 else "FAIL"
    # Paired per-seed statistics: both arms share the seed's labeled subset,
    # so each seed is one paired trial. Two-sided sign test on wins (ties
    # dropped, the exact binomial) — with few seeds this is conservative.
    import math

    wins = sum(1 for b, t in zip(baseline_errors, triplegan_errors) if t < b)
    losses = sum(1 for b, t in zip(baseline_errors, triplegan_errors) if t > b)
    n_pairs = wins + losses
    if n_pairs:
        k = max(wins, losses)
        tail = sum(math.comb(n_pairs, i) for i in range(k, n_pairs + 1))
        sign_p = min(1.0, 2.0 * tail / 2.0**n_pairs)
    else:
        sign_p = 1.0
    perm_p = paired_permutation_p(baseline_errors, triplegan_errors)
    summary = {
        "dataset": "digits",
        "num_labeled": args.num_labeled,
        "seeds": seeds,
        "baseline_errors_pct": [round(100 * e, 2) for e in baseline_errors],
        "triplegan_errors_pct": [round(100 * e, 2) for e in triplegan_errors],
        "baseline_mean_pct": round(100 * b_mean, 2),
        "triplegan_mean_pct": round(100 * t_mean, 2),
        "gain_pct": round(100 * gain, 2),
        "seed_wins": f"{wins}/{len(seeds)}",
        "sign_test_p": round(sign_p, 4),
        "perm_test_p": round(perm_p, 4),
        "epochs": args.epochs,
        "baseline_steps": args.baseline_steps,
        "verdict": verdict,
    }
    path = os.path.join(
        args.workdir, f"digits_summary_n{args.num_labeled}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary → {path}\nverdict: {verdict} "
          f"(semi-supervised {100 * t_mean:.2f}% vs supervised-only "
          f"{100 * b_mean:.2f}% on the same {args.num_labeled} real labels)")
    return 0 if verdict == "PASS" else 2


if __name__ == "__main__":
    raise SystemExit(main())
