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

Since round 5 this is a thin front-end over the generalized arbitrary
flag-set campaign in tools/flagset_ab.py (same loop, statistics, resume
and artifact machinery — VERDICT r4 next-step #1); it keeps this lever's
historical CLI, run names (``ab_<dataset>_n<n>_s<seed>_<arm>``) and
artifact path (``<workdir>/sharefwd_ab_<dataset>_n<labels>.json``). The
summary carries per-seed final test errors for both arms, their means,
the paired sign + exact permutation tests, and a verdict: ``WITHIN_NOISE``
when the permutation p ≥ 0.05 (no measurable quality effect — the lever
is safe to adopt for throughput configs) else ``SIGNIFICANT_ON_WORSE`` /
``SIGNIFICANT_OFF_WORSE``. Exit 0 either way (the verdict is data, not a
failure); non-zero only on infrastructure errors.

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
    ``final_metrics_off/on`` in the artifact and PARITY.md §9). Since
    round 5, ``--dataset shapes`` (the learnable structured set) carries
    real error signal at the flagship architecture too.

Reference lineage: the reference has no such lever ([ref-expected]
Training/train_triple_gan.py runs three independent sess.run input pulls);
this tool exists to qualify a rebuild-only optimization before it can
carry the headline bench number.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

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
# Re-exported surface (tests + sibling tools import these from here).
run_cli = _fab.run_cli
cli_cmd = _fab.cli_cmd
ERROR_RE = _fab.ERROR_RE
paired_permutation_p = _fab.paired_permutation_p
METRICS_RE = _fab.METRICS_RE
train_completed = _fab.train_completed
parse_final_metrics = _fab.parse_final_metrics


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--dataset", default="digits",
                    choices=("digits", "synthetic", "shapes"))
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

    return _fab.run_ab(
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
        arms={
            "off": {"sets": ["share_pseudo_forward=false"]},
            "on": {"sets": ["share_pseudo_forward=true"]},
        },
        overrides=args.override,
        run_prefix="ab",  # historical run names: ab_<ds>_n<n>_s<seed>_<arm>
        artifact_path=os.path.join(
            args.workdir,
            f"sharefwd_ab_{args.dataset}_n{args.num_labeled}.json"),
        summary_extra={"lever": "share_pseudo_forward"},
        resume=args.resume,
        dry_run=args.dry_run,
        # Route subprocess calls through THIS module's run_cli so tests can
        # monkeypatch sharefwd_ab.run_cli as they always have.
        runner=lambda a, log_path=None, extra_env=None: run_cli(
            a, log_path=log_path, extra_env=extra_env),
    )


if __name__ == "__main__":
    raise SystemExit(main())
