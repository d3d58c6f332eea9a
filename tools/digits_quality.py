"""Generative-quality measurement on the REAL digits runs (PARITY.md §8b).

The digits campaign (tools/digits_experiment.py) measured the
*classification* side of the three-player objective on real images; this
tool measures the *generative* side of the same trained runs — the first
sample-quality numbers on real data this environment can produce:

  - **FID** between each run's class-conditional samples and the real
    digits test set, in ONE fixed feature space (the anchor run's trained
    classifier GAP features) so the numbers are comparable across seeds —
    unlike ``cli fid``, which scores each run in its own feature space.
  - **IS** (classifier-scored) of the same samples, plus the real test
    set's own IS as the attainable reference.
  - **Conditional fidelity** under the anchor classifier: acc(C(G(z,y))==y)
    — a cross-judge version of the e2e fidelity metric (the judging C never
    saw the judged G during training).
  - **Memorization check**: mean pixel-space nearest-neighbor distance of
    generated samples to the 1,297-image train pool, against the test
    set's own NN-to-train distances. A GAN that memorizes its tiny pool
    shows gen≪test; gen≈test means samples sit at novel-image distance.

Interpretation anchors come with the artifact: FID(train pool → test) is
the real-vs-real floor, FID(uniform noise → test) the garbage ceiling.

    python tools/digits_quality.py --data-dir /tmp/digits_data \
        --workdir /tmp/digits_runs_recipe --runs digits_s1,...,digits_s10 \
        [--anchor digits_s1] [--n-samples 500] [--platform cpu|tpu] \
        [--out .../digits_quality.json]

Reference lineage: the reference's eval surface ([ref-expected] Testing/)
reports IS on conditional CIFAR only; FID/fidelity/NN are beyond-parity
extras reusing eval/fid.py + eval/inception.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def nn_distances(a, b, chunk: int = 128):
    """Per-row Euclidean distance from each flattened image in ``a`` to its
    nearest neighbor in ``b`` (float64, chunked so the full |a|×|b| matrix
    never materializes at scale)."""
    import numpy as np

    a = np.asarray(a, np.float64).reshape(len(a), -1)
    b = np.asarray(b, np.float64).reshape(len(b), -1)
    b_sq = (b * b).sum(axis=1)
    out = np.empty(len(a), np.float64)
    for i in range(0, len(a), chunk):
        ai = a[i : i + chunk]
        d2 = (ai * ai).sum(axis=1)[:, None] - 2.0 * ai @ b.T + b_sq[None, :]
        out[i : i + chunk] = np.sqrt(np.clip(d2.min(axis=1), 0.0, None))
    return out


def _load_run(cfg_name, run_dir, data_dir, workdir):
    """Rebuild a run's exact config/template and restore its checkpoint."""
    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs import get_config
    from triplegan_tpu.configs.base import apply_runtime, make_networks, merge_saved
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = get_config(cfg_name)
    saved = os.path.join(run_dir, "config.json")
    if not os.path.exists(saved):
        raise SystemExit(f"no config.json under {run_dir} — not a run dir?")
    merge_saved(cfg, saved)
    cfg.data_dir = data_dir
    cfg.workdir = workdir
    cfg.name = os.path.basename(run_dir)
    apply_runtime(cfg)
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    restored = CheckpointManager(os.path.join(run_dir, "ckpt"), write=False).restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {run_dir}/ckpt")
    return cfg, nets, restored


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True,
                    help="directory containing the run dirs")
    ap.add_argument("--runs", required=True,
                    help="comma-separated run names under --workdir")
    ap.add_argument("--config", default="mnist100",
                    help="base config the runs were trained from")
    ap.add_argument("--anchor", default=None,
                    help="run whose trained classifier defines the shared "
                         "feature/scoring space (default: first of --runs)")
    ap.add_argument("--n-samples", type=int, default=500,
                    help="generated samples per run (default matches the "
                         "500-image digits test set)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="summary JSON path (default <workdir>/digits_quality.json)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = ap.parse_args(argv)

    runs = [r for r in args.runs.split(",") if r]
    if len(set(runs)) != len(runs):
        ap.error(f"duplicate run names in --runs {args.runs!r}")
    anchor = args.anchor or runs[0]
    if args.platform:
        os.environ["TRIPLEGAN_PLATFORM"] = args.platform
    platform = os.environ.get("TRIPLEGAN_PLATFORM")
    if platform:
        from triplegan_tpu.utils.platform import apply_platform

        apply_platform(platform)

    import jax
    import numpy as np

    from triplegan_tpu import cli as tcli
    from triplegan_tpu.eval.fid import activation_stats, frechet_distance
    from triplegan_tpu.eval.inception import inception_score
    from triplegan_tpu.train.loop import _resolve_data

    # --- anchor: the shared judge ------------------------------------------
    a_cfg, a_nets, a_restored = _load_run(
        args.config, os.path.join(args.workdir, anchor), args.data_dir, args.workdir)
    if a_cfg.zca:
        raise SystemExit("digits_quality assumes a non-zca recipe "
                         "(the digits runs use mnist100); got cfg.zca=True")
    _, _, clf = a_nets

    @jax.jit
    def judge(x):
        (logits, feats), _ = clf.apply(
            a_restored.params["clf"], a_restored.bn["clf"], x,
            train=False, return_features=True)
        return logits, feats

    def logits_fn(x):
        return judge(x)[0]

    def features_fn(x):
        return judge(x)[1]

    batch = max(int(a_cfg.batch_size), 1)
    data = _resolve_data(a_cfg)
    rescale = bool(a_cfg.get("rescale", True))

    def to_gen_space(u8):
        x = np.asarray(u8, np.float32)
        return x / 127.5 - 1.0 if rescale else x

    rng = np.random.RandomState(args.seed)
    x_test = to_gen_space(data.x_test)
    pool = to_gen_space(data.x_unlabel)
    n = args.n_samples
    pool_sample = pool[rng.choice(len(pool), min(n, len(pool)), replace=False)]
    noise = rng.uniform(-1.0, 1.0, size=(n,) + x_test.shape[1:]).astype(np.float32)

    # Real-side stats once; every FID below shares them.
    mu_t, cov_t = activation_stats(features_fn, x_test, batch)

    def fid_vs_test(images):
        mu, cov = activation_stats(features_fn, images, batch)
        return frechet_distance(mu, cov, mu_t, cov_t)

    # IS's split protocol assumes exchangeable sample order; the prepared
    # digits test set is written class-ordered (50 per class), which would
    # collapse each split's marginal onto one class and report IS≈1 — so
    # shuffle the real side before scoring. FID is order-invariant.
    x_test_shuf = x_test[rng.permutation(len(x_test))]
    refs = {
        "fid_floor_trainpool_vs_test": round(fid_vs_test(pool_sample), 3),
        "fid_ceiling_noise_vs_test": round(fid_vs_test(noise), 3),
        "is_real_test": [round(v, 3) for v in inception_score(
            logits_fn, x_test_shuf, batch_size=batch)],
        "is_noise": [round(v, 3) for v in inception_score(
            logits_fn, noise, batch_size=batch)],
        "nn_test_to_trainpool_mean": round(
            float(nn_distances(x_test, pool).mean()), 3),
    }
    print(f"references: {json.dumps(refs)}", flush=True)

    per_run = []
    for name in runs:
        cfg, nets, restored = _load_run(
            args.config, os.path.join(args.workdir, name), args.data_dir,
            args.workdir)
        gen = nets[0]
        samples, y = tcli._generate_samples(
            cfg, gen, restored, n, args.seed, return_labels=True)
        logits = np.concatenate([
            np.asarray(logits_fn(samples[i : i + batch]))
            for i in range(0, len(samples), batch)
        ])
        row = {
            "run": name,
            "fid_vs_test": round(fid_vs_test(samples), 3),
            "is_gen": [round(v, 3) for v in inception_score(
                logits_fn, samples, batch_size=batch)],
            "cond_fidelity_anchor": round(
                float((logits.argmax(-1) == y).mean()), 4),
            "nn_gen_to_trainpool_mean": round(
                float(nn_distances(samples, pool).mean()), 3),
        }
        if name == anchor:
            row["is_anchor_self_judged"] = True  # C judged its own G's samples
        per_run.append(row)
        print(json.dumps(row), flush=True)

    fids = [r["fid_vs_test"] for r in per_run]
    # The anchor's own row is self-judged (its C scores its G's samples);
    # the cross-judged aggregates exclude it when other runs exist.
    cross = [r for r in per_run if r["run"] != anchor] or per_run
    summary = {
        "dataset": "digits",
        "judge": f"{anchor} classifier (GAP features / logits)",
        "n_samples": n,
        "seed": args.seed,
        "references": refs,
        "runs": per_run,
        "fid_mean": round(float(np.mean(fids)), 3),
        "fid_min": round(float(np.min(fids)), 3),
        "fid_max": round(float(np.max(fids)), 3),
        "fidelity_mean": round(float(np.mean(
            [r["cond_fidelity_anchor"] for r in per_run])), 4),
        "nn_gen_mean": round(float(np.mean(
            [r["nn_gen_to_trainpool_mean"] for r in per_run])), 3),
        "cross_judged": {
            "n_runs": len(cross),
            "fid_mean": round(float(np.mean(
                [r["fid_vs_test"] for r in cross])), 3),
            "is_mean": round(float(np.mean(
                [r["is_gen"][0] for r in cross])), 3),
            "fidelity_mean": round(float(np.mean(
                [r["cond_fidelity_anchor"] for r in cross])), 4),
        },
    }
    out = args.out or os.path.join(args.workdir, "digits_quality.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}, indent=2))
    print(f"summary → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
