"""Base hyperparameter config (rebuild of the reference's ``config.py``).

Reference parity (SURVEY.md §2.1 #1): the reference uses a Python ``Config``
class of UPPERCASE attributes with per-dataset subclasses and a ``display()``
dump. Here: an ``ml_collections.ConfigDict`` built per dataset by
``triplegan_tpu.configs.get_config(name)``; ``display(cfg)`` pretty-prints.

Default constants follow SURVEY.md Appendix A's training schedule: Adam
(β1 = 0.5), lr 3e-4 for all players, batch 100 per stream, α = 1/2, linear lr
decay over the final epochs, pseudo-discriminative term α_P ramped in after a
warm-up.
"""

from __future__ import annotations

import json
import os

import ml_collections


def base_config() -> ml_collections.ConfigDict:
    cfg = ml_collections.ConfigDict()

    # --- experiment identity / paths -------------------------------------
    cfg.name = "base"
    cfg.seed = 0
    cfg.data_dir = "/tmp/triplegan_data"      # directory of prepared .npz shards
    cfg.workdir = "/tmp/triplegan_runs"       # checkpoints + metrics

    # --- dataset ----------------------------------------------------------
    cfg.dataset = "cifar10"
    cfg.image_size = 32
    cfg.channels = 3
    cfg.num_classes = 10
    cfg.num_labeled = 4000                    # size of the labeled subset
    cfg.zca = True                            # ZCA-whiten inputs to C and D
    cfg.rescale = True                        # map pixels to [-1, 1]
    cfg.aug_translate = 2                     # random translate-crop radius (px)
    cfg.aug_flip = True                       # random horizontal flip
    cfg.aug_order = "zca_first"               # reference pipeline order: parse →
                                              # normalize (ZCA) → augment
                                              # (SURVEY.md §2.1 #3);
                                              # "augment_first" = augment in raw
                                              # pixel space, then whiten
    cfg.aug_pad_mode = "reflect"              # translate-crop padding: "reflect"
                                              # or "zeros" (the reference
                                              # lineage typically zero-pads
                                              # before the random crop —
                                              # unverifiable, mount empty; see
                                              # DESIGN.md deviations #9)

    # --- networks (SURVEY.md Appendix B) ----------------------------------
    cfg.z_dim = 100
    cfg.bn_momentum = 0.99
    cfg.gen = ml_collections.ConfigDict()
    cfg.gen.widths = (512, 256, 128)
    cfg.gen.kernel = 5

    cfg.disc = ml_collections.ConfigDict()
    cfg.disc.widths = (32, 32, 64, 64, 128, 128)
    cfg.disc.strides = (1, 2, 1, 2, 1, 2)
    cfg.disc.input_noise = 0.05
    cfg.disc.input_dropout = 0.2
    cfg.disc.block_dropout = 0.2
    cfg.disc.label_reconcat = True            # re-concat label planes at the
                                              # intermediate feature maps after
                                              # each stride-2 block (SURVEY.md
                                              # Appendix B); False = input +
                                              # GAP-head concat only

    cfg.clf = ml_collections.ConfigDict()
    cfg.clf.conv_blocks = ((128, 128, 128), (256, 256, 256))
    cfg.clf.tail = (512, 256, 128)
    cfg.clf.input_noise = 0.15
    cfg.clf.block_dropout = 0.5

    # --- three-player objective (SURVEY.md Appendix A) --------------------
    cfg.alpha = 0.5                           # C-fake weight in the minimax
    cfg.alpha_p = 0.1                         # pseudo-discriminative weight α_P
    cfg.alpha_p_warmup_epochs = 200           # R_P off until this epoch
    cfg.alpha_p_ramp_epochs = 0               # linear 0→α_P ramp length after
                                              # warm-up (SURVEY.md Appendix A
                                              # "ramped"); 0 = hard step gate
    cfg.non_saturating_g = True               # -log D(G) heuristic for L_G
    cfg.pseudo_label_mode = "sample"          # y_c ~ p_c(y|x_u); "argmax" for
                                              # deterministic pseudo-labels
    cfg.ddinit = False                        # data-dependent weight-norm init
                                              # (Salimans-Kingma) on first batch
    cfg.share_pseudo_forward = False          # share ONE classifier forward
                                              # between D's pseudo-labeling and
                                              # C's unlabeled stream (same
                                              # batch) — cuts 1 of 10 clf
                                              # forward-equivalents per step;
                                              # deviation from the reference's
                                              # independent batches (DESIGN.md
                                              # deviations #11)

    # --- optimization ------------------------------------------------------
    cfg.batch_size = 100                      # per stream (labeled/unlabeled/gen)
    cfg.epochs = 1000
    cfg.steps_per_epoch = 0                   # 0 → derived from dataset size
    cfg.lr_g = 3e-4
    cfg.lr_d = 3e-4
    cfg.lr_c = 3e-4
    cfg.adam_b1 = 0.5
    cfg.adam_b2 = 0.999
    cfg.adam_eps = 1e-8
    cfg.lr_decay_start_frac = 0.5             # linear decay over final half
    cfg.lr_c_anneal_factor = 1.0              # multiplicative anneal on C's lr
    cfg.lr_c_anneal_epochs = 0                # ... applied every N epochs
                                              # (SURVEY.md Appendix A: "C's
                                              # optimizer possibly larger lr
                                              # with annealing"); 0/1.0 = off

    # --- execution ---------------------------------------------------------
    cfg.compute_dtype = "float32"             # "bfloat16" for throughput runs
    cfg.prng_impl = "threefry"                # "rbg" = faster TPU hardware RNG
                                              # for dropout/noise masks (+8%
                                              # step throughput); threefry =
                                              # fully reproducible default
    cfg.use_pallas = False                    # fused Pallas epilogues
    cfg.fused_clf_forward = False             # one 3B-row classifier pass
                                              # (virtual-batch BN) vs the
                                              # reference's 3 separate passes
    cfg.data_on_device = True                 # HBM-resident dataset, batches
                                              # sampled inside the step (zero
                                              # per-step H2D); False = host
                                              # epoch-shuffled streaming
    cfg.mesh_shape = (1,)                     # data-parallel mesh over ICI;
                                              # under multihost this counts
                                              # pod-GLOBAL chips
    cfg.multihost = False                     # pod-scale run (one process per
                                              # host): jax.distributed init,
                                              # coordinator-only host outputs,
                                              # stage_global data staging
    cfg.multihost_coordinator = ""            # "" = TPU pod auto-detection
    cfg.multihost_num_processes = 0           # 0 = auto
    cfg.multihost_process_id = -1             # -1 = auto
    cfg.scan_steps = 1                        # >1: lax.scan this many steps
                                              # into one XLA program (needs
                                              # data_on_device; log/eval
                                              # cadence rounds to the chunk)
    cfg.scan_metrics = "last"                 # what a log interval reports
                                              # from a scan chunk: "last"
                                              # step's metrics (chunk-
                                              # subsampled curves) or the
                                              # in-chunk "mean" (keeps per-
                                              # iteration loss information)
    cfg.log_every = 100
    cfg.eval_every_epochs = 1                 # 0 disables periodic eval
    cfg.ckpt_every_epochs = 10                # 0 disables periodic ckpts
    cfg.ckpt_keep = 3
    cfg.profile_dir = ""                      # non-empty: capture a jax.profiler
                                              # trace of `profile_steps` hot-loop
                                              # steps (after a short warmup) to
                                              # this dir; view with TensorBoard's
                                              # profile plugin (reference's
                                              # nvprof/timeline equivalent)
    cfg.profile_steps = 10

    return cfg


def save_config(cfg: ml_collections.ConfigDict, path: str) -> None:
    """Persist the resolved config as JSON. The train driver writes
    ``workdir/<name>/config.json`` so that eval/sample/inception can rebuild
    the exact checkpoint template (RNG impl, network widths, …) without the
    user repeating every ``--set`` override — the reference's ``Config``
    object travels implicitly between its Training/ and Testing/ scripts."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=list, sort_keys=True)


# Execution-environment fields: where the run lives and how this host
# executes it — NOT part of the model/data semantics a checkpoint encodes.
# Excluded from merge_saved so a run dir trained with e.g. mesh_shape=(8,)
# or use_pallas=True stays evaluable on different hardware, and paths always
# come from the current invocation.
EXEC_KEYS = frozenset({
    "workdir", "data_dir", "mesh_shape", "use_pallas", "scan_steps",
    "scan_metrics",
    "data_on_device", "log_every", "eval_every_epochs", "ckpt_every_epochs",
    "ckpt_keep", "profile_dir", "profile_steps",
    "multihost", "multihost_coordinator", "multihost_num_processes",
    "multihost_process_id",
})


def merge_saved(cfg: ml_collections.ConfigDict, path: str) -> ml_collections.ConfigDict:
    """Overlay a ``save_config`` JSON onto ``cfg`` in place, skipping
    execution-environment keys (``EXEC_KEYS``). Tuple-typed fields are
    re-coerced from JSON lists; keys the current code no longer knows, and
    saved values whose type no longer fits the current field, are skipped
    (forward compatibility with old run dirs)."""
    import warnings

    with open(path) as f:
        saved = json.load(f)

    def _merge(node, d, top, prefix=""):
        for k, v in d.items():
            if k not in node or (top and k in EXEC_KEYS):
                continue
            cur = node[k]
            try:
                if isinstance(cur, ml_collections.ConfigDict) and isinstance(v, dict):
                    _merge(cur, v, False, prefix + k + ".")
                elif isinstance(cur, tuple):
                    node[k] = tuple(
                        tuple(x) if isinstance(x, list) else x for x in v
                    )
                else:
                    node[k] = v
            except (TypeError, ValueError):
                # Type drift across versions: keep the current default, but
                # say so — a silently-dropped key can make eval build a
                # template that mismatches the checkpoint, surfacing only as
                # an opaque orbax restore error (advisor r2 finding).
                warnings.warn(
                    f"config.json key '{prefix}{k}'={v!r} does not fit the "
                    f"current field (default {cur!r} kept); if restore fails, "
                    f"this divergence is the likely cause",
                    stacklevel=2,
                )
                continue

    _merge(cfg, saved, True)
    return cfg


def apply_runtime(cfg: ml_collections.ConfigDict) -> ml_collections.ConfigDict:
    """Apply config fields that must be set before any key/state is built.
    A checkpoint written under ``prng_impl="rbg"`` stores a (4,)-word key
    and cannot restore into a threefry (2,)-word template, so the impl must
    be in force before ``create_state`` — and set unconditionally, so one
    in-process invocation can't leak its impl into the next."""
    import jax

    impl = cfg.get("prng_impl", "threefry")
    jax.config.update(
        "jax_default_prng_impl", {"threefry": "threefry2x32"}.get(impl, impl)
    )
    return cfg


def display(cfg: ml_collections.ConfigDict) -> str:
    """Reference's ``Config.display()`` equivalent — a readable dump."""
    lines = ["Configuration:"]
    for k in sorted(cfg.keys()):
        v = cfg[k]
        if isinstance(v, ml_collections.ConfigDict):
            for kk in sorted(v.keys()):
                lines.append(f"  {k}.{kk:<24} {v[kk]}")
        else:
            lines.append(f"  {k:<26} {v}")
    return "\n".join(lines)


def make_networks(cfg: ml_collections.ConfigDict):
    """Build the (Generator, Discriminator, Classifier) specs from a config."""
    from triplegan_tpu.nn.networks import Classifier, Discriminator, Generator

    gen = Generator(
        image_size=cfg.image_size,
        channels=cfg.channels,
        num_classes=cfg.num_classes,
        z_dim=cfg.z_dim,
        widths=tuple(cfg.gen.widths),
        kernel=cfg.gen.kernel,
        bn_momentum=cfg.bn_momentum,
        use_pallas=cfg.use_pallas,
    )
    disc = Discriminator(
        image_size=cfg.image_size,
        channels=cfg.channels,
        num_classes=cfg.num_classes,
        widths=tuple(cfg.disc.widths),
        strides=tuple(cfg.disc.strides),
        input_noise=cfg.disc.input_noise,
        input_dropout=cfg.disc.input_dropout,
        block_dropout=cfg.disc.block_dropout,
        label_reconcat=bool(cfg.disc.get("label_reconcat", True)),
        use_pallas=cfg.use_pallas,
    )
    clf = Classifier(
        image_size=cfg.image_size,
        channels=cfg.channels,
        num_classes=cfg.num_classes,
        conv_blocks=tuple(tuple(b) for b in cfg.clf.conv_blocks),
        tail=tuple(cfg.clf.tail),
        input_noise=cfg.clf.input_noise,
        block_dropout=cfg.clf.block_dropout,
        bn_momentum=cfg.bn_momentum,
        use_pallas=cfg.use_pallas,
    )
    return gen, disc, clf
