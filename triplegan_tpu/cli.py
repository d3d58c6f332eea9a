"""Command-line entry points (rebuild of the reference's top-level run
scripts, SURVEY.md §2.1 #1/#10/#11):

    python -m triplegan_tpu.cli train   --config cifar10_4k [--workdir ...]
    python -m triplegan_tpu.cli eval    --config cifar10_4k --workdir ...
    python -m triplegan_tpu.cli sample  --config cifar10_4k --workdir ... --out grid.png
    python -m triplegan_tpu.cli fid     --config cifar10_4k --workdir ...
    python -m triplegan_tpu.cli export  --config cifar10_4k --workdir ...
    python -m triplegan_tpu.cli serve   --config cifar10_4k --workdir ... --port 8000
    python -m triplegan_tpu.cli prepare --dataset cifar10 --raw-dir ... --data-dir ...
    python -m triplegan_tpu.cli predict --config cifar10_4k --workdir ... --input imgs.npy
    python -m triplegan_tpu.cli doctor  --config cifar10_4k --workdir ...

Overrides: ``--set key=value`` (repeatable) mutates any config field, e.g.
``--set batch_size=256 --set compute_dtype=bfloat16``.
"""

from __future__ import annotations

import argparse
import ast
import os
import sys


def _apply_overrides(cfg, overrides):
    for kv in overrides or []:
        key, _, raw = kv.partition("=")
        try:
            val = ast.literal_eval(raw)
        except (SyntaxError, ValueError):
            # bare lowercase booleans are a universal CLI convention;
            # everything else non-literal stays a string
            val = {"true": True, "false": False}.get(raw.lower(), raw)
        node = cfg
        *parents, leaf = key.split(".")
        for p in parents:
            if p not in node:
                sys.exit(f"unknown config key '{key}' (no section '{p}')")
            node = node[p]
        if leaf not in node:
            sys.exit(
                f"unknown config key '{key}'; valid keys in this section: "
                f"{sorted(node.keys())}"
            )
        node[leaf] = val
    return cfg


def _resolve_paths(cfg, args):
    if getattr(args, "workdir", None):
        cfg.workdir = args.workdir
    if getattr(args, "data_dir", None):
        cfg.data_dir = args.data_dir
    return cfg


def _load_cfg(args):
    """Resolve the effective config for this run directory. The
    ``config.json`` the train driver persisted there (if any) is merged
    first — excluding execution-environment keys — so the checkpoint's
    template (prng impl, network widths, dtype, …) is rebuilt exactly
    without the user repeating every ``--set``; explicit CLI paths and
    ``--set`` always win. The run dir is located with overrides already
    applied, so ``--set name=...`` / ``--set workdir=...`` runs merge
    their own saved config, not the base config's."""
    from triplegan_tpu.configs import get_config
    from triplegan_tpu.configs.base import merge_saved

    overrides = getattr(args, "set", None)
    probe = _apply_overrides(_resolve_paths(get_config(args.config), args), overrides)
    cfg = get_config(args.config)
    saved = os.path.join(probe.workdir, probe.name, "config.json")
    if os.path.exists(saved):
        merge_saved(cfg, saved)
    return _apply_overrides(_resolve_paths(cfg, args), overrides)


def cmd_train(args):
    from triplegan_tpu.train.loop import train

    result = train(_load_cfg(args), max_steps=args.max_steps)
    if result.get("preempted"):
        # SIGTERM mid-run: state is checkpointed but the run is unfinished —
        # exit 75 (EX_TEMPFAIL) so restart policies re-run the same command
        # (which resumes) instead of treating this as success or a crash.
        sys.exit(75)
    print(f"done: step={result['steps']} test_error={100 * result['test_error']:.2f}%")


def _restore_at(ckpt, state, args, workdir):
    """Restore the latest checkpoint, or the one named by ``--step``
    (the reference's ``Saver.restore(<specific ckpt>)``)."""
    try:
        restored = ckpt.restore(state, step=getattr(args, "step", None))
    except FileNotFoundError as e:  # explicit --step that doesn't exist
        sys.exit(f"{e} under {workdir}/ckpt")
    if restored is None:
        sys.exit(f"no checkpoint under {workdir}/ckpt")
    return restored


def cmd_eval(args):
    import jax
    import numpy as np

    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.eval.metrics import evaluate_error
    from triplegan_tpu.parallel import mesh as pmesh
    from triplegan_tpu.train.loop import _resolve_data, _resolve_zca, _test_stream
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import make_eval_step

    cfg = apply_runtime(_load_cfg(args))
    workdir = os.path.join(cfg.workdir, cfg.name)
    data = _resolve_data(cfg)
    if getattr(args, "artifact", None):
        # Artifact qualification: score the test set through an exported
        # classifier .stablehlo (input transform baked in — raw uint8 goes
        # straight in), so a deployment can verify the artifact reproduces
        # the checkpoint's test error before shipping it. No checkpoint or
        # ZCA refit involved — the artifact is self-contained.
        from triplegan_tpu.export import load_stablehlo_exported
        from triplegan_tpu.serve import batched_apply

        exp = load_stablehlo_exported(args.artifact)
        if len(exp.in_avals) != 1:
            sys.exit(
                f"{args.artifact} is not a classifier artifact (it takes "
                f"{len(exp.in_avals)} inputs; a classifier takes 1: uint8 images)"
            )
        (aval,) = exp.in_avals
        x, y = data.x_test, data.y_test
        if tuple(aval.shape[1:]) != tuple(x.shape[1:]):
            sys.exit(
                f"artifact expects images {tuple(aval.shape[1:])}, test set "
                f"has {tuple(x.shape[1:])}"
            )
        logits = batched_apply(exp.call, int(aval.shape[0]), x)
        err = float((np.argmax(logits, axis=-1) != y).mean())
        print(f"test error (artifact): {100 * err:.2f}%")
        return
    zca = _resolve_zca(cfg, data, workdir)
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
    restored = _restore_at(ckpt, state, args, workdir)
    # Honor cfg.mesh_shape like the train loop (make_mesh raises rather than
    # silently under-building on insufficient devices).
    n_dev = int(np.prod(cfg.mesh_shape))
    sharding = None
    if n_dev > 1:
        if cfg.batch_size % n_dev != 0:
            sys.exit(
                f"batch_size={cfg.batch_size} must divide evenly over the "
                f"{n_dev}-device data mesh"
            )
        mesh = pmesh.make_mesh(n_dev)
        eval_step = pmesh.shard_eval_step(
            make_eval_step(cfg, nets, zca, axis_name=pmesh.AXIS), mesh
        )
        sharding = pmesh.batch_sharding(mesh)
        restored = jax.device_put(
            restored, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
    else:
        eval_step = jax.jit(make_eval_step(cfg, nets, zca))
    sampler = BatchSampler(data, cfg.batch_size, seed=cfg.seed)
    err = evaluate_error(eval_step, restored, _test_stream(sampler, sharding))
    print(f"test error: {100 * err:.2f}%")


def cmd_sample(args):
    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.eval.sample import (
        class_grid_inputs,
        make_sample_fn,
        save_png,
        to_uint8_grid,
    )
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = apply_runtime(_load_cfg(args))
    workdir = os.path.join(cfg.workdir, cfg.name)
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
    restored = _restore_at(ckpt, state, args, workdir)
    z, labels = class_grid_inputs(cfg, n_per_class=args.n_per_class, seed=args.seed)
    sample_fn = make_sample_fn(cfg, nets)
    grid = to_uint8_grid(sample_fn(restored, z, labels), cfg.num_classes, args.n_per_class)
    save_png(grid, args.out)
    print(f"wrote {args.out}")


def _generate_samples(cfg, gen, restored, n, seed, return_labels=False):
    """Chunked class-conditional generation → raw [-1,1] sample array
    (with the labels each sample was conditioned on when ``return_labels``).

    Fixed-size chunks (one compile, bounded activations): 5000 STL-10-sized
    samples in one forward would peak >10 GB of deconv activations."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.PRNGKey(seed)
    kz, ky = jax.random.split(key)
    z = jax.random.normal(kz, (n, cfg.z_dim))
    y = jax.random.randint(ky, (n,), 0, cfg.num_classes)

    @jax.jit
    def generate(state, z, y):
        x, _ = gen.apply(state.params["gen"], state.bn["gen"], z, y, train=False)
        return x

    chunk = min(n, max(int(cfg.batch_size), 1))
    pieces = []
    for i in range(0, n, chunk):
        zi = z[i : i + chunk]
        pad = chunk - zi.shape[0]
        if pad:  # keep the final piece the same compiled shape
            zi = jnp.pad(z[i:], ((0, pad), (0, 0)))
        out = np.asarray(generate(restored, zi, jnp.pad(y[i : i + chunk], (0, pad))))
        pieces.append(out[: chunk - pad] if pad else out)
    images = np.concatenate(pieces, axis=0)
    if return_labels:
        return images, np.asarray(y)
    return images


def _load_zca(cfg, workdir):
    """The run dir's cached ZCA stats (refit from data if the cache is
    missing); None for non-zca configs."""
    from triplegan_tpu.data.zca import ZCAStats

    if not cfg.zca:
        return None
    cache = os.path.join(workdir, "zca_stats.npz")
    if os.path.exists(cache):
        return ZCAStats.load(cache)
    from triplegan_tpu.train.loop import _resolve_data, _resolve_zca

    return _resolve_zca(cfg, _resolve_data(cfg), workdir)


def cmd_inception(args):
    """Inception-style score of class-conditional generation (SURVEY.md §6:
    paper reports ≈5.08 for conditional CIFAR-10). Default scorer is the
    checkpoint's own classifier in eval mode, fed exactly the same
    preprocessing it saw in training (ZCA-whitened for zca configs);
    ``--scorer-path`` plugs in an external scorer (Inception-v3 SavedModel
    or .npz — see eval/inception.load_scorer), fed raw [-1,1] samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.data.zca import apply_zca
    from triplegan_tpu.eval.inception import inception_score, load_scorer
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = apply_runtime(_load_cfg(args))
    workdir = os.path.join(cfg.workdir, cfg.name)
    nets = make_networks(cfg)
    gen, _, clf = nets
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
    restored = _restore_at(ckpt, state, args, workdir)

    images = _generate_samples(cfg, gen, restored, args.n_samples, args.seed)

    if args.scorer_path:
        score_logits = load_scorer(
            args.scorer_path,
            outputs=args.scorer_outputs,
            output_name=args.scorer_output_name,
        )
        label = "external-scored"
    else:
        # The classifier only ever saw whitened inputs during training
        # (step.py whiten_gen) — score in the same input distribution.
        zca = _load_zca(cfg, workdir)
        zm = jnp.asarray(zca.mean) if zca else None
        zw = jnp.asarray(zca.whiten) if zca else None

        @jax.jit
        def score_logits(x):
            if zm is not None:
                x = apply_zca(x, zm, zw)
            logits, _ = clf.apply(
                restored.params["clf"], restored.bn["clf"], x, train=False
            )
            return logits

        label = "classifier-scored"

    mean, std = inception_score(score_logits, images, n_splits=args.n_splits)
    print(f"inception score ({label}): {mean:.3f} ± {std:.3f}")


def cmd_fid(args):
    """Fréchet distance between generated samples and real data (beyond-
    parity extra — see eval/fid.py). Default feature space is the
    checkpoint's own classifier GAP features, fed the training input
    distribution (whitened for zca configs); ``--scorer-path`` plugs in an
    external extractor (e.g. an Inception-v3 SavedModel with
    ``--scorer-output-name pool_3``), fed raw [-1,1] images."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.data.zca import apply_zca
    from triplegan_tpu.eval.fid import fid_score
    from triplegan_tpu.eval.inception import load_scorer
    from triplegan_tpu.train.loop import _resolve_data
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = apply_runtime(_load_cfg(args))
    workdir = os.path.join(cfg.workdir, cfg.name)
    nets = make_networks(cfg)
    gen, _, clf = nets
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
    restored = _restore_at(ckpt, state, args, workdir)

    generated = _generate_samples(cfg, gen, restored, args.n_samples, args.seed)

    data = _resolve_data(cfg)
    real_u8 = data.x_test if args.real_split == "test" else data.x_unlabel
    if args.n_real and args.n_real < len(real_u8):
        sel = np.random.RandomState(args.seed).choice(
            len(real_u8), args.n_real, replace=False
        )
        real_u8 = real_u8[sel]
    # Real images → the generator's output space ([-1,1] when rescale is on),
    # so both sets enter the extractor identically.
    real = real_u8.astype(np.float32)
    if bool(cfg.get("rescale", True)):
        real = real / 127.5 - 1.0

    if args.scorer_path:
        features_fn = load_scorer(
            args.scorer_path,
            outputs="logits",  # FID uses raw activations — no prob mapping
            output_name=args.scorer_output_name,
        )
        label = "external features"
    else:
        zca = _load_zca(cfg, workdir)
        zm = jnp.asarray(zca.mean) if zca else None
        zw = jnp.asarray(zca.whiten) if zca else None

        @jax.jit
        def features_fn(x):
            if zm is not None:
                x = apply_zca(x, zm, zw)
            (_, feats), _ = clf.apply(
                restored.params["clf"], restored.bn["clf"], x,
                train=False, return_features=True,
            )
            return feats

        label = "classifier GAP features"

    fid = fid_score(
        features_fn, generated, real, batch_size=max(int(cfg.batch_size), 1)
    )
    print(f"FID ({label}, {len(generated)} gen vs {len(real)} real): {fid:.3f}")


def cmd_export(args):
    """Export servable inference artifacts from a trained checkpoint
    (beyond-parity extra — see export.py): the classifier (uint8 images →
    logits, training input transform baked in) and/or the generator
    ((z, y) → images) as portable StableHLO, a TF SavedModel, or raw .npz
    parameters."""
    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.configs.base import apply_runtime, make_networks
    from triplegan_tpu.export import export_artifacts
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    if args.quantize and args.format == "npz":  # before any restore work
        sys.exit(
            "--quantize applies to traced artifacts (stablehlo/savedmodel); "
            "npz stores the raw f32 parameters"
        )
    cfg = apply_runtime(_load_cfg(args))
    workdir = os.path.join(cfg.workdir, cfg.name)
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
    restored = _restore_at(ckpt, state, args, workdir)

    # ZCA stats only matter for the classifier's baked-in transform; a
    # generator-only or npz export must not pay a dataset load + refit when
    # the run dir's stats cache is missing.
    need_zca = args.what in ("classifier", "both") and args.format != "npz"
    written = export_artifacts(
        cfg,
        nets,
        restored,
        args.out or os.path.join(workdir, "export"),
        what=args.what,
        fmt=args.format,
        batch_size=args.batch_size,
        zca_stats=_load_zca(cfg, workdir) if need_zca else None,
        quantize=args.quantize,
    )
    for path in written:
        print(f"exported: {path}")


def cmd_serve(args):
    """Serve inference over HTTP (beyond-parity extra — see serve.py):
    either restore a trained run dir and serve its classifier+generator, or
    serve exported .stablehlo artifacts directly (no config needed)."""
    from triplegan_tpu.serve import app_from_artifacts, app_from_state, make_server

    if (args.classifier or args.generator) and args.config:
        sys.exit(
            "serve takes ONE source: --config (checkpoint run dir) or "
            "--classifier/--generator (.stablehlo artifacts), not both"
        )
    if args.classifier or args.generator:
        app = app_from_artifacts(
            classifier_path=args.classifier,
            generator_path=args.generator,
            meta={"source": "stablehlo"},
        )
    elif args.config:
        from triplegan_tpu.ckpt import CheckpointManager
        from triplegan_tpu.configs.base import apply_runtime, make_networks
        from triplegan_tpu.serve import make_checkpoint_reloader
        from triplegan_tpu.train.schedule import make_optimizers
        from triplegan_tpu.train.state import create_state

        cfg = apply_runtime(_load_cfg(args))
        workdir = os.path.join(cfg.workdir, cfg.name)
        nets = make_networks(cfg)
        state = create_state(cfg, nets, make_optimizers(cfg, 1))
        ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
        restored = _restore_at(ckpt, state, args, workdir)
        zca = _load_zca(cfg, workdir)
        app = app_from_state(
            cfg,
            nets,
            restored,
            zca_stats=zca,
            batch_size=args.batch_size,
            quantize=args.quantize,
            meta={"source": "checkpoint", "config": cfg.name,
                  "step": int(restored.step),
                  **({"quantize": args.quantize} if args.quantize else {})},
            # POST /reload hot-swaps to the run dir's newest checkpoint
            # (serve alongside a live training run).
            reloader=make_checkpoint_reloader(
                cfg, nets, ckpt, state, zca_stats=zca, quantize=args.quantize
            ),
        )
    else:
        sys.exit("serve needs --config (run dir) or --classifier/--generator "
                 "(.stablehlo artifacts)")

    server = make_server(app, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(endpoints: {', '.join(app.health()['endpoints'])}; GET /healthz)",
          flush=True)

    # Container orchestrators stop pods with SIGTERM: route it through the
    # same clean path as Ctrl-C (stop accepting, release the socket, exit 0)
    # instead of dying mid-request with a failure status.
    import signal

    def _sigterm(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down", flush=True)
        server.shutdown()
        server.server_close()


def cmd_predict(args):
    """Offline batch inference (beyond-parity extra): label a file of raw
    uint8 images with the trained classifier — the end-use of a
    semi-supervised model. Input: ``.npy`` uint8 NHWC (or ``.npz`` with an
    ``images`` key). Output: ``.npz`` with ``logits`` [N,K] f32, ``probs``
    (softmax), and ``labels`` (argmax). Source: the run dir's checkpoint,
    or ``--artifact`` (an exported classifier ``.stablehlo``, transform
    baked in — no checkpoint needed)."""
    import numpy as np

    from triplegan_tpu.serve import batched_apply

    def load_images(path):
        try:
            arr = np.load(path, allow_pickle=False)
        except FileNotFoundError:
            sys.exit(f"{path}: no such input file")
        except Exception as e:
            sys.exit(f"{path}: not a readable .npy/.npz ({e})")
        if not isinstance(arr, np.ndarray):  # .npz
            if "images" not in arr:
                sys.exit(f"{path}: .npz input must contain an 'images' array")
            arr = arr["images"]
        if arr.dtype != np.uint8 or arr.ndim != 4:
            sys.exit(
                f"{path}: images must be uint8 [N,H,W,C], got {arr.dtype} "
                f"{arr.shape}"
            )
        if len(arr) == 0:
            sys.exit(f"{path}: input holds 0 images")
        return arr

    images = load_images(args.input)
    if args.artifact:
        if args.quantize:
            sys.exit(
                "--quantize applies to the checkpoint source; an artifact "
                "is already quantized (or not) at export time"
            )
        from triplegan_tpu.export import load_stablehlo_exported

        exp = load_stablehlo_exported(args.artifact)
        if len(exp.in_avals) != 1:
            sys.exit(f"{args.artifact} is not a classifier artifact")
        (aval,) = exp.in_avals
        if tuple(aval.shape[1:]) != tuple(images.shape[1:]):
            sys.exit(
                f"artifact expects images {tuple(aval.shape[1:])}, input "
                f"has {tuple(images.shape)}"
            )
        logits = batched_apply(exp.call, int(aval.shape[0]), images)
    else:
        if not args.config:
            sys.exit("predict needs --config (run dir) or --artifact")
        import jax

        from triplegan_tpu.ckpt import CheckpointManager
        from triplegan_tpu.configs.base import apply_runtime, make_networks
        from triplegan_tpu.export import make_serving_fns
        from triplegan_tpu.train.schedule import make_optimizers
        from triplegan_tpu.train.state import create_state

        cfg = apply_runtime(_load_cfg(args))
        workdir = os.path.join(cfg.workdir, cfg.name)
        if tuple(images.shape[1:]) != (cfg.image_size, cfg.image_size, cfg.channels):
            sys.exit(
                f"{cfg.name} expects images "
                f"{(cfg.image_size, cfg.image_size, cfg.channels)}, input "
                f"has {tuple(images.shape)}"
            )
        nets = make_networks(cfg)
        state = create_state(cfg, nets, make_optimizers(cfg, 1))
        ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), write=False)
        restored = _restore_at(ckpt, state, args, workdir)
        classify, _ = make_serving_fns(
            cfg, nets, restored, zca_stats=_load_zca(cfg, workdir),
            quantize=args.quantize,
        )
        b = int(args.batch_size or cfg.batch_size)
        logits = batched_apply(jax.jit(classify), b, images)

    logits = np.asarray(logits, np.float32)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    labels = logits.argmax(axis=-1).astype(np.int32)
    np.savez(args.out, logits=logits, probs=probs, labels=labels)
    counts = np.bincount(labels, minlength=logits.shape[-1])
    print(
        f"predicted {len(labels)} images → {args.out} "
        f"(class counts: {counts.tolist()})"
    )


def cmd_doctor(args):
    """Deployment diagnostics (beyond-parity extra — see doctor.py):
    device init (probed in a subprocess with a timeout, so a dead TPU
    driver/tunnel is reported, not hung on), versions, config/data/mesh/
    checkpoint sanity. Exits non-zero iff any check FAILS."""
    from triplegan_tpu.doctor import format_findings, run_doctor

    cfg = workdir = None
    if args.config:
        from triplegan_tpu.configs.base import apply_runtime

        cfg = apply_runtime(_load_cfg(args))
        workdir = os.path.join(cfg.workdir, cfg.name)
    findings = run_doctor(
        cfg,
        workdir,
        skip_device=args.skip_device,
        device_timeout_s=args.device_timeout,
    )
    print(format_findings(findings))
    if any(lv == "fail" for lv, _, _ in findings):
        sys.exit(1)


def cmd_prepare(args):
    from triplegan_tpu.data.prepare import prepare

    prepare(args.dataset, args.raw_dir, args.data_dir, download=args.download)
    print(f"prepared {args.dataset} → {args.data_dir}/{args.dataset}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="triplegan_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", required=True)
        sp.add_argument("--workdir", default=None)
        sp.add_argument("--data-dir", default=None)
        sp.add_argument("--set", action="append", metavar="KEY=VALUE")

    sp = sub.add_parser("train", help="train a Triple-GAN")
    common(sp)
    sp.add_argument("--max-steps", type=int, default=None)
    sp.set_defaults(fn=cmd_train)

    def step_arg(sp):
        sp.add_argument(
            "--step", type=int, default=None,
            help="checkpoint step to restore (default: latest kept)",
        )

    sp = sub.add_parser("eval", help="classifier test error from a checkpoint")
    common(sp)
    step_arg(sp)
    sp.add_argument(
        "--artifact", default=None,
        help="qualify an exported classifier .stablehlo instead: score the "
             "test set through the artifact (uint8 in, transform baked in) "
             "and report its test error — must match the checkpoint's",
    )
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("sample", help="class-conditional sample grid")
    common(sp)
    step_arg(sp)
    sp.add_argument("--out", default="samples.png")
    sp.add_argument("--n-per-class", type=int, default=10)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("inception", help="inception-style score of conditional samples")
    common(sp)
    step_arg(sp)
    sp.add_argument("--n-samples", type=int, default=5000)
    sp.add_argument("--n-splits", type=int, default=10)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument(
        "--scorer-path", default=None,
        help="external scorer: Inception-v3 SavedModel dir, .npz, or an "
             "exported classifier .stablehlo (see eval/inception.load_scorer)",
    )
    sp.add_argument(
        "--scorer-outputs", default="auto", choices=("auto", "logits", "probs"),
        help="what the external scorer emits; 'probs' (or auto-detected "
             "probability rows) are log-mapped so the IS softmax recovers "
             "them exactly instead of double-softmaxing",
    )
    sp.add_argument(
        "--scorer-output-name", default=None,
        help="output tensor name when the SavedModel serving signature has "
             "multiple outputs",
    )
    sp.set_defaults(fn=cmd_inception)

    sp = sub.add_parser("fid", help="Fréchet distance of generated samples vs real data")
    common(sp)
    step_arg(sp)
    sp.add_argument("--n-samples", type=int, default=5000)
    sp.add_argument("--n-real", type=int, default=10000,
                    help="cap on real images used for the data-side stats (0 = all)")
    sp.add_argument("--real-split", default="test", choices=("test", "train"),
                    help="real-side images: test set, or the unlabeled train pool")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument(
        "--scorer-path", default=None,
        help="external feature extractor: SavedModel dir, .npz, or an exported "
             "classifier .stablehlo (see eval/inception.load_scorer); default "
             "is the checkpoint's classifier GAP features",
    )
    sp.add_argument(
        "--scorer-output-name", default=None,
        help="output tensor name when the SavedModel serving signature has "
             "multiple outputs (e.g. pool_3)",
    )
    sp.set_defaults(fn=cmd_fid)

    sp = sub.add_parser("export", help="export servable artifacts from a checkpoint")
    common(sp)
    step_arg(sp)
    sp.add_argument("--out", default=None,
                    help="output directory (default: <workdir>/<name>/export)")
    sp.add_argument("--what", default="both",
                    choices=("classifier", "generator", "both"))
    sp.add_argument("--format", default="stablehlo",
                    choices=("stablehlo", "savedmodel", "npz"),
                    help="stablehlo: portable jax.export bytes (PjRT/JAX "
                         "serving); savedmodel: TF Serving; npz: raw params")
    sp.add_argument("--batch-size", type=int, default=None,
                    help="static serving batch size (default: cfg.batch_size)")
    sp.add_argument("--quantize", default=None, choices=("int8",),
                    help="weight-only int8 PTQ baked into the artifact "
                         "(per-output-channel scales; ~4x smaller; qualify "
                         "with eval --artifact)")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("serve", help="HTTP inference server (checkpoint or "
                                      ".stablehlo artifacts)")
    sp.add_argument("--config", default=None,
                    help="serve a trained run dir's classifier+generator")
    sp.add_argument("--workdir", default=None)
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--set", action="append", metavar="KEY=VALUE")
    step_arg(sp)
    sp.add_argument("--classifier", default=None,
                    help="exported classifier .stablehlo to serve directly")
    sp.add_argument("--generator", default=None,
                    help="exported generator .stablehlo to serve directly")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8000,
                    help="0 binds an ephemeral port (printed at startup)")
    sp.add_argument("--batch-size", type=int, default=None,
                    help="static serving batch (checkpoint source only; "
                         "default cfg.batch_size; requests are chunked+padded)")
    sp.add_argument("--quantize", default=None, choices=("int8",),
                    help="serve the weight-only int8 PTQ variant "
                         "(checkpoint source only)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("predict", help="batch-label raw images with the "
                                        "trained classifier")
    sp.add_argument("--config", default=None)
    sp.add_argument("--workdir", default=None)
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--set", action="append", metavar="KEY=VALUE")
    step_arg(sp)
    sp.add_argument("--input", required=True,
                    help=".npy uint8 NHWC images (or .npz with an 'images' key)")
    sp.add_argument("--out", default="predictions.npz",
                    help="output .npz: logits, probs, labels")
    sp.add_argument("--artifact", default=None,
                    help="predict through an exported classifier .stablehlo "
                         "instead of restoring the checkpoint")
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--quantize", default=None, choices=("int8",),
                    help="weight-only int8 PTQ (checkpoint source only)")
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("doctor", help="diagnose the deployment: device, "
                                       "versions, config, data, mesh, ckpts")
    sp.add_argument("--config", default=None,
                    help="also check this config's data/mesh/run-dir")
    sp.add_argument("--workdir", default=None)
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--set", action="append", metavar="KEY=VALUE")
    sp.add_argument("--skip-device", action="store_true",
                    help="skip the subprocess device-init probe")
    sp.add_argument("--device-timeout", type=int, default=600,
                    help="seconds before the device probe is declared hung "
                         "(default covers this hardware's documented 1-10 "
                         "min healthy startup stalls)")
    sp.set_defaults(fn=cmd_doctor)

    sp = sub.add_parser("prepare", help="convert raw dataset files to npz shards")
    sp.add_argument("--dataset", required=True)
    sp.add_argument(
        "--raw-dir", default="",
        help="directory of raw dataset files (optional for datasets whose "
             "data ships in-package, e.g. digits)",
    )
    sp.add_argument("--data-dir", required=True)
    sp.add_argument(
        "--download", action="store_true",
        help="fetch + checksum-verify the raw files into --raw-dir first "
             "(requires network)",
    )
    sp.set_defaults(fn=cmd_prepare)

    # Every subcommand accepts --platform: the environment's TPU plugin
    # ignores JAX_PLATFORMS, so this (or TRIPLEGAN_PLATFORM=cpu, which
    # subprocesses inherit) is the reliable way to run CPU-side — eval/
    # predict/serve on a CPU VM, or any command while the TPU is busy or
    # its tunnel is dark. Must be applied before the first jax device use.
    for sp_ in sub.choices.values():
        sp_.add_argument(
            "--platform", default=None, choices=("cpu", "tpu"),
            help="force the JAX backend (default: auto; env fallback "
                 "TRIPLEGAN_PLATFORM — the TPU plugin ignores JAX_PLATFORMS)",
        )

    args = p.parse_args(argv)
    platform = args.platform or os.environ.get("TRIPLEGAN_PLATFORM")
    if platform:
        if platform not in ("cpu", "tpu"):
            p.error(
                f"TRIPLEGAN_PLATFORM must be 'cpu' or 'tpu', got {platform!r}"
            )
        # Export the RESOLVED platform so every subprocess this command
        # spawns (doctor's device probe, campaign stages, serve workers)
        # honors the --platform flag form too, not just the env form.
        os.environ["TRIPLEGAN_PLATFORM"] = platform
        from triplegan_tpu.utils.platform import apply_platform

        apply_platform(platform)
    from triplegan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
