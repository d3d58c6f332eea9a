"""The training driver (rebuild of the reference's ``Train(config).train()``,
SURVEY.md §2.1 #10, §3.2): build everything, restore-if-checkpoint, epoch
loop over the compiled three-player step, periodic metrics/eval/samples/
checkpoints.

The hot loop does no per-step host work beyond pulling the next prefetched
batch: the step is one XLA executable; metrics are device arrays fetched
only at log intervals.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from triplegan_tpu.ckpt import CheckpointManager
from triplegan_tpu.configs.base import apply_runtime, display, make_networks, save_config
from triplegan_tpu.data.datasets import SemiSupervisedData, load_dataset, synthetic_dataset
from triplegan_tpu.data.pipeline import BatchSampler, device_prefetch, upload_device_data
from triplegan_tpu.data.zca import ZCAStats, fit_zca
from triplegan_tpu.eval.metrics import evaluate_error
from triplegan_tpu.eval.sample import class_grid_inputs, make_sample_fn, to_uint8_grid, save_png
from triplegan_tpu.parallel import mesh as pmesh
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state, param_count
from triplegan_tpu.train.step import (
    make_device_train_step,
    make_eval_step,
    make_scan_device_train_step,
    make_train_step,
)
from triplegan_tpu.utils.logging import MetricsLogger


def _resolve_data(cfg) -> SemiSupervisedData:
    if cfg.dataset == "synthetic":
        return synthetic_dataset(
            image_size=cfg.image_size,
            channels=cfg.channels,
            num_classes=cfg.num_classes,
            num_labeled=cfg.num_labeled,
            seed=cfg.seed,
        )
    data = load_dataset(
        cfg.data_dir, cfg.dataset, cfg.num_labeled, cfg.num_classes, cfg.seed
    )
    # Fail HERE with the config keys to fix, not deep inside jit tracing
    # with an opaque shape error — this is the contract custom (bring-your-
    # own-npz) datasets are validated against (docs/MIGRATION.md).
    want = (cfg.image_size, cfg.image_size, cfg.channels)
    got = tuple(data.x_test.shape[1:])
    if got != want:
        raise ValueError(
            f"dataset '{cfg.dataset}' images are {got}, but the config "
            f"expects {want} — set --set image_size={got[0]} / "
            f"--set channels={got[-1]} (networks are shape-generic)"
        )
    ymax = int(data.y_test.max())
    if ymax >= cfg.num_classes:
        raise ValueError(
            f"dataset '{cfg.dataset}' has label {ymax} but "
            f"num_classes={cfg.num_classes} — set --set num_classes="
            f"{ymax + 1}"
        )
    return data


def _resolve_zca(cfg, data: SemiSupervisedData, workdir: str) -> Optional[ZCAStats]:
    """Run-dir cache → stats fitted at ``prepare`` time → fresh fit.

    ``prepare`` saves ``{data_dir}/{dataset}/zca_stats.npz`` alongside the
    shards (SURVEY.md §3.1: the reference fits ZCA once at prep time and
    reuses it); loading it saves a 50k×3072 covariance + 3072² float64
    eigendecomposition of startup per new run dir. The chosen stats are
    cached into the run dir either way so eval/sample see exactly the
    train-time whitening even if the data dir moves."""
    if not cfg.zca:
        return None
    coord = jax.process_index() == 0
    cache = os.path.join(workdir, "zca_stats.npz")
    # Non-coordinator processes of a multi-host run neither read nor write
    # the run-dir cache (reading could catch the coordinator's write mid-
    # flight on shared storage; writing would race it). They recompute from
    # the prepared stats / a deterministic fit — identical by construction.
    if coord and os.path.exists(cache):
        return ZCAStats.load(cache)
    prepared = os.path.join(cfg.data_dir, cfg.dataset, "zca_stats.npz")
    if cfg.dataset != "synthetic" and os.path.exists(prepared):
        stats = ZCAStats.load(prepared)
    else:
        stats = fit_zca(data.x_unlabel)
    if coord:
        os.makedirs(workdir, exist_ok=True)
        tmp = f"{cache}.{os.getpid()}.tmp.npz"  # .npz suffix: np.savez appends it otherwise
        stats.save(tmp)
        os.replace(tmp, cache)  # atomic publish: readers never see a torn file
    return stats


def train(
    cfg,
    data: Optional[SemiSupervisedData] = None,
    max_steps: Optional[int] = None,
    verbose: bool = True,
):
    """Full training run; returns a summary dict. ``max_steps`` caps total
    steps for smoke tests without changing schedule constants."""
    # Multi-host init first: jax.distributed must precede the first backend
    # touch. Host-side outputs (logs/grids/config.json/prints) then belong
    # to the coordinator only; checkpoint saves stay on all processes
    # (orbax coordinates multi-process commits itself).
    if bool(cfg.get("multihost", False)):
        pmesh.init_distributed(
            str(cfg.get("multihost_coordinator", "")),
            int(cfg.get("multihost_num_processes", 0)),
            int(cfg.get("multihost_process_id", -1)),
        )
    coord = pmesh.is_coordinator()
    verbose = verbose and coord
    apply_runtime(cfg)
    workdir = os.path.join(cfg.workdir, cfg.name)
    os.makedirs(workdir, exist_ok=True)
    logger = MetricsLogger(workdir, enabled=coord)
    if verbose:
        print(display(cfg))

    if data is None:
        data = _resolve_data(cfg)
    zca = _resolve_zca(cfg, data, workdir)

    steps_per_epoch = int(cfg.steps_per_epoch) or max(
        len(data.x_unlabel) // cfg.batch_size, 1
    )
    total_steps = int(cfg.epochs) * steps_per_epoch

    nets = make_networks(cfg)
    optimizers = make_optimizers(cfg, total_steps)
    state = create_state(cfg, nets, optimizers)
    if verbose:
        print("param counts:", param_count(state))

    n_dev = int(np.prod(cfg.mesh_shape))
    if bool(cfg.get("multihost", False)) and n_dev != jax.device_count():
        # Without this, a forgotten mesh_shape silently runs N independent
        # single-host trainings that all commit process-local states into
        # the same shared checkpoint dir.
        raise ValueError(
            f"multihost=True requires the mesh to span every pod device: "
            f"prod(mesh_shape)={n_dev} but jax.device_count()="
            f"{jax.device_count()} — set mesh_shape=({jax.device_count()},)"
        )
    if cfg.batch_size % max(n_dev, 1) != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide evenly over the "
            f"{n_dev}-device data mesh"
        )
    axis = pmesh.AXIS if n_dev > 1 else None
    on_device = bool(cfg.data_on_device)
    if on_device:
        train_step_fn = make_device_train_step(
            cfg, nets, optimizers, total_steps, zca,
            axis_name=axis, n_shards=n_dev,
            pseudo_label_mode=cfg.get("pseudo_label_mode", "sample"),
        )
    else:
        train_step_fn = make_train_step(
            cfg, nets, optimizers, total_steps, zca, axis_name=axis,
            pseudo_label_mode=cfg.get("pseudo_label_mode", "sample"),
        )
    eval_step_fn = make_eval_step(cfg, nets, zca, axis_name=axis)
    sharding = None
    replicated = None
    # lax.scan chunking: `chunk` steps per XLA dispatch (device-data only —
    # the host pipeline needs a fresh batch per step), with the chunk's
    # batch sampling hoisted into one vmapped gather.
    chunk = int(cfg.get("scan_steps", 1)) if on_device else 1
    scan_fn = None
    if chunk > 1:
        scan_fn = make_scan_device_train_step(
            cfg, nets, optimizers, total_steps, chunk, zca,
            axis_name=axis, n_shards=n_dev,
            pseudo_label_mode=cfg.get("pseudo_label_mode", "sample"),
            metrics_mode=str(cfg.get("scan_metrics", "last")),
        )
    scan_step = None
    if n_dev > 1:
        mesh = pmesh.make_mesh(n_dev)
        if on_device:
            step = pmesh.shard_device_train_step(train_step_fn, mesh)
            if scan_fn is not None:
                scan_step = pmesh.shard_device_train_step(scan_fn, mesh)
        else:
            step = pmesh.shard_train_step(train_step_fn, mesh)
        eval_step = pmesh.shard_eval_step(eval_step_fn, mesh)
        sharding = pmesh.batch_sharding(mesh)
        replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        if jax.process_count() > 1:
            state = pmesh.stage_global(state, replicated)
        else:
            state = jax.device_put(state, replicated)
    else:
        # Donate the state: params/opt buffers are reused in place, halving
        # peak HBM for the step and removing a copy per iteration.
        step = jax.jit(train_step_fn, donate_argnums=0)
        if scan_fn is not None:
            scan_step = jax.jit(scan_fn, donate_argnums=0)
        eval_step = jax.jit(eval_step_fn)

    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"), max_to_keep=cfg.ckpt_keep)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        if verbose:
            print(f"resumed from step {int(state.step)}")
    elif cfg.ddinit:
        state = _apply_ddinit(cfg, nets, state, data, zca)
        if verbose:
            print("applied data-dependent weight-norm init")
    # Persist the resolved config so eval/sample/inception (and resumes)
    # rebuild the exact checkpoint template without the user repeating --set
    # overrides. Written only after a successful restore decision: a resume
    # attempt with a mismatched config dies above instead of first clobbering
    # the good record the original run wrote.
    if coord:
        save_config(cfg, os.path.join(workdir, "config.json"))

    # Fold the resume step into the sampler seed so a resumed run draws a
    # fresh continuation of the data stream instead of replaying the early
    # epochs (state restore is exact; this keeps the *stream* deterministic
    # per (seed, resume-step) without host-side fast-forwarding).
    sampler = BatchSampler(data, cfg.batch_size, seed=cfg.seed + int(state.step))
    if on_device:
        device_data = upload_device_data(data, sharding=replicated)
        batches = None
    else:
        batches = device_prefetch(
            sampler.triple_iter(
                cfg.z_dim,
                cfg.num_classes,
                skip_c_unlabeled=bool(cfg.get("share_pseudo_forward", False)),
            ),
            sharding=sharding,
        )
    sample_fn = make_sample_fn(cfg, nets)

    start_step = int(state.step)
    end_step = total_steps if max_steps is None else min(total_steps, start_step + max_steps)
    last_metrics = {}
    test_error = None
    eval_at = -1
    # Optional hot-loop trace (reference's nvprof/TF-timeline equivalent,
    # SURVEY §5): bracket `profile_steps` steps after a short warmup that
    # excludes compilation, fencing on the step outputs at both edges so the
    # trace covers whole dispatches.
    profile_dir = str(cfg.get("profile_dir", "") or "")
    profile_on = False
    profile_start = start_step + 2 * max(chunk, 1)
    profile_stop = profile_start + max(int(cfg.get("profile_steps", 10)), chunk)
    # Preemption-safe shutdown (SURVEY §5 failure detection/recovery):
    # orchestrators stop preemptible workers with SIGTERM plus a short grace
    # window. Trip a flag, let the in-flight dispatch finish, checkpoint
    # immediately (the final re-eval is SKIPPED — it may not fit the grace
    # window), and return ``preempted=True`` (the CLI exits 75/EX_TEMPFAIL so
    # restart policies can tell preemption from completion). Re-running the
    # same command resumes from this save.
    #
    # Two stop transports, one DECISION:
    #   * SIGTERM → a process-local flag;
    #   * a ``<workdir>/STOP`` file, polled at dispatch boundaries — touch
    #     it to stop a run gracefully without signalling, and under
    #     multihost it lets ONE command stop the whole pod (shared workdir).
    # Under multihost the decision itself must be GLOBALLY CONSISTENT at the
    # SAME iteration on every process: the train/eval/ckpt dispatches are
    # collective, so a process that stops while a peer dispatches one more
    # step deadlocks the pod. ``_global_stop`` all-gathers the local bit at
    # fixed program points, so all processes see the same verdict at the
    # same point regardless of which process the signal or stop-file write
    # landed on. The allgather is a host-blocking DCN collective, so the
    # hot loop must NOT pay it per iteration (it would serialize async
    # dispatch); sync points are: every ``stop_sync_every`` steps of hot
    # loop, the loop top right after any epoch-boundary tail (evals are
    # where a grace-window signal most likely lands — they take seconds),
    # post-dispatch at epoch boundaries, inside eval streams (per test
    # batch, identical count on every process), and post-loop.
    stop = {"sig": None}
    stop_file = os.path.join(workdir, "STOP")
    if coord and os.path.exists(stop_file):
        os.remove(stop_file)  # stale from a previous preempted run

    def _on_sigterm(signum, frame):
        stop["sig"] = signum

    multihost_sync = jax.process_count() > 1
    # Hot-loop sync cadence (steps). Deterministic from the shared step
    # count, so every process allgathers at the identical program points.
    stop_sync_every = max(1, int(os.environ.get("TRIPLEGAN_STOP_SYNC_EVERY", "32")))

    def _global_stop() -> bool:
        # Only the coordinator polls the stop-file: it is also the process
        # that removes a stale one at startup, so the read can never race
        # the removal (a non-coordinator could otherwise see last run's
        # STOP before the coordinator deletes it and kill a resumed run at
        # iteration 0). The allgather fans the coordinator's verdict out.
        local = stop["sig"] is not None or (coord and os.path.exists(stop_file))
        if not multihost_sync:
            return local
        from jax.experimental import multihost_utils

        return bool(np.any(multihost_utils.process_allgather(np.asarray(local))))

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (embedded caller) — no handler
        prev_sigterm = None

    t_log = time.perf_counter()
    steps_since_log = 0
    it = start_step
    stopping = False
    steps_since_sync = stop_sync_every  # force a sync on the first loop top
    sync_now = True
    try:
        while it < end_step:
            # Loop-top check catches a stop that arrived during the
            # previous iteration's eval/sample/ckpt tail, BEFORE the next
            # dispatch is issued. Under multihost the allgather is paid
            # only at the throttled sync points (sync_now: every
            # stop_sync_every steps, or right after an epoch tail) —
            # single-process runs check the free local flag every time.
            if not multihost_sync:
                stopping = _global_stop()
            elif sync_now or steps_since_sync >= stop_sync_every:
                stopping = _global_stop()
                steps_since_sync = 0
                sync_now = False
            if stopping:
                break
            if profile_dir and not profile_on and it >= profile_start:
                jax.block_until_ready(state)
                jax.profiler.start_trace(profile_dir)
                profile_on = True
            if scan_step is not None and it + chunk <= end_step:
                state, metrics = scan_step(state, device_data)
                taken = chunk
            elif on_device:
                state, metrics = step(state, device_data)
                taken = 1
            else:
                state, metrics = step(state, next(batches))
                taken = 1
            prev, it = it, it + taken
            steps_since_log += taken
            steps_since_sync += taken
            if profile_on and it >= profile_stop:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profile_on = False
                profile_dir = ""
                if verbose:
                    print(f"wrote profile trace to {cfg.profile_dir}")

            # cadence 0 = interval logging disabled (the final fetch still
            # runs, matching the eval/ckpt cadence-0 convention below)
            log_hit = cfg.log_every and (it // cfg.log_every) > (prev // cfg.log_every)
            if log_hit or it == end_step:
                metrics = jax.device_get(metrics)
                last_metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_log
                t_log = time.perf_counter()
                imgs_per_sec = steps_since_log * cfg.batch_size / max(dt, 1e-9)
                steps_since_log = 0
                logger.scalars(it, {**last_metrics, "images_per_sec": imgs_per_sec})
                if verbose:
                    terms = " ".join(
                        f"{k}={v:.4f}" for k, v in sorted(last_metrics.items())
                    )
                    print(f"step {it}/{total_steps} [{imgs_per_sec:.0f} img/s] {terms}")

            epoch_done = (it // steps_per_epoch) > (prev // steps_per_epoch)
            epoch = it // steps_per_epoch
            if epoch_done and (cfg.eval_every_epochs or cfg.ckpt_every_epochs):
                # Post-dispatch check: a stop that landed during the
                # dispatch skips the periodic eval/sample/ckpt tail — the
                # grace window is for the preempt checkpoint, not for a
                # full eval + grid render (the post-loop save still runs).
                stopping = _global_stop()
                steps_since_sync = 0
                sync_now = True  # catch a stop landing during the tail below
            # cadence 0 = disabled (final eval/ckpt after the loop still run)
            if (epoch_done and not stopping and cfg.eval_every_epochs
                    and epoch % cfg.eval_every_epochs == 0):
                try:
                    test_error = evaluate_error(
                        eval_step, state,
                        _test_stream(sampler, sharding, stop_check=_global_stop),
                    )
                except _EvalInterrupted:
                    # A stop landed mid-eval: abandon the partial eval (a
                    # truncated test set must not be logged as the error)
                    # and go straight to the preempt checkpoint.
                    stopping = True
                else:
                    eval_at = it
                    logger.scalars(it, {"test_error": test_error})
                    if verbose:
                        print(f"epoch {epoch}: test error {100 * test_error:.2f}%")
                    z, labels = class_grid_inputs(cfg, n_per_class=10, seed=cfg.seed)
                    grid = to_uint8_grid(sample_fn(state, z, labels), cfg.num_classes, 10)
                    logger.image(it, "samples", grid)
                    if coord:
                        save_png(grid, os.path.join(workdir, f"samples_{it:08d}.png"))
            if (epoch_done and not stopping and cfg.ckpt_every_epochs
                    and epoch % cfg.ckpt_every_epochs == 0):
                ckpt.save(it, state)

        # One more synced check when the loop ran to completion: a stop that
        # arrived after the last dispatch must skip the final re-eval too
        # (and the decision must be consistent — the re-eval is collective).
        preempted = stopping or _global_stop()
        if profile_on:  # run ended inside the profiled window
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
        if not preempted and (test_error is None or eval_at != it):
            # Re-evaluate at the FINAL state when the last periodic eval is
            # stale (run ended mid-epoch): the reported "done" error must match
            # what `cli eval` computes from the final checkpoint (the parity
            # protocol compares exactly these two numbers, docs/PARITY.md §4).
            # A SIGTERM/STOP landing during this multi-batch eval aborts it
            # (the grace window is for the checkpoint below, not a full-set
            # eval over a possibly-flaky device link) and flags preemption.
            try:
                test_error = evaluate_error(
                    eval_step, state,
                    _test_stream(sampler, sharding, stop_check=_global_stop),
                )
            except _EvalInterrupted:
                preempted = True
            else:
                logger.scalars(it, {"test_error": test_error})
        ckpt.save(int(state.step), state)
        ckpt.close()
    finally:
        # The flag handler stays installed through the preempt save: grace
        # windows commonly re-send SIGTERM, and a default-action second
        # signal mid-save would kill the process before the checkpoint
        # commits (orbax atomicity protects integrity, not progress).
        # Restore only after ckpt.save + close have returned.
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    logger.close()
    if preempted and verbose:
        print(f"preempted (SIGTERM/STOP): checkpointed at step "
              f"{int(state.step)}; re-run the same command to resume")
    return {
        "steps": int(state.step),
        "test_error": test_error,
        "metrics": last_metrics,
        "workdir": workdir,
        "state": state,
        "preempted": preempted,
    }


def _apply_ddinit(cfg, nets, state, data: SemiSupervisedData, zca):
    """Data-dependent weight-norm init (Salimans-Kingma) on one real batch,
    preprocessed exactly as the train step would (rescale + ZCA, no aug)."""
    import jax.numpy as jnp

    from triplegan_tpu.data import ondevice
    from triplegan_tpu.nn.ddinit import ddinit_discriminator, ddinit_generator

    gen, disc, _ = nets
    n = min(cfg.batch_size, len(data.x_unlabel))
    x = ondevice.standard_pipeline(
        None,
        jnp.asarray(data.x_unlabel[:n]),
        zca_mean=jnp.asarray(zca.mean) if zca else None,
        zca_whiten=jnp.asarray(zca.whiten) if zca else None,
        train=False,
        do_rescale=bool(cfg.get("rescale", True)),
    )
    rng = jax.random.PRNGKey(cfg.seed + 1)
    kz, ky, kyd = jax.random.split(rng, 3)
    y = jax.random.randint(kyd, (n,), 0, cfg.num_classes)
    z = jax.random.normal(kz, (n, cfg.z_dim))
    y_g = jax.random.randint(ky, (n,), 0, cfg.num_classes)
    new_params = dict(state.params)
    new_params["disc"] = ddinit_discriminator(disc, state.params["disc"], x, y)
    new_params["gen"] = ddinit_generator(
        gen, state.params["gen"], state.bn["gen"], z, y_g
    )
    return state.replace(params=new_params)


class _EvalInterrupted(Exception):
    """A stop (SIGTERM/STOP-file) tripped mid-eval; the partial eval is
    abandoned. Raised at identical batch indices on every process (the
    stop check is the synced verdict), so collective callers stay lock-
    step."""


def _test_stream(sampler: BatchSampler, sharding, stop_check=None):
    """Test batches, padded to a fixed shape and staged (sharded on a mesh;
    stage_global under multi-host — every process iterates the same test
    set, so the global-array contract holds). ``stop_check`` (the synced
    stop verdict) is polled before each batch so a grace-window signal
    aborts a long eval instead of burning the window; evals are rare and
    per-batch compute dwarfs the allgather, unlike the train hot loop."""
    multihost = jax.process_count() > 1
    for batch in sampler.test_batches():
        if stop_check is not None and stop_check():
            raise _EvalInterrupted()
        if sharding is not None:
            if multihost:
                batch = pmesh.stage_global(batch, sharding)
            else:
                batch = jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        yield batch
