"""ONE compiled three-player train step (the rebuild's hot loop).

Reference parity (SURVEY.md §2.1 #9–10, §3.2): the reference's hot loop is
three alternating ``sess.run``s per iteration — D's update is visible to G's
loss in the same iteration, and G's and D's updates are visible to C's
(SURVEY.md §7 hard-part 1). Here the three *sequential* sub-updates (grad →
Adam → apply) happen **inside a single jitted function**, so the whole
iteration is one XLA executable: no Python↔runtime boundary, no host↔device
sync, and the on-device input transforms (rescale / augment / ZCA) fuse into
the same program.

Data-parallel execution wraps this same function in ``shard_map`` over a
1-D "data" mesh axis: gradients are ``psum``-averaged over ICI before each
Adam apply, and batch-norm syncs its moments over the same axis, so the
sharded step computes exactly the single-device global-batch update
(SURVEY.md §2.3, §4.6).

Batch-norm statistics policy: each network's running stats advance exactly
once per iteration — during its *own* player's update pass. Cross-forwards
(e.g. G's output scored inside D's loss) run in train mode (batch statistics)
but their running-stat updates are discarded, mirroring the TF convention of
attaching update-ops only to the owning player's train op.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from triplegan_tpu.data import ondevice
from triplegan_tpu.data.zca import apply_zca
from triplegan_tpu.train import losses
from triplegan_tpu.train.schedule import alpha_p_schedule, linear_decay_schedule
from triplegan_tpu.train.state import TrainState


def _compute_dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def make_train_step(
    cfg,
    nets,
    optimizers,
    total_steps: int,
    zca_stats=None,
    axis_name: Optional[str] = None,
    pseudo_label_mode: str = "sample",
):
    """Build the jittable ``(state, batch) -> (state, metrics)`` step.

    ``batch`` is the nested dict from ``BatchSampler.next_triple`` (uint8
    images, int labels, f32 z) — per-player sub-batches, matching the
    reference's three independent ``sess.run`` input pulls.
    """
    gen, disc, clf = nets
    opt_g, opt_d, opt_c = optimizers["gen"], optimizers["disc"], optimizers["clf"]
    alpha = float(cfg.alpha)
    cdt = _compute_dtype(cfg)
    steps_per_epoch = max(total_steps // max(int(cfg.epochs), 1), 1)
    warmup_steps = int(cfg.alpha_p_warmup_epochs) * steps_per_epoch
    ap_sched = alpha_p_schedule(
        float(cfg.alpha_p),
        warmup_steps,
        int(cfg.get("alpha_p_ramp_epochs", 0)) * steps_per_epoch,
    )
    decay_start = int(cfg.lr_decay_start_frac * total_steps)
    lr_now = linear_decay_schedule(1.0, decay_start, total_steps)  # unit lr for logging

    if zca_stats is not None:
        zca_mean = jnp.asarray(zca_stats.mean)
        zca_whiten = jnp.asarray(zca_stats.whiten)
    else:
        zca_mean = zca_whiten = None

    def preprocess(key, x_uint8):
        """Host uint8 → augmented, (optionally) whitened compute-dtype batch."""
        return ondevice.standard_pipeline(
            key,
            x_uint8,
            translate=int(cfg.aug_translate),
            flip=bool(cfg.aug_flip),
            pad_mode=str(cfg.get("aug_pad_mode", "reflect")),
            zca_mean=zca_mean,
            zca_whiten=zca_whiten,
            train=True,
            dtype=cdt,
            zca_first=cfg.get("aug_order", "zca_first") == "zca_first",
            do_rescale=bool(cfg.get("rescale", True)),
        )

    def whiten_gen(x_raw):
        """G emits raw-pixel-space images; whiten before D/C score them
        (SURVEY.md Appendix A data handling)."""
        if zca_mean is not None:
            return apply_zca(x_raw, zca_mean, zca_whiten)
        return x_raw

    def pmean(tree):
        if axis_name is None:
            return tree
        return lax.pmean(tree, axis_name)

    share_fwd = bool(cfg.get("share_pseudo_forward", False))
    if share_fwd and bool(cfg.get("fused_clf_forward", False)):
        raise ValueError(
            "share_pseudo_forward and fused_clf_forward are mutually "
            "exclusive: the shared-forward C update replaces the fused "
            "3B-row pass entirely, so enabling both would silently measure "
            "shared-only. Pick one."
        )

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_no = state.step
        rng = jax.random.fold_in(state.rng, step_no)
        if axis_name is not None:
            rng = jax.random.fold_in(rng, lax.axis_index(axis_name))
        ks = jax.random.split(rng, 16)
        alpha_p_now = ap_sched(step_no)

        params, bn, opt = state.params, state.bn, state.opt

        # ================= D update (players G, C frozen at current values) ==
        bd = batch["d"]
        x_l = preprocess(ks[0], bd["x_l"])
        x_u = preprocess(ks[1], bd["x_u"])
        y_l = bd["y_l"]
        z_d = bd["z"].astype(cdt)
        y_gd = bd["y_g"]

        x_g_raw, _ = gen.apply(
            params["gen"], bn["gen"], z_d, y_gd, train=True, axis_name=axis_name
        )
        x_g = whiten_gen(lax.stop_gradient(x_g_raw))
        if share_fwd:
            # Measured FLOP lever (VERDICT r2 next-step #9, off by default —
            # docs/DESIGN.md deviations #11): D's pseudo-label forward and
            # C's unlabeled-stream forward use the SAME batch and the same
            # single classifier forward. The primal+vjp are taken here at
            # the current C params (exactly where C's update differentiates);
            # C's loss consumes the logits as an input and the cotangent is
            # grafted back through vjp_u below — eliminating 1 of the 10
            # classifier-forward-equivalents per iteration.
            def fwd_u(pc):
                lg, s_new = clf.apply(
                    pc, bn["clf"], x_u, train=True, rng=ks[2], axis_name=axis_name
                )
                return lg, s_new

            logits_c_u, vjp_u, bn_u = jax.vjp(fwd_u, params["clf"], has_aux=True)
        else:
            vjp_u = bn_u = None
            logits_c_u, _ = clf.apply(
                params["clf"], bn["clf"], x_u, train=True, rng=ks[2], axis_name=axis_name
            )
        y_c = losses.sample_pseudo_labels(ks[3], logits_c_u, pseudo_label_mode)

        b = x_l.shape[0]

        def d_loss_fn(pd):
            # One batched D forward over all 3 pair types — 3B rows for the
            # MXU instead of three small convs (D has no BN, so batching is
            # semantics-preserving).
            x_all = jnp.concatenate([x_l, x_u, x_g], axis=0)
            y_all = jnp.concatenate([y_l, y_c, y_gd], axis=0)
            logit_all, _ = disc.apply(
                pd, bn["disc"], x_all, y_all, train=True, rng=ks[4]
            )
            lr_real, lr_cla, lr_gen = logit_all[:b], logit_all[b : 2 * b], logit_all[2 * b :]
            loss = losses.d_loss(lr_real, lr_cla, lr_gen, alpha)
            return loss, losses.d_loss_terms(lr_real, lr_cla, lr_gen, alpha)

        (d_total, d_terms), gd = jax.value_and_grad(d_loss_fn, has_aux=True)(
            params["disc"]
        )
        gd = pmean(gd)
        upd_d, opt_d_new = opt_d.update(gd, opt["disc"], params["disc"])
        pd_new = optax.apply_updates(params["disc"], upd_d)

        # ================= G update (sees the UPDATED D) =====================
        bg = batch["g"]
        z_g = bg["z"].astype(cdt)
        y_gg = bg["y_g"]

        def g_loss_fn(pg):
            x_raw, bn_g_new = gen.apply(
                pg, bn["gen"], z_g, y_gg, train=True, axis_name=axis_name
            )
            logit_g, _ = disc.apply(
                pd_new, bn["disc"], whiten_gen(x_raw), y_gg, train=True, rng=ks[5]
            )
            loss = losses.g_loss(logit_g, alpha, bool(cfg.non_saturating_g))
            return loss, bn_g_new

        (g_total, bn_g_new), gg = jax.value_and_grad(g_loss_fn, has_aux=True)(
            params["gen"]
        )
        gg = pmean(gg)
        upd_g, opt_g_new = opt_g.update(gg, opt["gen"], params["gen"])
        pg_new = optax.apply_updates(params["gen"], upd_g)

        # ================= C update (sees UPDATED D and G) ===================
        bc = batch["c"]
        x_l_c = preprocess(ks[6], bc["x_l"])
        x_u_c = x_u if share_fwd else preprocess(ks[7], bc["x_u"])
        y_l_c = bc["y_l"]
        z_c = bc["z"].astype(cdt)
        y_gc = bc["y_g"]

        x_g_c_raw, _ = gen.apply(
            pg_new, bn_g_new, z_c, y_gc, train=True, axis_name=axis_name
        )
        x_g_c = whiten_gen(lax.stop_gradient(x_g_c_raw))

        fused_clf = bool(cfg.get("fused_clf_forward", False))

        def c_loss_shared(pc, log_u_in):
            # Shared-forward variant: the unlabeled-stream logits arrive as
            # an argument (primal computed pre-D-update, identical params);
            # BN stats chain u → l → g here instead of l → u → g.
            log_l, s1 = clf.apply(
                pc, bn_u, x_l_c, train=True, rng=ks[8], axis_name=axis_name
            )
            log_g, s3 = clf.apply(
                pc, s1, x_g_c, train=True, rng=ks[10], axis_name=axis_name
            )
            logit_d_cla, _ = disc.apply(
                pd_new, bn["disc"], x_u_c, y_c, train=True, rng=ks[12]
            )
            total, terms = losses.c_loss(
                log_l, y_l_c, logit_d_cla, log_u_in, y_c, log_g, y_gc,
                alpha, alpha_p_now, axis_name=axis_name,
            )
            return total, (s3, terms)

        def c_loss_fn(pc):
            if fused_clf:
                # Throughput option: one 3B-row classifier pass. BN then
                # normalizes across the three streams jointly (virtual-batch
                # semantics) — a deliberate deviation, off by default.
                bsz = x_l_c.shape[0]
                x_all = jnp.concatenate([x_l_c, x_u_c, x_g_c], axis=0)
                log_all, s3 = clf.apply(
                    pc, bn["clf"], x_all, train=True, rng=ks[8], axis_name=axis_name
                )
                log_l, log_u, log_g = (
                    log_all[:bsz], log_all[bsz : 2 * bsz], log_all[2 * bsz :]
                )
            else:
                # Three separate forwards (labeled / unlabeled / generated),
                # each normalizing with its own batch statistics — matching
                # the reference's three forward_pass graph ops. Running stats
                # chain through the calls; the final state is kept.
                log_l, s1 = clf.apply(
                    pc, bn["clf"], x_l_c, train=True, rng=ks[8], axis_name=axis_name
                )
                log_u, s2 = clf.apply(
                    pc, s1, x_u_c, train=True, rng=ks[9], axis_name=axis_name
                )
                log_g, s3 = clf.apply(
                    pc, s2, x_g_c, train=True, rng=ks[10], axis_name=axis_name
                )
            y_c2 = losses.sample_pseudo_labels(ks[11], log_u, pseudo_label_mode)
            logit_d_cla, _ = disc.apply(
                pd_new, bn["disc"], x_u_c, y_c2, train=True, rng=ks[12]
            )
            total, terms = losses.c_loss(
                log_l, y_l_c, logit_d_cla, log_u, y_c2, log_g, y_gc,
                alpha, alpha_p_now, axis_name=axis_name,
            )
            return total, (s3, terms)

        if share_fwd:
            (c_total, (bn_c_new, c_terms)), (gc, dlog_u) = jax.value_and_grad(
                c_loss_shared, argnums=(0, 1), has_aux=True
            )(params["clf"], logits_c_u)
            gc = jax.tree.map(jnp.add, gc, vjp_u(dlog_u)[0])
        else:
            (c_total, (bn_c_new, c_terms)), gc = jax.value_and_grad(
                c_loss_fn, has_aux=True
            )(params["clf"])
        gc = pmean(gc)
        upd_c, opt_c_new = opt_c.update(gc, opt["clf"], params["clf"])
        pc_new = optax.apply_updates(params["clf"], upd_c)

        new_state = TrainState(
            params={"gen": pg_new, "disc": pd_new, "clf": pc_new},
            bn={"gen": bn_g_new, "disc": bn["disc"], "clf": bn_c_new},
            opt={"gen": opt_g_new, "disc": opt_d_new, "clf": opt_c_new},
            step=step_no + 1,
            rng=state.rng,
        )
        metrics = {
            "loss_d": d_total,
            "loss_g": g_total,
            "loss_c": c_total,
            **d_terms,
            **c_terms,
            "alpha_p": alpha_p_now,
            "lr_frac": lr_now(step_no),
        }
        metrics = pmean(metrics)
        return new_state, metrics

    return step


def make_device_train_step(
    cfg,
    nets,
    optimizers,
    total_steps: int,
    zca_stats=None,
    axis_name: Optional[str] = None,
    pseudo_label_mode: str = "sample",
    n_shards: int = 1,
):
    """Device-resident data variant: ``(state, device_data) -> (state, metrics)``.

    The whole dataset lives in HBM (uint8 NHWC: CIFAR-10 is 37 MB, even
    STL-10's 100k unlabeled pool is ~2.6 GB — all fit a v5e chip many times
    over). Each step draws its per-player sub-batches *inside* the compiled
    program with RNG index gathers, so the hot loop does ZERO host↔device
    transfers — the logical endpoint of the north star's "double-buffered
    device feeding" [B]. Sampling is iid-uniform per step (vs the host
    sampler's epoch shuffles) — statistically equivalent for training;
    the host pipeline remains for strict epoch semantics or out-of-memory
    datasets.

    ``device_data`` = {"x_l","y_l","x_u"} jnp arrays (see
    ``pipeline.upload_device_data``). With a mesh, data is replicated and
    each shard draws ``batch_size // n_shards`` examples with a
    per-shard-folded key.
    """
    core = make_train_step(
        cfg, nets, optimizers, total_steps, zca_stats, axis_name, pseudo_label_mode
    )
    sample = _make_batch_sampler(cfg, axis_name, n_shards)

    def step(state: TrainState, data) -> Tuple[TrainState, Dict[str, jax.Array]]:
        return core(state, sample(state.rng, state.step, data))

    return step


def _make_batch_sampler(cfg, axis_name: Optional[str], n_shards: int):
    """(base_rng, step_no, device_data) -> per-player batch pytree, drawn
    with per-step key folds so any grouping of steps (one-by-one, vmapped
    for a scan chunk) yields the identical sample sequence."""
    b = int(cfg.batch_size) // max(n_shards, 1)
    z_dim = int(cfg.z_dim)
    n_classes = int(cfg.num_classes)
    # Under share_pseudo_forward the C update reuses D's unlabeled batch
    # (step() aliases x_u_c = x_u), so drawing x_u for the "c" stream would be
    # dead work: inside one jitted step XLA DCEs it, but the scan-chunked
    # path materializes the hoisted gather as a scan input, and the host
    # pipeline would ship the bytes over H2D. Skip the gather; the key-split
    # structure stays identical so every *used* field's sample sequence is
    # unchanged by the flag.
    share_fwd = bool(cfg.get("share_pseudo_forward", False))

    def sample(base_rng, step_no, data):
        rng = jax.random.fold_in(base_rng, step_no)
        rng = jax.random.fold_in(rng, 0x5A5A)  # sampling domain, disjoint from core's keys
        if axis_name is not None:
            rng = jax.random.fold_in(rng, lax.axis_index(axis_name))
        kd, kc, kg = jax.random.split(rng, 3)

        def noise(k):
            kz, ky = jax.random.split(k)
            return {
                "z": jax.random.normal(kz, (b, z_dim), jnp.float32),
                "y_g": jax.random.randint(ky, (b,), 0, n_classes, jnp.int32),
            }

        def stream(k, with_unlabeled=True):
            k1, k2, kn = jax.random.split(k, 3)
            il = jax.random.randint(k1, (b,), 0, data["x_l"].shape[0])
            out = {
                "x_l": jnp.take(data["x_l"], il, axis=0),
                "y_l": jnp.take(data["y_l"], il, axis=0),
                **noise(kn),
            }
            if with_unlabeled:
                iu = jax.random.randint(k2, (b,), 0, data["x_u"].shape[0])
                out["x_u"] = jnp.take(data["x_u"], iu, axis=0)
            return out

        return {
            "d": stream(kd),
            "c": stream(kc, with_unlabeled=not share_fwd),
            "g": noise(kg),
        }

    return sample


def _reduce_scan_metrics(ms, mode: str):
    """Collapse per-step stacked metrics from a scan chunk. ``"last"``
    reproduces what a per-step log interval would fetch; ``"mean"``
    averages over the chunk so loss curves keep per-iteration information
    instead of being chunk-subsampled (the reference logs every iteration;
    see DESIGN.md deviations #10)."""
    if mode == "mean":
        return jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)
    if mode == "last":
        return jax.tree.map(lambda a: a[-1], ms)
    raise ValueError(f"scan_metrics must be last|mean, got {mode!r}")


def make_scan_train_step(step_fn, n_steps: int, metrics_mode: str = "last"):
    """Chain ``n_steps`` device-data steps into ONE XLA program via
    ``lax.scan`` — zero Python dispatch between steps in the chunk.

    Requires a device-resident-data step (``make_device_train_step``): the
    ``data`` operand is loop-invariant; per-step batches are drawn inside the
    compiled body keyed by the advancing ``state.step``, so the scanned chunk
    computes exactly the same sequence of updates as ``n_steps`` separate
    calls. Metrics are reduced per ``metrics_mode`` (last step's values, or
    the in-chunk mean — ``cfg.scan_metrics``).
    """

    def scanned(state, data):
        def body(s, _):
            s2, m = step_fn(s, data)
            return s2, m

        state, ms = lax.scan(body, state, None, length=n_steps)
        return state, _reduce_scan_metrics(ms, metrics_mode)

    return scanned


def make_scan_device_train_step(
    cfg,
    nets,
    optimizers,
    total_steps: int,
    n_steps: int,
    zca_stats=None,
    axis_name: Optional[str] = None,
    pseudo_label_mode: str = "sample",
    n_shards: int = 1,
    metrics_mode: str = "last",
):
    """Scan chunk with HOISTED batch sampling: all ``n_steps`` per-player
    batches are drawn up front as one vmapped gather (one big HBM gather
    instead of n small ones inside the loop body — the in-body gathers
    profiled at ~1 ms/step), then ``lax.scan`` consumes them. Uses the same
    per-step key folds as ``make_device_train_step``, so the sample sequence
    — and therefore the whole update trajectory — is identical.
    """
    core = make_train_step(
        cfg, nets, optimizers, total_steps, zca_stats, axis_name, pseudo_label_mode
    )
    sample = _make_batch_sampler(cfg, axis_name, n_shards)

    def scanned(state: TrainState, data) -> Tuple[TrainState, Dict[str, jax.Array]]:
        steps = state.step + jnp.arange(n_steps, dtype=state.step.dtype)
        batches = jax.vmap(lambda s: sample(state.rng, s, data))(steps)
        state, ms = lax.scan(core, state, batches)
        return state, _reduce_scan_metrics(ms, metrics_mode)

    return scanned


def make_eval_step(cfg, nets, zca_stats=None, axis_name: Optional[str] = None):
    """Classifier test-error step (SURVEY.md §3.4): masked correct-count on a
    fixed-shape test batch, eval-mode BN (running stats), no augmentation."""
    _, _, clf = nets
    cdt = _compute_dtype(cfg)
    if zca_stats is not None:
        zca_mean = jnp.asarray(zca_stats.mean)
        zca_whiten = jnp.asarray(zca_stats.whiten)
    else:
        zca_mean = zca_whiten = None

    def eval_step(state: TrainState, batch) -> Dict[str, jax.Array]:
        x = ondevice.standard_pipeline(
            None,
            batch["x"],
            zca_mean=zca_mean,
            zca_whiten=zca_whiten,
            train=False,
            dtype=cdt,
            do_rescale=bool(cfg.get("rescale", True)),
        )
        logits, _ = clf.apply(state.params["clf"], state.bn["clf"], x, train=False)
        pred = jnp.argmax(logits, axis=-1)
        mask = batch["mask"]
        correct = jnp.sum((pred == batch["y"]) * mask)
        count = jnp.sum(mask)
        if axis_name is not None:
            correct = lax.psum(correct, axis_name)
            count = lax.psum(count, axis_name)
        return {"correct": correct, "count": count}

    return eval_step
