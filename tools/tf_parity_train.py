"""Full-training cross-implementation parity on real data (VERDICT r3 #4).

The 10-step TF parity test (tests/test_tf_step_parity.py) proves the
composed three-player step agrees with an independent TF implementation at
the estimator level, deterministically. The claim that matters for the
blocked CIFAR parity — *both implementations train to the same place* —
needs full training runs. This tool trains an INDEPENDENT TensorFlow-2
implementation of the complete mnist100 recipe — stochastic layers ON
(Gaussian noise, inverted dropout), SAMPLED pseudo-labels with the
REINFORCE mean-baseline estimator, the α_P warm-up gate, batch-norm
running statistics, linear lr decay, optax-convention Adam — to completion
on the real sklearn-digits dataset, for N seeds:

    python tools/tf_parity_train.py --data-dir /tmp/digits_data \
        --workdir /tmp/tf_parity [--seeds 1,2,3] [--epochs 300] \
        [--num-labeled 100] [--compare-json <summary.json> \
         --compare-key off_errors_pct]

The TF side shares ONLY the data loading/split with this framework
(``triplegan_tpu.data`` — identical class-balanced labeled subsets per
seed); every modeling/optimization line is TF-native, written from the
published algorithm (SURVEY.md Appendix A/B), not by calling framework
code. Final test errors per seed are written to
``<workdir>/tf_parity_summary_n<labels>.json``; with ``--compare-json``
(e.g. the sharefwd A/B's control arm — the same recipe trained by this
framework) it adds a two-sample permutation test on the mean difference
and an agreement verdict.

Cross-framework randomness is incommensurable (different PRNGs), so the
comparison is DISTRIBUTIONAL: same recipe, independent seeds, final-error
populations must overlap (docs/PARITY.md §9).

Reference lineage: [ref-expected] Training/train_triple_gan.py — this is
the closest this offline environment can get to "train the TF reference
and compare" (the real reference mount is empty; SURVEY.md §0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W_STD = 0.05  # same init law as triplegan_tpu.nn.layers (N(0, 0.05), zero b)


# ===========================================================================
# TF-native Triple-GAN (mnist100 recipe, stochastic layers on)
# ===========================================================================


def build_tf_model(cfg, seed: int):
    """Returns (params, bn_state, step_fn, eval_fn). All state is held in
    tf.Variables so one @tf.function graph drives the whole run."""
    import tensorflow as tf

    nc = int(cfg.num_classes)
    rng = np.random.RandomState(seed * 7919 + 13)
    gen_rng = tf.random.Generator.from_seed(seed * 104729 + 7)

    def nrm(*shape):
        return tf.Variable(rng.normal(0, W_STD, size=shape).astype(np.float32))

    def zeros(*shape):
        return tf.Variable(np.zeros(shape, np.float32))

    def ones(*shape):
        return tf.Variable(np.ones(shape, np.float32))

    def bn_make(c):
        return {"scale": ones(c), "bias": zeros(c)}, \
               {"mean": zeros(c), "var": ones(c)}

    # ---- parameter trees (same shapes/init law as the JAX side) -----------
    gw = tuple(cfg.gen.widths)
    s0 = cfg.image_size // (2 ** len(gw))
    P = {"gen": {}, "disc": {}, "clf": {}}
    S = {"gen": {}, "clf": {}}  # BN running stats (D has none)

    P["gen"]["dense"] = {"w": nrm(cfg.z_dim + nc, s0 * s0 * gw[0]),
                         "b": zeros(s0 * s0 * gw[0])}
    P["gen"]["bn0"], S["gen"]["bn0"] = bn_make(gw[0])
    prev = gw[0]
    for i, w in enumerate(gw[1:]):
        P["gen"][f"deconv{i}"] = {"w": nrm(cfg.gen.kernel, cfg.gen.kernel, prev, w),
                                  "b": zeros(w)}
        P["gen"][f"bn{i + 1}"], S["gen"][f"bn{i + 1}"] = bn_make(w)
        prev = w
    P["gen"]["deconv_out"] = {
        "v": nrm(cfg.gen.kernel, cfg.gen.kernel, prev, cfg.channels),
        "g": ones(cfg.channels), "b": zeros(cfg.channels)}

    dw, ds = tuple(cfg.disc.widths), tuple(cfg.disc.strides)
    in_ch = cfg.channels + nc
    for i, (w, s) in enumerate(zip(dw, ds)):
        P["disc"][f"conv{i}"] = {"v": nrm(3, 3, in_ch, w), "g": ones(w),
                                 "b": zeros(w)}
        in_ch = w
        if s == 2 and bool(cfg.disc.label_reconcat) and i + 1 < len(dw):
            in_ch += nc
    P["disc"]["head"] = {"v": nrm(dw[-1] + nc, 1), "g": ones(1), "b": zeros(1)}

    blocks = tuple(tuple(b) for b in cfg.clf.conv_blocks)
    tail = tuple(cfg.clf.tail)
    in_ch = cfg.channels
    for bi, block in enumerate(blocks):
        for ci, w in enumerate(block):
            name = f"b{bi}c{ci}"
            P["clf"][name] = {"w": nrm(3, 3, in_ch, w)}  # use_bias=False
            P["clf"][f"{name}_bn"], S["clf"][f"{name}_bn"] = bn_make(w)
            in_ch = w
    for ti, w in enumerate(tail):
        name = f"t{ti}"
        k = 3 if ti == 0 else 1
        P["clf"][name] = {"w": nrm(k, k, in_ch, w)}
        P["clf"][f"{name}_bn"], S["clf"][f"{name}_bn"] = bn_make(w)
        in_ch = w
    P["clf"]["head"] = {"w": nrm(in_ch, nc), "b": zeros(nc)}

    # ---- layer helpers ------------------------------------------------------
    def wn(v, g):
        axes = list(range(len(v.shape) - 1))
        return v * (g / tf.sqrt(tf.reduce_sum(tf.square(v), axis=axes) + 1e-12))

    def bn(p, s, x, train, update, momentum=0.99, eps=1e-3):
        """Train: batch stats; running-stat Variables advance only when
        ``update`` (the JAX step updates each network's stats ONLY during
        its own player's pass — cross-forwards run on batch stats but
        discard the state update, train/step.py module docstring). Eval:
        running stats."""
        axes = (0, 1, 2) if len(x.shape) == 4 else (0,)
        if train:
            mean = tf.reduce_mean(x, axis=axes)
            var = tf.maximum(tf.reduce_mean(tf.square(x), axis=axes)
                             - tf.square(mean), 0.0)
            if update:
                s["mean"].assign(momentum * s["mean"] + (1 - momentum) * mean)
                s["var"].assign(momentum * s["var"] + (1 - momentum) * var)
        else:
            mean, var = s["mean"], s["var"]
        k = p["scale"] * tf.math.rsqrt(var + eps)
        return x * k + (p["bias"] - mean * k)

    def lrelu(x, slope):
        return tf.where(x >= 0.0, x, slope * x)

    def noise(x, sigma, train):
        if not train or sigma <= 0:
            return x
        return x + sigma * gen_rng.normal(tf.shape(x))

    def dropout(x, rate, train):
        if not train or rate <= 0:
            return x
        keep = 1.0 - rate
        mask = tf.cast(gen_rng.uniform(tf.shape(x)) < keep, tf.float32)
        return x * mask / keep

    def onehot(y):
        return tf.one_hot(y, nc, dtype=tf.float32)

    def label_planes(x, y1h):
        shp = tf.shape(x)
        planes = tf.broadcast_to(y1h[:, None, None, :],
                                 (shp[0], shp[1], shp[2], nc))
        return tf.concat([x, planes], axis=-1)

    def deconv(x, w, out_ch, stride=2):
        # HWIO forward kernel → tf.conv2d_transpose via flip+swap
        w_tf = tf.transpose(w[::-1, ::-1], (0, 1, 3, 2))
        shp = tf.shape(x)
        return tf.nn.conv2d_transpose(
            x, w_tf, output_shape=(shp[0], shp[1] * stride, shp[2] * stride,
                                   out_ch),
            strides=stride, padding="SAME")

    # ---- networks ----------------------------------------------------------
    def gen_fwd(p, s, z, y, train, update=False):
        h = tf.matmul(tf.concat([z, onehot(y)], -1), p["dense"]["w"]) \
            + p["dense"]["b"]
        h = tf.reshape(h, (-1, s0, s0, gw[0]))
        h = tf.nn.relu(bn(p["bn0"], s["bn0"], h, train, update))
        for i, w in enumerate(gw[1:]):
            h = deconv(h, p[f"deconv{i}"]["w"], w) + p[f"deconv{i}"]["b"]
            h = tf.nn.relu(bn(p[f"bn{i + 1}"], s[f"bn{i + 1}"], h, train,
                              update))
        po = p["deconv_out"]
        h = deconv(h, wn(po["v"], po["g"]), cfg.channels) + po["b"]
        return tf.tanh(h)

    def disc_fwd(p, x, y, train):
        y1h = onehot(y)
        h = label_planes(x, y1h)
        h = noise(h, float(cfg.disc.input_noise), train)
        h = dropout(h, float(cfg.disc.input_dropout), train)
        for i, (w, s) in enumerate(zip(dw, ds)):
            k = wn(p[f"conv{i}"]["v"], p[f"conv{i}"]["g"])
            h = tf.nn.conv2d(h, k, strides=s, padding="SAME") + p[f"conv{i}"]["b"]
            h = lrelu(h, 0.2)
            if s == 2:
                h = dropout(h, float(cfg.disc.block_dropout), train)
                if bool(cfg.disc.label_reconcat) and i + 1 < len(dw):
                    h = label_planes(h, y1h)
        h = tf.reduce_mean(h, axis=(1, 2))
        h = tf.concat([h, y1h], axis=-1)
        ph = p["head"]
        return (tf.matmul(h, wn(ph["v"], ph["g"])) + ph["b"])[:, 0]

    def clf_fwd(p, s, x, train, update=False):
        h = noise(x, float(cfg.clf.input_noise), train)
        for bi, block in enumerate(blocks):
            for ci in range(len(block)):
                name = f"b{bi}c{ci}"
                h = tf.nn.conv2d(h, p[name]["w"], strides=1, padding="SAME")
                h = lrelu(bn(p[f"{name}_bn"], s[f"{name}_bn"], h, train,
                             update), 0.1)
            h = tf.nn.max_pool2d(h, ksize=2, strides=2, padding="SAME")
            h = dropout(h, float(cfg.clf.block_dropout), train)
        for ti in range(len(tail)):
            name = f"t{ti}"
            pad = "VALID" if ti == 0 else "SAME"
            h = tf.nn.conv2d(h, p[name]["w"], strides=1, padding=pad)
            h = lrelu(bn(p[f"{name}_bn"], s[f"{name}_bn"], h, train, update),
                      0.1)
        h = tf.reduce_mean(h, axis=(1, 2))
        return tf.matmul(h, p["head"]["w"]) + p["head"]["b"]

    return P, S, (gen_fwd, disc_fwd, clf_fwd), gen_rng


def make_adam(tree, base_lr, decay_start, total, b1, b2, eps):
    """optax.adam conventions as tf.Variables: bias correction at t
    (1-based), linear-decay schedule evaluated at t-1."""
    import tensorflow as tf

    flat = tf.nest.flatten(tree)
    m = [tf.Variable(tf.zeros_like(v)) for v in flat]
    v_ = [tf.Variable(tf.zeros_like(v)) for v in flat]
    t = tf.Variable(0.0)

    def update(grads):
        t.assign_add(1.0)
        frac = tf.clip_by_value(
            (t - 1.0 - decay_start) / max(total - decay_start, 1), 0.0, 1.0)
        lr = base_lr * (1.0 - frac)
        for p, g, mi, vi in zip(flat, tf.nest.flatten(grads), m, v_):
            mi.assign(b1 * mi + (1 - b1) * g)
            vi.assign(b2 * vi + (1 - b2) * g * g)
            mh = mi / (1 - tf.pow(b1, t))
            vh = vi / (1 - tf.pow(b2, t))
            p.assign_sub(lr * mh / (tf.sqrt(vh) + eps))

    return update


def train_tf(cfg, data, epochs, warmup_epochs, seed, log_every=600,
             zca_stats=None):
    """One full TF training run; returns final test error in [0, 1].

    Round 5 (VERDICT r4 #2): the input pipeline — ZCA whitening and the
    translate/flip augmentation — is implemented TF-NATIVE here (pad +
    per-example gather-crop + reverse + one whitening matmul), composed in
    the configured ``aug_order``, so a full training run cross-validates
    the whole data path against this framework's on-device reformulations
    (docs/PARITY.md §12), not just the player updates."""
    import tensorflow as tf

    batch = int(cfg.batch_size)
    steps_per_epoch = max(len(data.x_unlabel) // batch, 1)
    total = epochs * steps_per_epoch
    warmup = warmup_epochs * steps_per_epoch
    alpha, alpha_p = float(cfg.alpha), float(cfg.alpha_p)
    decay_start = int(cfg.lr_decay_start_frac * total)

    P, S, (gen_fwd, disc_fwd, clf_fwd), gen_rng = build_tf_model(cfg, seed)

    # ---- TF-native input pipeline (ZCA + translate-crop + flip) -----------
    has_zca = bool(cfg.zca)
    if has_zca and zca_stats is None:
        raise ValueError("cfg.zca=True but no zca_stats passed")
    if has_zca:
        zca_mean = tf.constant(zca_stats.mean.astype(np.float32))
        zca_whiten = tf.constant(zca_stats.whiten.astype(np.float32))
    radius = int(cfg.aug_translate)
    do_flip = bool(cfg.aug_flip)
    zca_first = str(cfg.get("aug_order", "zca_first")) == "zca_first"
    tf_pad_mode = {"reflect": "REFLECT", "zeros": "CONSTANT"}[
        str(cfg.get("aug_pad_mode", "reflect"))]
    img_hw = int(cfg.image_size)

    def whiten(x):
        shp = tf.shape(x)
        flat = tf.reshape(x, (shp[0], -1))
        white = tf.matmul(flat - zca_mean, zca_whiten, transpose_b=True)
        return tf.reshape(white, shp)

    def translate_crop(x):
        """Conventional TF pad + per-example random crop (the reference's
        tf.data lineage) — deliberately NOT this framework's one-hot-MXU
        formulation, so the two implementations are independent."""
        n = tf.shape(x)[0]
        xp = tf.pad(x, [[0, 0], [radius, radius], [radius, radius], [0, 0]],
                    mode=tf_pad_mode)
        off_y = gen_rng.uniform((n,), 0, 2 * radius + 1, dtype=tf.int32)
        off_x = gen_rng.uniform((n,), 0, 2 * radius + 1, dtype=tf.int32)
        rows = off_y[:, None] + tf.range(img_hw)[None, :]
        xp = tf.gather(xp, rows, axis=1, batch_dims=1)
        cols = off_x[:, None] + tf.range(img_hw)[None, :]
        return tf.gather(xp, cols, axis=2, batch_dims=1)

    def rand_flip(x):
        n = tf.shape(x)[0]
        m = gen_rng.uniform((n,)) < 0.5
        return tf.where(m[:, None, None, None], tf.reverse(x, [2]), x)

    def preprocess(x):
        """Train-mode pipeline on rescaled [-1,1] images, mirroring
        data/ondevice.py standard_pipeline's configured order."""
        if has_zca and zca_first:
            x = whiten(x)
        if radius > 0:
            x = translate_crop(x)
        if do_flip:
            x = rand_flip(x)
        if has_zca and not zca_first:
            x = whiten(x)
        return x

    def whiten_gen(x):
        """G emits raw-pixel-space images; whiten (never augment) before
        D/C score them — train/step.py whiten_gen."""
        return whiten(x) if has_zca else x
    adam = {
        "gen": make_adam(P["gen"], cfg.lr_g, decay_start, total,
                         cfg.adam_b1, cfg.adam_b2, cfg.adam_eps),
        "disc": make_adam(P["disc"], cfg.lr_d, decay_start, total,
                          cfg.adam_b1, cfg.adam_b2, cfg.adam_eps),
        "clf": make_adam(P["clf"], cfg.lr_c, decay_start, total,
                         cfg.adam_b1, cfg.adam_b2, cfg.adam_eps),
    }

    x_l_all = tf.constant(data.x_label.astype(np.float32) / 127.5 - 1.0)
    y_l_all = tf.constant(data.y_label.astype(np.int32))
    x_u_all = tf.constant(data.x_unlabel.astype(np.float32) / 127.5 - 1.0)
    n_l, n_u = len(data.x_label), len(data.x_unlabel)
    nc, zd = int(cfg.num_classes), int(cfg.z_dim)

    def draw_stream(with_u=True):
        il = gen_rng.uniform((batch,), 0, n_l, dtype=tf.int32)
        out = {"x_l": tf.gather(x_l_all, il), "y_l": tf.gather(y_l_all, il),
               "z": gen_rng.normal((batch, zd)),
               "y_g": gen_rng.uniform((batch,), 0, nc, dtype=tf.int32)}
        if with_u:
            iu = gen_rng.uniform((batch,), 0, n_u, dtype=tf.int32)
            out["x_u"] = tf.gather(x_u_all, iu)
        return out

    @tf.function
    def step(alpha_p_now):
        # ---- D update (one batched forward over the 3 pair types) ---------
        # Cross-forwards (G's sample, C's pseudo-labeling) run in train mode
        # on batch statistics but do NOT advance running stats — mirroring
        # the JAX step's owning-player-only stat policy.
        bd = draw_stream()
        bd["x_l"] = preprocess(bd["x_l"])
        bd["x_u"] = preprocess(bd["x_u"])  # shared by C's pseudo-label
        # forward and D's (x_u, y_c) pair, like the JAX step's single x_u
        x_g = whiten_gen(tf.stop_gradient(
            gen_fwd(P["gen"], S["gen"], bd["z"], bd["y_g"], True)))
        logits_c_u = clf_fwd(P["clf"], S["clf"], bd["x_u"], True)
        y_c = tf.cast(tf.random.stateless_categorical(
            logits_c_u, 1,
            seed=tf.cast(gen_rng.uniform((2,), 0, 2**30, tf.int32), tf.int64),
        )[:, 0], tf.int32)
        with tf.GradientTape() as tape:
            x_all = tf.concat([bd["x_l"], bd["x_u"], x_g], 0)
            y_all = tf.concat([bd["y_l"], y_c, bd["y_g"]], 0)
            logit = disc_fwd(P["disc"], x_all, y_all, True)
            lr_r, lr_c, lr_g = (logit[:batch], logit[batch:2 * batch],
                                logit[2 * batch:])
            loss_d = (tf.reduce_mean(tf.math.softplus(-lr_r))
                      + alpha * tf.reduce_mean(tf.math.softplus(lr_c))
                      + (1 - alpha) * tf.reduce_mean(tf.math.softplus(lr_g)))
        adam["disc"](tape.gradient(loss_d, P["disc"]))

        # ---- G update (sees updated D) -------------------------------------
        bg = draw_stream(with_u=False)
        with tf.GradientTape() as tape:
            x_raw = gen_fwd(P["gen"], S["gen"], bg["z"], bg["y_g"], True,
                            update=True)  # G's own pass advances its stats
            logit_g = disc_fwd(P["disc"], whiten_gen(x_raw), bg["y_g"], True)
            loss_g = (1 - alpha) * tf.reduce_mean(tf.math.softplus(-logit_g))
        adam["gen"](tape.gradient(loss_g, P["gen"]))

        # ---- C update (sees updated D and G) -------------------------------
        bc = draw_stream()
        bc["x_l"] = preprocess(bc["x_l"])
        bc["x_u"] = preprocess(bc["x_u"])
        x_g_c = whiten_gen(tf.stop_gradient(
            gen_fwd(P["gen"], S["gen"], bc["z"], bc["y_g"], True)))
        with tf.GradientTape() as tape:
            # C's own pass: stats chain l → u → g (Variables update in place,
            # exactly the JAX step's s1→s2→s3 chain).
            log_l = clf_fwd(P["clf"], S["clf"], bc["x_l"], True, update=True)
            log_u = clf_fwd(P["clf"], S["clf"], bc["x_u"], True, update=True)
            log_g = clf_fwd(P["clf"], S["clf"], x_g_c, True, update=True)
            y_c2 = tf.cast(tf.random.stateless_categorical(
                tf.stop_gradient(log_u), 1,
                seed=tf.cast(gen_rng.uniform((2,), 0, 2**30, tf.int32),
                             tf.int64))[:, 0], tf.int32)
            logit_d = disc_fwd(P["disc"], bc["x_u"], y_c2, True)
            w = tf.stop_gradient(-tf.math.softplus(logit_d))
            w = w - tf.reduce_mean(w)
            logp_u = tf.nn.log_softmax(log_u, -1)
            picked = tf.gather(logp_u, y_c2[:, None], batch_dims=1)[:, 0]
            r_l = -tf.reduce_mean(tf.gather(
                tf.nn.log_softmax(log_l, -1), bc["y_l"][:, None],
                batch_dims=1)[:, 0])
            l_adv = alpha * tf.reduce_mean(w * picked)
            r_p = -tf.reduce_mean(tf.gather(
                tf.nn.log_softmax(log_g, -1), bc["y_g"][:, None],
                batch_dims=1)[:, 0])
            loss_c = r_l + l_adv + alpha_p_now * r_p
        adam["clf"](tape.gradient(loss_c, P["clf"]))
        return loss_d, loss_g, loss_c, r_l

    losses_log = []
    for i in range(total):
        ap = alpha_p if i >= warmup else 0.0
        ld, lg, lc, rl = step(tf.constant(ap, tf.float32))
        if log_every and (i + 1) % log_every == 0:
            losses_log.append(
                {"step": i + 1, "loss_d": float(ld), "loss_g": float(lg),
                 "loss_c": float(lc), "c_sup": float(rl)})
            print(f"  tf seed={seed} step {i + 1}/{total} "
                  f"loss_d={float(ld):.3f} loss_g={float(lg):.3f} "
                  f"loss_c={float(lc):.3f} c_sup={float(rl):.3f}", flush=True)

    # ---- final eval: running BN stats, no stochastic layers, whitened
    # (no augmentation) inputs — eval/step.py make_eval_step semantics ----
    xt = tf.constant(data.x_test.astype(np.float32) / 127.5 - 1.0)
    if has_zca:
        xt = whiten(xt)
    logits = clf_fwd(P["clf"], S["clf"], xt, False)
    pred = np.argmax(logits.numpy(), axis=-1)
    err = float((pred != data.y_test).mean())
    return err, losses_log


def equivalence_analysis(a: list, b: list, margin_pct: float = 2.0,
                         n_boot: int = 20000, seed: int = 0) -> dict:
    """Explicit equivalence band for the cross-implementation comparison
    (VERDICT r4 next-step #4): a p-value alone cannot distinguish "the
    implementations agree" from "the sample is too small to see a gap".

    Reports the bootstrap 90% percentile CI on mean(a) − mean(b) and a
    TOST verdict: the implementations are declared EQUIVALENT within
    ``margin_pct`` iff the whole 90% CI lies inside ±margin (the standard
    two-one-sided-tests construction at α=0.05). Default margin ±2.0 pts:
    the 500-image digits test set alone contributes ±1.1 pt of per-seed
    sampling noise (docs/PARITY.md §8), so a systematic gap under 2 pts is
    inside the measurement's own resolution."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    rng = np.random.RandomState(seed)
    diffs = np.empty(n_boot)
    for i in range(n_boot):
        diffs[i] = (a[rng.randint(0, len(a), len(a))].mean()
                    - b[rng.randint(0, len(b), len(b))].mean())
    lo, hi = np.percentile(diffs, [5.0, 95.0])
    return {
        "mean_diff_pct": round(float(a.mean() - b.mean()), 3),
        "diff_ci90_pct": [round(float(lo), 3), round(float(hi), 3)],
        "equiv_margin_pct": margin_pct,
        "tost_equivalent": bool(lo > -margin_pct and hi < margin_pct),
    }


def two_sample_perm_p(a: list, b: list, n_iter: int = 20000, seed: int = 0) -> float:
    """Two-sided permutation test on the difference of means of two
    INDEPENDENT samples (implementations use unrelated PRNGs, so pairing by
    seed number would be fiction)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    obs = abs(a.mean() - b.mean())
    pool = np.concatenate([a, b])
    rng = np.random.RandomState(seed)
    hits = 0
    for _ in range(n_iter):
        rng.shuffle(pool)
        if abs(pool[: len(a)].mean() - pool[len(a):].mean()) >= obs - 1e-12:
            hits += 1
    return (hits + 1) / (n_iter + 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--config", default="mnist100",
                    help="framework config whose recipe/architecture the TF "
                         "side rebuilds (networks are config-driven)")
    ap.add_argument("--dataset", default="digits",
                    help="prepared dataset name under --data-dir")
    ap.add_argument("--override", action="append", default=[], metavar="K=V",
                    help="config override (same syntax as the CLI's --set), "
                         "e.g. epochs=20 image_size=16")
    ap.add_argument("--num-labeled", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--warmup-epochs", type=int, default=100)
    ap.add_argument("--log-every", type=int, default=600,
                    help="loss-curve cadence in steps (use ~steps/10 for "
                         "short recipes or the curve stays empty)")
    ap.add_argument("--compare-json", default=None,
                    help="summary JSON holding this framework's errors for "
                         "the same recipe (e.g. sharefwd_ab_digits_n100.json)")
    ap.add_argument("--compare-key", default="off_errors_pct")
    ap.add_argument("--resume", action="store_true",
                    help="skip seeds whose per-seed result JSON already "
                         "exists in --workdir (each TF seed trains ~1 h on "
                         "this CPU; a crash mid-campaign must not retrain "
                         "finished seeds)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",") if s]
    if len(set(seeds)) != len(seeds):
        ap.error(f"duplicate seeds in --seeds {args.seeds!r}")
    if args.num_labeled % 10 != 0 or args.num_labeled <= 0:
        ap.error("--num-labeled must be a positive multiple of 10")

    if args.dry_run:
        print(f"would train TF {args.config}-recipe on {args.dataset}: "
              f"seeds={seeds} epochs={args.epochs} "
              f"warmup={args.warmup_epochs} n={args.num_labeled} "
              f"overrides={args.override}")
        return 0

    # TF is CPU-only here and must not grab the TPU tunnel.
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    from triplegan_tpu.cli import _apply_overrides
    from triplegan_tpu.configs import get_config
    from triplegan_tpu.data.datasets import load_dataset

    cfg = get_config(args.config)
    cfg.dataset = args.dataset
    _apply_overrides(cfg, args.override)
    zca_stats = None
    if cfg.zca:
        from triplegan_tpu.data.zca import ZCAStats

        stats_path = os.path.join(args.data_dir, args.dataset,
                                  "zca_stats.npz")
        if not os.path.exists(stats_path):
            raise FileNotFoundError(
                f"cfg.zca=True needs prepare-time statistics at {stats_path}"
                f" — run `python -m triplegan_tpu.cli prepare --dataset "
                f"{args.dataset} --data-dir {args.data_dir}` first")
        zca_stats = ZCAStats.load(stats_path)
    os.makedirs(args.workdir, exist_ok=True)

    errors, curves = [], {}
    for seed in seeds:
        # digits keeps the historical file names (live campaign resume +
        # committed docs/assets reference them); other recipes encode
        # dataset+config so a shared workdir can't cross-cache.
        tag = ("" if args.dataset == "digits" and args.config == "mnist100"
               else f"{args.dataset}_{args.config}_")
        seed_path = os.path.join(
            args.workdir, f"tf_{tag}seed{seed}_n{args.num_labeled}.json")
        if args.resume and os.path.exists(seed_path):
            with open(seed_path) as f:
                rec = json.load(f)
            err, log = rec["error"], rec["curve"]
            print(f"=== TF full training, seed {seed}: cached "
                  f"({100 * err:.2f}%), skipping ===", flush=True)
        else:
            data = load_dataset(args.data_dir, args.dataset, args.num_labeled,
                                cfg.num_classes, seed)
            want = (cfg.image_size, cfg.image_size, cfg.channels)
            got = tuple(data.x_test.shape[1:])
            if got != want:
                raise ValueError(
                    f"dataset '{args.dataset}' images are {got} but the "
                    f"config expects {want} — use --override image_size=... "
                    f"channels=...")
            print(f"=== TF full training, seed {seed} ===", flush=True)
            err, log = train_tf(cfg, data, args.epochs, args.warmup_epochs,
                                seed, log_every=args.log_every,
                                zca_stats=zca_stats)
            print(f"  tf seed={seed} final test error: {100 * err:.2f}%",
                  flush=True)
            with open(seed_path, "w") as f:
                json.dump({"seed": seed, "error": err, "curve": log}, f)
        errors.append(err)
        curves[str(seed)] = log

    summary = {
        "implementation": "independent-tf2",
        "recipe": f"{args.config}-on-{args.dataset}",
        "overrides": args.override,
        "zca": bool(cfg.zca),
        "aug_translate": int(cfg.aug_translate),
        "aug_flip": bool(cfg.aug_flip),
        "num_labeled": args.num_labeled,
        "epochs": args.epochs,
        "seeds": seeds,
        "tf_errors_pct": [round(100 * e, 2) for e in errors],
        "tf_mean_pct": round(100 * float(np.mean(errors)), 2),
        "tf_std_pct": round(100 * float(np.std(errors)), 2),
        "loss_curves": curves,
    }
    if args.compare_json:
        with open(args.compare_json) as f:
            ours = json.load(f)[args.compare_key]
        tf_pct = [100 * e for e in errors]
        p = two_sample_perm_p(tf_pct, ours)
        summary["ours_errors_pct"] = ours
        summary["ours_mean_pct"] = round(float(np.mean(ours)), 2)
        summary["perm_test_p"] = round(p, 4)
        summary["equivalence"] = equivalence_analysis(tf_pct, ours)
        summary["verdict"] = "AGREE" if p >= 0.05 else "DISAGREE"

    tag = ("" if args.dataset == "digits" and args.config == "mnist100"
           else f"{args.dataset}_{args.config}_")
    path = os.path.join(args.workdir,
                        f"tf_parity_summary_{tag}n{args.num_labeled}.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "loss_curves"},
                     indent=2))
    print(f"summary → {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
