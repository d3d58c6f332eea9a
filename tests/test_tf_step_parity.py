"""Full-train-step parity vs an INDEPENDENT TensorFlow implementation
(VERDICT r1 next-step #3; SURVEY.md §4.2–4.4).

Op-level parity (test_tf_parity.py) does not validate the composed
three-player dynamics. Here a tiny Triple-GAN is implemented from scratch in
TF-2 eager (layers, losses, manual Adam) following the published algorithm —
NOT by calling any triplegan_tpu code on the TF side — with the same initial
weights injected, the same fixed batches, argmax pseudo-labels and all
stochastic layers disabled. Per-step L_D / L_G / L_C (and term breakdowns)
must agree over 10 steps, and the final parameters must match, within f32
tolerance.

Semantics replicated on the TF side (the things this test actually guards):
  * sequential D→G→C updates inside one iteration, with D's NEW params
    visible to G's loss and D's+G's NEW params/BN visible to C's loss;
  * train-mode BN normalizes with batch statistics (running stats never feed
    back into training-mode forwards, so they are not tracked here);
  * weight-norm folding w = g·v/||v||, the REINFORCE pseudo-label surrogate
    with mean baseline, α-weighted softplus loss forms, α_P-weighted R_P;
  * optax.adam conventions: bias correction at t (1-based), linear-decay
    schedule evaluated at t−1.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.helpers import deterministic_config, tiny_data  # noqa: E402
from triplegan_tpu.configs.base import make_networks  # noqa: E402
from triplegan_tpu.data.pipeline import BatchSampler  # noqa: E402
from triplegan_tpu.train.schedule import make_optimizers  # noqa: E402
from triplegan_tpu.train.state import create_state  # noqa: E402
from triplegan_tpu.train.step import make_train_step  # noqa: E402

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive

N_STEPS = 10


def _cfg():
    cfg = deterministic_config()
    cfg.batch_size = 8
    cfg.alpha_p_warmup_epochs = 0  # R_P active from step 0
    # three D convs so the intermediate label re-concat path is exercised
    cfg.disc.widths = (16, 16, 16)
    cfg.disc.strides = (1, 2, 1)
    return cfg


def _np(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float32), tree)


# ===========================================================================
# Independent TF implementation
# ===========================================================================


def _wn(v, g):
    v = tf.convert_to_tensor(v)
    axes = list(range(len(v.shape) - 1))
    norm = tf.sqrt(tf.reduce_sum(tf.square(v), axis=axes) + 1e-12)
    return v * (g / norm)


def _bn_train(p, x, eps=1e-3):
    mean = tf.reduce_mean(x, axis=(0, 1, 2) if x.shape.rank == 4 else (0,))
    mean_sq = tf.reduce_mean(tf.square(x), axis=(0, 1, 2) if x.shape.rank == 4 else (0,))
    var = tf.maximum(mean_sq - tf.square(mean), 0.0)
    k = p["scale"] * tf.math.rsqrt(var + eps)
    return x * k + (p["bias"] - mean * k)


def _lrelu(x, slope):
    return tf.where(x >= 0, x, slope * x)


def _deconv(x, w_ours, out_ch, stride=2):
    """Our HWIO (k,k,in,out) transpose_kernel=False kernel → TF
    conv2d_transpose via the documented flip+swap reparameterization."""
    w_tf = tf.transpose(w_ours[::-1, ::-1], (0, 1, 3, 2))
    n, h, wd = x.shape[0], x.shape[1], x.shape[2]
    return tf.nn.conv2d_transpose(
        x, w_tf, output_shape=(n, h * stride, wd * stride, out_ch), strides=stride,
        padding="SAME",
    )


def _onehot(y, n):
    return tf.one_hot(y, n, dtype=tf.float32)


def _label_planes(x, y1h):
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    planes = tf.broadcast_to(y1h[:, None, None, :], (n, h, w, y1h.shape[-1]))
    return tf.concat([x, planes], axis=-1)


class TFTripleGAN:
    """Functional tiny Triple-GAN in TF eager with externally-held params."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.nc = cfg.num_classes

    # --- generator ---------------------------------------------------------
    def gen(self, p, z, y):
        cfg = self.cfg
        widths = tuple(cfg.gen.widths)
        s0 = cfg.image_size // (2 ** len(widths))
        h = tf.matmul(tf.concat([z, _onehot(y, self.nc)], axis=-1), p["dense"]["w"])
        h = h + p["dense"]["b"]
        h = tf.reshape(h, (-1, s0, s0, widths[0]))
        h = tf.nn.relu(_bn_train(p["bn0"], h))
        for i, w in enumerate(widths[1:]):
            h = _deconv(h, p[f"deconv{i}"]["w"], w) + p[f"deconv{i}"]["b"]
            h = tf.nn.relu(_bn_train(p[f"bn{i + 1}"], h))
        po = p["deconv_out"]
        wn = _wn(po["v"], po["g"])
        h = _deconv(h, wn, cfg.channels) + po["b"]
        return tf.tanh(h)

    # --- discriminator -----------------------------------------------------
    def disc(self, p, x, y):
        cfg = self.cfg
        widths, strides = tuple(cfg.disc.widths), tuple(cfg.disc.strides)
        y1h = _onehot(y, self.nc)
        h = _label_planes(x, y1h)
        for i, (w, s) in enumerate(zip(widths, strides)):
            k = _wn(p[f"conv{i}"]["v"], p[f"conv{i}"]["g"])
            h = tf.nn.conv2d(h, k, strides=s, padding="SAME") + p[f"conv{i}"]["b"]
            h = _lrelu(h, 0.2)
            if s == 2 and i + 1 < len(widths):
                h = _label_planes(h, y1h)  # intermediate label re-concat
        h = tf.reduce_mean(h, axis=(1, 2))
        h = tf.concat([h, y1h], axis=-1)
        ph = p["head"]
        logit = tf.matmul(h, _wn(ph["v"], ph["g"])) + ph["b"]
        return logit[:, 0]

    # --- classifier ---------------------------------------------------------
    def clf(self, p, x):
        cfg = self.cfg
        h = x
        for bi, block in enumerate(tuple(tuple(b) for b in cfg.clf.conv_blocks)):
            for ci in range(len(block)):
                name = f"b{bi}c{ci}"
                h = tf.nn.conv2d(h, p[name]["w"], strides=1, padding="SAME")
                h = _lrelu(_bn_train(p[f"{name}_bn"], h), 0.1)
            h = tf.nn.max_pool2d(h, ksize=2, strides=2, padding="SAME")
        for ti in range(len(tuple(cfg.clf.tail))):
            name = f"t{ti}"
            pad = "VALID" if ti == 0 else "SAME"
            h = tf.nn.conv2d(h, p[name]["w"], strides=1, padding=pad)
            h = _lrelu(_bn_train(p[f"{name}_bn"], h), 0.1)
        h = tf.reduce_mean(h, axis=(1, 2))
        return tf.matmul(h, p["head"]["w"]) + p["head"]["b"]

    # --- losses -------------------------------------------------------------
    @staticmethod
    def log_sig(logit):
        return -tf.math.softplus(-logit)

    @staticmethod
    def log_1m_sig(logit):
        return -tf.math.softplus(logit)

    @staticmethod
    def ce(logits, labels):
        logp = tf.nn.log_softmax(logits, axis=-1)
        picked = tf.gather(logp, labels, batch_dims=1)
        return -tf.reduce_mean(picked)


def _ce_gather(logp, labels):
    return tf.gather(logp, labels[:, None], batch_dims=1)[:, 0]


class ManualAdam:
    """Exact optax.adam: m,v accumulators, bias correction at t (1-based),
    lr schedule evaluated at t−1, update = lr·m̂/(√v̂ + eps)."""

    def __init__(self, tree, sched, b1=0.5, b2=0.999, eps=1e-8):
        self.m = jax.tree.map(np.zeros_like, tree)
        self.v = jax.tree.map(np.zeros_like, tree)
        self.t = 0
        self.sched, self.b1, self.b2, self.eps = sched, b1, b2, eps

    def update(self, params, grads):
        self.t += 1
        lr = float(self.sched(self.t - 1))
        b1, b2, t = self.b1, self.b2, self.t

        def upd(p, g, m, v):
            m[...] = b1 * m + (1 - b1) * g
            v[...] = b2 * v + (1 - b2) * g * g
            mh = m / (1 - b1 ** t)
            vh = v / (1 - b2 ** t)
            return (p - lr * mh / (np.sqrt(vh) + self.eps)).astype(np.float32)

        return jax.tree.map(upd, params, grads, self.m, self.v)


def _linear_decay(base, decay_start, total):
    def sched(count):
        frac = min(max((count - decay_start) / max(total - decay_start, 1), 0.0), 1.0)
        return base * (1.0 - frac)

    return sched


def _tf_train_step(model, cfg, params, opts, batch, alpha, alpha_p):
    """One TF iteration mirroring train/step.py's sequential D→G→C."""
    rescale = lambda u8: tf.constant(u8, tf.float32) / 127.5 - 1.0
    tfc = lambda a: tf.constant(np.asarray(a))

    def tree_vars(tree):
        return jax.tree.map(tf.Variable, tree)

    out = {}

    # ---------- D update -----------------------------------------------------
    bd = batch["d"]
    x_l, x_u = rescale(bd["x_l"]), rescale(bd["x_u"])
    x_g = model.gen(params["gen"], tfc(bd["z"]), tfc(bd["y_g"]))
    logits_c_u = model.clf(params["clf"], x_u)
    y_c = tf.argmax(logits_c_u, axis=-1, output_type=tf.int32)

    pd_vars = tree_vars(params["disc"])
    with tf.GradientTape() as tape:
        lr_real = model.disc(pd_vars, x_l, tfc(bd["y_l"]))
        lr_cla = model.disc(pd_vars, x_u, y_c)
        lr_gen = model.disc(pd_vars, x_g, tfc(bd["y_g"]))
        l_real = -tf.reduce_mean(model.log_sig(lr_real))
        l_cla = -tf.reduce_mean(model.log_1m_sig(lr_cla))
        l_gen = -tf.reduce_mean(model.log_1m_sig(lr_gen))
        loss_d = l_real + alpha * l_cla + (1 - alpha) * l_gen
    gd = tape.gradient(loss_d, pd_vars)
    gd = jax.tree.map(lambda v: v.numpy(), gd)
    params["disc"] = opts["disc"].update(params["disc"], gd)
    out["loss_d"] = float(loss_d)
    out["d_real"] = float(l_real)
    out["d_cla"] = float(alpha * l_cla)
    out["d_gen"] = float((1 - alpha) * l_gen)

    # ---------- G update (sees updated D) ------------------------------------
    bg = batch["g"]
    pg_vars = tree_vars(params["gen"])
    with tf.GradientTape() as tape:
        x_raw = model.gen(pg_vars, tfc(bg["z"]), tfc(bg["y_g"]))
        logit_g = model.disc(params["disc"], x_raw, tfc(bg["y_g"]))
        loss_g = (1 - alpha) * -tf.reduce_mean(model.log_sig(logit_g))
    gg = tape.gradient(loss_g, pg_vars)
    gg = jax.tree.map(lambda v: v.numpy(), gg)
    params["gen"] = opts["gen"].update(params["gen"], gg)
    out["loss_g"] = float(loss_g)

    # ---------- C update (sees updated D and G) ------------------------------
    bc = batch["c"]
    x_l_c, x_u_c = rescale(bc["x_l"]), rescale(bc["x_u"])
    x_g_c = model.gen(params["gen"], tfc(bc["z"]), tfc(bc["y_g"]))  # new G
    pc_vars = tree_vars(params["clf"])
    with tf.GradientTape() as tape:
        log_l = model.clf(pc_vars, x_l_c)
        log_u = model.clf(pc_vars, x_u_c)
        log_g = model.clf(pc_vars, x_g_c)
        y_c2 = tf.argmax(log_u, axis=-1, output_type=tf.int32)
        logit_d_cla = model.disc(params["disc"], x_u_c, y_c2)
        r_l = model.ce(log_l, tfc(bc["y_l"]))
        # REINFORCE surrogate with mean baseline, D signal stop-gradiented
        w = tf.stop_gradient(model.log_1m_sig(logit_d_cla))
        w = w - tf.reduce_mean(w)
        logp_u = tf.nn.log_softmax(log_u, axis=-1)
        l_adv = alpha * tf.reduce_mean(w * _ce_gather(logp_u, y_c2))
        r_p = model.ce(log_g, tfc(bc["y_g"]))
        loss_c = r_l + l_adv + alpha_p * r_p
    gc = tape.gradient(loss_c, pc_vars)
    gc = jax.tree.map(lambda v: v.numpy(), gc)
    params["clf"] = opts["clf"].update(params["clf"], gc)
    out["loss_c"] = float(loss_c)
    out["c_sup"] = float(r_l)
    out["c_adv"] = float(l_adv)
    out["c_pseudo"] = float(alpha_p * r_p)
    return out


# ===========================================================================
# The parity test
# ===========================================================================


def test_full_train_step_parity_vs_tf():
    cfg = _cfg()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, N_STEPS)
    state = create_state(cfg, nets, opts)

    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=3)
    batches = [sampler.next_triple(cfg.z_dim, cfg.num_classes) for _ in range(N_STEPS)]
    batches_np = [_np_tree_int(b) for b in batches]

    # ---- JAX side -----------------------------------------------------------
    step = jax.jit(
        make_train_step(cfg, nets, opts, N_STEPS, pseudo_label_mode="argmax")
    )
    jax_metrics = []
    for b in batches:
        state, m = step(state, b)
        jax_metrics.append({k: float(v) for k, v in m.items()})

    # ---- TF side ------------------------------------------------------------
    cfg2 = _cfg()
    nets2 = make_networks(cfg2)
    state2 = create_state(cfg2, nets2, make_optimizers(cfg2, N_STEPS))
    tf_params = {k: _np(v) for k, v in state2.params.items()}

    decay_start = int(cfg.lr_decay_start_frac * N_STEPS)
    model = TFTripleGAN(cfg)
    tf_opts = {
        "gen": ManualAdam(tf_params["gen"], _linear_decay(cfg.lr_g, decay_start, N_STEPS)),
        "disc": ManualAdam(tf_params["disc"], _linear_decay(cfg.lr_d, decay_start, N_STEPS)),
        "clf": ManualAdam(tf_params["clf"], _linear_decay(cfg.lr_c, decay_start, N_STEPS)),
    }
    alpha, alpha_p = float(cfg.alpha), float(cfg.alpha_p)

    tf_metrics = []
    for b in batches_np:
        tf_metrics.append(
            _tf_train_step(model, cfg, tf_params, tf_opts, b, alpha, alpha_p)
        )

    # ---- compare ------------------------------------------------------------
    keys = ["loss_d", "loss_g", "loss_c", "d_real", "d_cla", "d_gen",
            "c_sup", "c_adv", "c_pseudo"]
    for t, (mj, mt) in enumerate(zip(jax_metrics, tf_metrics)):
        for k in keys:
            np.testing.assert_allclose(
                mj[k], mt[k], rtol=2e-3, atol=2e-3,
                err_msg=f"step {t} metric {k}: jax={mj[k]} tf={mt[k]}",
            )

    # final parameters agree (every leaf; jax pytrees order dict keys
    # canonically, and both sides share the same nested-dict structure)
    for player in ("gen", "disc", "clf"):
        ours = _np(jax.device_get(state.params[player]))
        paths_a = jax.tree_util.tree_flatten_with_path(ours)[0]
        paths_b = jax.tree_util.tree_flatten_with_path(tf_params[player])[0]
        for (pj, a), (pt, b) in zip(paths_a, paths_b):
            assert str(pj) == str(pt)
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=5e-3,
                err_msg=f"{player} param {pj} diverged from TF after {N_STEPS} steps",
            )


def _np_tree_int(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))
