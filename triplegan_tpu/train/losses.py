"""The Triple-GAN three-player objective — loss assembly.

Reference parity (SURVEY.md §2.1 #8, Appendix A). The seven practical loss
terms, all computed from discriminator LOGITS with softplus identities for
numerical stability:

    log D(x,y)        = -softplus(-logit)
    log (1 - D(x,y))  = -softplus(+logit)

Players (α = 1/2 by default):

  L_D = -E_real[log D(x_l,y_l)] - α·E[log(1-D(x_u,y_c))]
        - (1-α)·E[log(1-D(x_g,y_g))]
  L_G = -(1-α)·E[log D(x_g,y_g)]            (non-saturating heuristic; the
        saturating minimax form +(1-α)·E[log(1-D)] is available via flag)
  L_C = R_L + α·L_C_adv + α_P·R_P, where
      R_L      = supervised cross-entropy on the labeled batch,
      L_C_adv  = the discrete pseudo-label cross term: y_c ~ p_c(y|x_u) is a
                 non-differentiable sample, so the gradient to C uses the
                 REINFORCE / score-function estimator
                     E[ sg(log(1-D(x_u,y_c))) · log p_c(y_c|x_u) ]
                 with the D signal stop-gradiented (SURVEY.md §7 hard-part 2,
                 Appendix A.3),
      R_P      = pseudo-discriminative CE of C on generated pairs (x_g,y_g),
                 ramped in after a warm-up (weight α_P).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sigmoid(logit: jax.Array) -> jax.Array:
    return -jax.nn.softplus(-logit)


def log_one_minus_sigmoid(logit: jax.Array) -> jax.Array:
    return -jax.nn.softplus(logit)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch; labels are int class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


# --------------------------------------------------------------------------
# Discriminator loss (3 batch types)
# --------------------------------------------------------------------------


def d_loss(
    logit_real: jax.Array,
    logit_cla: jax.Array,
    logit_gen: jax.Array,
    alpha: float,
) -> jax.Array:
    l_real = -jnp.mean(log_sigmoid(logit_real))
    l_cla = -jnp.mean(log_one_minus_sigmoid(logit_cla))
    l_gen = -jnp.mean(log_one_minus_sigmoid(logit_gen))
    return l_real + alpha * l_cla + (1.0 - alpha) * l_gen


def d_loss_terms(logit_real, logit_cla, logit_gen, alpha):
    """Individual terms, for metrics/logging parity with the reference's
    seven scalar summaries (SURVEY.md §2.1 #12)."""
    return {
        "d_real": -jnp.mean(log_sigmoid(logit_real)),
        "d_cla": alpha * -jnp.mean(log_one_minus_sigmoid(logit_cla)),
        "d_gen": (1.0 - alpha) * -jnp.mean(log_one_minus_sigmoid(logit_gen)),
    }


# --------------------------------------------------------------------------
# Generator loss
# --------------------------------------------------------------------------


def g_loss(logit_gen: jax.Array, alpha: float, non_saturating: bool = True) -> jax.Array:
    if non_saturating:
        return (1.0 - alpha) * -jnp.mean(log_sigmoid(logit_gen))
    return (1.0 - alpha) * jnp.mean(log_one_minus_sigmoid(logit_gen))


# --------------------------------------------------------------------------
# Classifier losses
# --------------------------------------------------------------------------


def sample_pseudo_labels(
    key: jax.Array, logits_c: jax.Array, mode: str = "sample"
) -> jax.Array:
    """y_c from p_c(y|x_u). 'sample' (the reference estimator's requirement)
    or 'argmax' (deterministic mode used by the shard-equivalence tests)."""
    if mode == "argmax":
        return jnp.argmax(logits_c, axis=-1)
    return jax.random.categorical(key, logits_c, axis=-1)


def c_adversarial_loss(
    logit_d_on_cla: jax.Array,
    logits_c: jax.Array,
    y_c: jax.Array,
    alpha: float,
    use_baseline: bool = True,
    axis_name: str | None = None,
) -> jax.Array:
    """REINFORCE surrogate for α·E_{y~p_c}[log(1 - D(x_u, y))].

    surrogate = α · mean( sg(w) · log p_c(y_c | x_u) ),
    w = log(1 - D(x_u, y_c)), optionally mean-centered as a variance-reducing
    baseline. Precision note (proven by exact enumeration in
    ``tests/test_losses.py``): the self-included batch-mean baseline makes
    the gradient expectation exactly (1 − 1/B)·exact — cross terms vanish
    since E[∇log p_c] = 0, but each sample subtracts 1/B of its own
    advantage. Direction exact; the shrinkage is an O(1/B) rescale of α
    (≤0.5% at the shipped batch sizes), standard for this baseline form.
    Minimizing it raises p_c on labels the discriminator scores as realistic.
    Under data parallelism the baseline must be the GLOBAL batch mean
    (``axis_name`` → pmean), or each shard centers by its own mean and the
    sharded gradient diverges from the single-device one.
    """
    w = jax.lax.stop_gradient(log_one_minus_sigmoid(logit_d_on_cla))
    if use_baseline:
        m = jnp.mean(w)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        w = w - m
    logp = jax.nn.log_softmax(logits_c, axis=-1)
    logp_yc = jnp.take_along_axis(logp, y_c[:, None], axis=-1)[:, 0]
    return alpha * jnp.mean(w * logp_yc)


def c_loss(
    logits_c_labeled: jax.Array,
    y_l: jax.Array,
    logit_d_on_cla: jax.Array,
    logits_c_unlabeled: jax.Array,
    y_c: jax.Array,
    logits_c_gen: jax.Array,
    y_g: jax.Array,
    alpha: float,
    alpha_p: jax.Array,
    use_baseline: bool = True,
    axis_name: str | None = None,
):
    """Full L_C with term breakdown. ``alpha_p`` may be a traced scalar (the
    warm-up ramp is a function of the step counter)."""
    r_l = cross_entropy(logits_c_labeled, y_l)
    l_adv = c_adversarial_loss(
        logit_d_on_cla, logits_c_unlabeled, y_c, alpha, use_baseline, axis_name
    )
    r_p = cross_entropy(logits_c_gen, y_g)
    total = r_l + l_adv + alpha_p * r_p
    return total, {"c_sup": r_l, "c_adv": l_adv, "c_pseudo": alpha_p * r_p}
