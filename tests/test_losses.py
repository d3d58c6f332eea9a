"""Loss-unit tests (SURVEY.md §4.3): each Appendix-A term against a tiny
closed-form case."""

import jax
import jax.numpy as jnp
import numpy as np

from triplegan_tpu.train import losses


def test_log_sigmoid_identities():
    logit = jnp.array([-3.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(losses.log_sigmoid(logit)),
        np.log(1 / (1 + np.exp(-np.asarray(logit)))),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(losses.log_one_minus_sigmoid(logit)),
        np.log(1 - 1 / (1 + np.exp(-np.asarray(logit))) + 1e-12),
        rtol=1e-4,
        atol=1e-6,
    )


def test_cross_entropy_closed_form():
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    labels = jnp.array([0, 1])
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    np.testing.assert_allclose(
        float(losses.cross_entropy(logits, labels)), expected, rtol=1e-3
    )


def test_d_loss_balanced_at_zero_logits():
    """All logits 0 → D(x,y)=0.5 everywhere → L_D = -log½ - ½log½ - ½log½
    = 2·log 2 (α = ½)."""
    z = jnp.zeros((4,))
    val = float(losses.d_loss(z, z, z, alpha=0.5))
    np.testing.assert_allclose(val, 2 * np.log(2), rtol=1e-5)


def test_d_loss_direction():
    """Confident-correct D (high real logit, low fake logits) has low loss."""
    good = float(losses.d_loss(jnp.full((4,), 5.0), jnp.full((4,), -5.0),
                               jnp.full((4,), -5.0), 0.5))
    bad = float(losses.d_loss(jnp.full((4,), -5.0), jnp.full((4,), 5.0),
                              jnp.full((4,), 5.0), 0.5))
    assert good < 0.1 < bad


def test_g_loss_forms():
    logit = jnp.zeros((4,))
    ns = float(losses.g_loss(logit, 0.5, non_saturating=True))
    np.testing.assert_allclose(ns, 0.5 * np.log(2), rtol=1e-5)
    sat = float(losses.g_loss(logit, 0.5, non_saturating=False))
    np.testing.assert_allclose(sat, 0.5 * -np.log(2), rtol=1e-5)
    # non-saturating decreases as D is fooled
    assert float(losses.g_loss(jnp.full((4,), 5.0), 0.5)) < ns


def test_pseudo_label_sampling_modes():
    logits = jnp.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    am = losses.sample_pseudo_labels(jax.random.PRNGKey(0), logits, "argmax")
    np.testing.assert_array_equal(np.asarray(am), [0, 1])
    sm = losses.sample_pseudo_labels(jax.random.PRNGKey(0), logits, "sample")
    # with near-one-hot probabilities the sample equals the argmax w.h.p.
    np.testing.assert_array_equal(np.asarray(sm), [0, 1])


def test_c_adversarial_reinforce_gradient_direction():
    """The REINFORCE surrogate must push p_c toward labels D scores as real.
    Without a baseline the weight log(1-D) is always ≤ 0, so every sampled
    label is reinforced — but the realistic pair (logit_d ≫ 0 ⇒ weight very
    negative) must be reinforced far harder than the unrealistic one."""
    logits_c = jnp.zeros((2, 2))
    y_c = jnp.array([0, 1])
    logit_d = jnp.array([6.0, -6.0])  # pair (x0, y=0) looks real to D

    def f(lc):
        return losses.c_adversarial_loss(logit_d, lc, y_c, alpha=0.5, use_baseline=False)

    g = jax.grad(f)(logits_c)
    assert float(g[0, 0]) < 0                      # realistic label pushed up
    assert float(g[0, 0]) < 10 * float(g[1, 1])    # ...much harder than the fake one


def test_c_adversarial_baseline_preserves_gradient_direction():
    logits_c = jnp.zeros((2, 2))
    y_c = jnp.array([0, 1])
    logit_d = jnp.array([6.0, -6.0])

    def f(lc):
        return losses.c_adversarial_loss(logit_d, lc, y_c, alpha=0.5, use_baseline=True)

    g = jax.grad(f)(logits_c)
    assert float(g[0, 0]) < 0 and float(g[1, 1]) > 0


def test_c_adversarial_no_gradient_to_d_signal():
    """The D signal is stop-gradiented: grad w.r.t. logit_d must be zero."""
    logits_c = jnp.zeros((2, 2))
    y_c = jnp.array([0, 1])

    def f(ld):
        return losses.c_adversarial_loss(ld, logits_c, y_c, alpha=0.5)

    g = jax.grad(f)(jnp.array([1.0, -1.0]))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_c_adversarial_estimator_expectation_exact_enumeration():
    """The REINFORCE surrogate against ground truth, by exact enumeration
    over all K^B joint label draws (no Monte Carlo noise):

    - without baseline, E_y[grad surrogate] equals the exact gradient of
      L(θ) = α·mean_i E_{y~p_i}[w_i(y)];
    - with the self-included batch-mean baseline, the expectation is
      (1 − 1/B)·exact — cross terms vanish (E[∇log p] = 0) but each
      sample's own contribution to the mean subtracts 1/B of itself.
      Direction exact, magnitude scaled (≡ a slightly smaller α).
    """
    import itertools

    B, K = 2, 3
    rng = np.random.RandomState(0)
    theta = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    alpha = 0.5
    p = np.asarray(jax.nn.softmax(theta, axis=-1), np.float64)
    # D scores per (example, candidate label) — the pair discriminator
    # scores (x_i, y), so w varies with y (a y-constant w would make the
    # exact gradient 0 and the test vacuous)
    d_per_label = rng.normal(size=(B, K)).astype(np.float32)
    w_per_label = np.asarray(
        losses.log_one_minus_sigmoid(jnp.asarray(d_per_label)), np.float64
    )

    def exact_loss(th):
        pi = jax.nn.softmax(th, axis=-1)
        return alpha * jnp.mean(jnp.sum(pi * jnp.asarray(w_per_label), axis=-1))

    g_exact = np.asarray(jax.grad(exact_loss)(theta), np.float64)

    def surrogate_grad(y_vec, use_baseline):
        d = jnp.asarray(d_per_label[np.arange(B), y_vec])

        def f(th):
            return losses.c_adversarial_loss(
                d, th, jnp.asarray(y_vec, jnp.int32),
                alpha, use_baseline=use_baseline,
            )

        return np.asarray(jax.grad(f)(theta), np.float64)

    for use_baseline, scale in ((False, 1.0), (True, 1.0 - 1.0 / B)):
        acc = np.zeros((B, K))
        for ys in itertools.product(range(K), repeat=B):
            prob = float(np.prod(p[np.arange(B), list(ys)]))
            acc += prob * surrogate_grad(np.array(ys), use_baseline)
        np.testing.assert_allclose(
            acc, scale * g_exact, rtol=2e-4, atol=2e-5,
            err_msg=f"use_baseline={use_baseline}",
        )


def test_c_loss_alpha_p_gating():
    logits = jnp.zeros((2, 3))
    y = jnp.array([0, 1])
    ld = jnp.zeros((2,))
    total_off, terms_off = losses.c_loss(
        logits, y, ld, logits, y, logits, y, 0.5, jnp.asarray(0.0)
    )
    total_on, terms_on = losses.c_loss(
        logits, y, ld, logits, y, logits, y, 0.5, jnp.asarray(0.3)
    )
    assert float(terms_off["c_pseudo"]) == 0.0
    np.testing.assert_allclose(
        float(terms_on["c_pseudo"]), 0.3 * np.log(3), rtol=1e-4
    )
    assert float(total_on) > float(total_off)
