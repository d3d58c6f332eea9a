"""Pallas fused-kernel tests (SURVEY.md §7 build-order 7): interpret-mode on
CPU, numerical equality against the pure-XLA path, gradients included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triplegan_tpu.ops.pallas_fused import reference_scale_bias_act, scale_bias_act


@pytest.mark.parametrize("act", ["linear", "relu", "leaky_relu", "tanh"])
def test_scale_bias_act_matches_reference(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (16,)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    y = scale_bias_act(x, k, b, act, 0.1, True)  # interpret=True on CPU
    yr = reference_scale_bias_act(x, k, b, act, 0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "tanh"])
def test_scale_bias_act_gradients(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (8,)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (8,)) * 0.1

    f = lambda x, k, b: jnp.sum(scale_bias_act(x, k, b, act, 0.1, True) ** 2)
    fr = lambda x, k, b: jnp.sum(reference_scale_bias_act(x, k, b, act, 0.1) ** 2)
    g = jax.grad(f, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)


def test_networks_pallas_parity():
    """use_pallas nets (interpreted on CPU) ≡ plain-XLA nets, all 3 players."""
    from triplegan_tpu.nn.networks import Classifier, Discriminator, Generator

    z = jax.random.normal(jax.random.PRNGKey(3), (2, 8))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    y = jnp.array([0, 1])

    outs = {}
    for up in (False, True):
        gen = Generator(image_size=16, channels=3, z_dim=8, widths=(16, 8), use_pallas=up)
        p, s = gen.init(jax.random.PRNGKey(0))
        outs[("g", up)], _ = gen.apply(p, s, z, y, train=True)

        disc = Discriminator(
            image_size=16, channels=3, widths=(8, 8), strides=(1, 2), use_pallas=up
        )
        p, s = disc.init(jax.random.PRNGKey(1))
        outs[("d", up)], _ = disc.apply(p, s, x, y, train=False)

        clf = Classifier(
            image_size=16, channels=3, conv_blocks=((8,),), tail=(8,), use_pallas=up
        )
        p, s = clf.init(jax.random.PRNGKey(2))
        outs[("c", up)], _ = clf.apply(p, s, x, train=False)

    for net in ("g", "d", "c"):
        np.testing.assert_allclose(
            np.asarray(outs[(net, False)]),
            np.asarray(outs[(net, True)]),
            rtol=1e-5,
            atol=1e-5,
            err_msg=f"pallas/plain mismatch in {net}",
        )
