"""Data-dependent weight-norm init: after init, every WN layer's
pre-activations on the init batch are ~zero-mean/unit-std (the defining
property of Salimans-Kingma init)."""

import jax
import jax.numpy as jnp
import numpy as np

from triplegan_tpu.nn import layers as L
from triplegan_tpu.nn.ddinit import (
    ddinit_discriminator,
    ddinit_generator,
    wn_conv_ddinit,
    wn_dense_ddinit,
)
from triplegan_tpu.nn.networks import Discriminator, Generator


def test_wn_conv_ddinit_normalizes():
    p = L.conv2d_init(jax.random.PRNGKey(0), 3, 8, weight_norm=True)
    x = 5.0 + 3.0 * jax.random.normal(jax.random.PRNGKey(1), (32, 8, 8, 3))
    p2, y = wn_conv_ddinit(p, x)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    # applying the adjusted params through the normal path gives the same y
    y2 = L.conv2d_apply(p2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-3, atol=1e-3)


def test_wn_dense_ddinit_normalizes():
    p = L.dense_init(jax.random.PRNGKey(0), 16, 4, weight_norm=True)
    x = 2.0 + jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    p2, y = wn_dense_ddinit(p, x)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    y2 = L.dense_apply(p2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-3, atol=1e-3)


def test_ddinit_discriminator_end_to_end():
    disc = Discriminator(
        image_size=16, channels=3, widths=(8, 8), strides=(1, 2),
        input_noise=0.0, input_dropout=0.0, block_dropout=0.0,
    )
    p, s = disc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 16, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 10)
    p2 = ddinit_discriminator(disc, p, x, y)
    # params changed, and the network still runs with finite logits
    assert float(jnp.max(jnp.abs(p2["conv0"]["g"] - p["conv0"]["g"]))) > 0
    logit, _ = disc.apply(p2, s, x, y, train=False)
    assert np.all(np.isfinite(np.asarray(logit)))
    # head pre-activation std ≈ init_scale would need the tap; check logits
    # are O(1) rather than the raw-init scale
    assert float(jnp.std(logit)) < 10.0


def test_ddinit_generator_output_layer():
    gen = Generator(image_size=16, channels=3, z_dim=8, widths=(16, 8))
    p, s = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    y = jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 10)
    p2 = ddinit_generator(gen, p, s, z, y)
    assert float(jnp.max(jnp.abs(p2["deconv_out"]["g"] - p["deconv_out"]["g"]))) > 0
    x, _ = gen.apply(p2, s, z, y, train=True)
    # pre-tanh is unit-ish scale → tanh output well spread in (-1, 1)
    assert 0.3 < float(jnp.std(x)) < 1.0


def test_ddinit_through_train_loop(tmp_path):
    from tests.helpers import tiny_config, tiny_data
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.ddinit = True
    cfg.epochs = 1
    cfg.steps_per_epoch = 2
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 2
    for k, v in result["metrics"].items():
        assert np.isfinite(v), f"{k} not finite with ddinit"
