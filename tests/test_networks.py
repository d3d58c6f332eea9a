"""Network shape/behavior tests for the three players at every supported
resolution (MNIST 28 / CIFAR-SVHN 32 / STL-10 96)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triplegan_tpu.nn.networks import Classifier, Discriminator, Generator


@pytest.mark.parametrize(
    "size,channels,widths",
    [(28, 1, (64, 32)), (32, 3, (64, 32, 16)), (96, 3, (64, 32, 16, 8))],
)
def test_generator_shapes(size, channels, widths):
    gen = Generator(image_size=size, channels=channels, z_dim=16, widths=widths)
    p, s = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    y = jnp.array([0, 1, 2, 3])
    x, s2 = gen.apply(p, s, z, y, train=True)
    assert x.shape == (4, size, size, channels)
    assert float(jnp.max(jnp.abs(x))) <= 1.0  # tanh range
    assert set(s2.keys()) == set(s.keys())


def test_generator_label_conditioning_changes_output():
    gen = Generator(image_size=16, channels=3, z_dim=8, widths=(16, 8))
    p, s = gen.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    z = jnp.concatenate([z[:1], z[:1]], axis=0)  # identical z
    x, _ = gen.apply(p, s, z, jnp.array([0, 7]), train=True)
    assert float(jnp.max(jnp.abs(x[0] - x[1]))) > 1e-6


@pytest.mark.parametrize("size,channels", [(28, 1), (32, 3)])
def test_discriminator_shapes(size, channels):
    disc = Discriminator(
        image_size=size, channels=channels, widths=(16, 16), strides=(1, 2)
    )
    p, s = disc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, size, size, channels))
    y = jnp.array([0, 1, 2, 3])
    logit, _ = disc.apply(p, s, x, y, train=True, rng=jax.random.PRNGKey(2))
    assert logit.shape == (4,)
    # eval mode needs no rng and is deterministic
    l1, _ = disc.apply(p, s, x, y, train=False)
    l2, _ = disc.apply(p, s, x, y, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_discriminator_uses_labels():
    disc = Discriminator(image_size=16, channels=3, widths=(8,), strides=(2,))
    p, s = disc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    x = jnp.concatenate([x[:1], x[:1]])
    l, _ = disc.apply(p, s, x, jnp.array([0, 5]), train=False)
    assert abs(float(l[0] - l[1])) > 1e-8


@pytest.mark.parametrize("size,channels", [(28, 1), (32, 3), (96, 3)])
def test_classifier_shapes(size, channels):
    clf = Classifier(
        image_size=size,
        channels=channels,
        conv_blocks=((8, 8), (16,)),
        tail=(16, 8),
    )
    p, s = clf.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, size, size, channels))
    logits, s2 = clf.apply(p, s, x, train=True, rng=jax.random.PRNGKey(2))
    assert logits.shape == (4, 10)
    assert set(s2.keys()) == set(s.keys())
    # eval deterministic, no rng
    l1, _ = clf.apply(p, s, x, train=False)
    l2, _ = clf.apply(p, s, x, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_classifier_conv_large_default_shape():
    """SURVEY.md Appendix B 'conv-large': 2 blocks of 3 convs (128, 256) + a
    VALID-conv/NiN tail (512, 256, 128) + linear head = 9 conv layers."""
    clf = Classifier()
    p, _ = clf.init(jax.random.PRNGKey(0))
    conv_names = [k for k in p if not k.endswith("_bn") and k != "head"]
    assert len(conv_names) == 9
    assert "head" in p
    assert p["t0"]["w"].shape == (3, 3, 256, 512)   # VALID 3×3 conv
    assert p["t1"]["w"].shape == (1, 1, 512, 256)   # NiN 1×1
    assert p["t2"]["w"].shape == (1, 1, 256, 128)   # NiN 1×1


def test_networks_jit_compatible():
    gen = Generator(image_size=16, channels=3, z_dim=8, widths=(16, 8))
    p, s = gen.init(jax.random.PRNGKey(0))

    @jax.jit
    def f(p, s, z, y):
        return gen.apply(p, s, z, y, train=True)

    x, _ = f(p, s, jnp.zeros((2, 8)), jnp.array([0, 1]))
    assert x.shape == (2, 16, 16, 3)
