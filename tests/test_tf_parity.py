"""TF-parity tests (SURVEY.md §4.2): compare our JAX ops against installed
TensorFlow's conv / conv2d_transpose / batch-norm on random inputs to catch
the classic TF↔JAX SAME-padding and BN-momentum mismatches the reference's
semantics depend on. Skipped wholesale if TF is unavailable."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from triplegan_tpu.nn import layers as L  # noqa: E402


def _rand(shape, seed=0):
    return np.random.RandomState(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_same_matches_tf(stride):
    x = _rand((2, 8, 8, 3))
    w = _rand((3, 3, 3, 4), seed=1)
    ours = L.conv2d_apply({"w": jnp.asarray(w)}, jnp.asarray(x), stride=stride)
    theirs = tf.nn.conv2d(x, w, strides=stride, padding="SAME").numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_conv2d_transpose_same_matches_tf():
    """The SURVEY §7 hard-part-3 check: stride-2 SAME deconv must reproduce
    tf.nn.conv2d_transpose exactly (shape AND values)."""
    x = _rand((2, 4, 4, 8))
    # TF filter layout for conv2d_transpose: (H, W, out_ch, in_ch)
    w_tf = _rand((5, 5, 3, 8), seed=1)
    theirs = tf.nn.conv2d_transpose(
        x, w_tf, output_shape=(2, 8, 8, 3), strides=2, padding="SAME"
    ).numpy()
    # TF's conv2d_transpose computes the *adjoint* of a forward conv2d whose
    # HWIO kernel is (H, W, in_fwd=3, out_fwd=8) — exactly TF's filter layout
    # (H, W, deconv_out=3, deconv_in=8). In lax terms that is conv_transpose
    # with transpose_kernel=True on the same array:
    ours = jax.lax.conv_transpose(
        jnp.asarray(x),
        jnp.asarray(w_tf),
        strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-4)


def test_deconv2d_apply_matches_tf_with_flipped_kernel():
    """Our deconv2d_apply(transpose_kernel=False) equals TF conv2d_transpose
    with the spatially-flipped, axis-swapped kernel — i.e. the same function
    family; training is invariant to this fixed reparameterization."""
    x = _rand((2, 4, 4, 8))
    w = _rand((5, 5, 8, 3), seed=2)  # ours: HWIO, I=in
    ours = np.asarray(L.deconv2d_apply({"w": jnp.asarray(w)}, jnp.asarray(x), stride=2))
    w_tf = np.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # flip spatial, swap I/O
    theirs = tf.nn.conv2d_transpose(
        x, w_tf, output_shape=(2, 8, 8, 3), strides=2, padding="SAME"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_tf_keras_semantics():
    """Train-mode normalization + running-stat update vs tf.keras
    BatchNormalization (momentum 0.99, eps 1e-3 — the TF defaults the
    reference inherits)."""
    x = _rand((16, 4, 4, 6))
    bn = tf.keras.layers.BatchNormalization(momentum=0.99, epsilon=1e-3)
    theirs = bn(x, training=True).numpy()

    p, s = L.batchnorm_init(6)
    ours, s2 = L.batchnorm_apply(p, s, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(s2["mean"]), bn.moving_mean.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s2["var"]), bn.moving_variance.numpy(), rtol=5e-2, atol=1e-3
    )


def test_max_pool_matches_tf():
    x = _rand((2, 8, 8, 3))
    ours = np.asarray(L.max_pool(jnp.asarray(x)))
    theirs = tf.nn.max_pool2d(x, ksize=2, strides=2, padding="SAME").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
