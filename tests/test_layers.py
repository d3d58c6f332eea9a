"""Unit tests for layer helpers (SURVEY.md §4.1): weight-norm vs numpy,
BN train/eval statistics, stochastic-layer determinism under fixed keys,
deconv SAME shape semantics, ZCA round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from triplegan_tpu.data import ondevice
from triplegan_tpu.data.zca import apply_zca, fit_zca
from triplegan_tpu.nn import layers as L


def test_dense_weight_norm_matches_numpy():
    key = jax.random.PRNGKey(0)
    p = L.dense_init(key, 8, 4, weight_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    y = L.dense_apply(p, x)
    v, g, b = np.asarray(p["v"]), np.asarray(p["g"]), np.asarray(p["b"])
    w = v * (g / np.sqrt((v**2).sum(axis=0) + 1e-12))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w + b, rtol=1e-5, atol=1e-5)


def test_conv_weight_norm_unit_norm_columns():
    p = L.conv2d_init(jax.random.PRNGKey(0), 3, 8, kernel=3, weight_norm=True)
    v, g = np.asarray(p["v"]), np.asarray(p["g"])
    w = v * (g / np.sqrt((v**2).sum(axis=(0, 1, 2)) + 1e-12))
    # with g = 1 (init), each output channel's kernel has unit L2 norm
    np.testing.assert_allclose(
        np.sqrt((w**2).sum(axis=(0, 1, 2))), np.ones(8), rtol=1e-5
    )


def test_conv_same_shapes():
    p = L.conv2d_init(jax.random.PRNGKey(0), 3, 8)
    x = jnp.zeros((2, 16, 16, 3))
    assert L.conv2d_apply(p, x).shape == (2, 16, 16, 8)
    assert L.conv2d_apply(p, x, stride=2).shape == (2, 8, 8, 8)
    assert L.conv2d_apply(p, x, padding="VALID").shape == (2, 14, 14, 8)


def test_deconv_same_doubles_spatial():
    """TF conv2d_transpose SAME stride-2 semantics: out = in * stride."""
    p = L.deconv2d_init(jax.random.PRNGKey(0), 8, 4, kernel=5)
    x = jnp.zeros((2, 8, 8, 8))
    assert L.deconv2d_apply(p, x, stride=2).shape == (2, 16, 16, 4)


def test_deconv_adjoint_of_conv():
    """conv_transpose(w) must be the adjoint of conv(w) under SAME/stride-2:
    <conv(x), y> == <x, deconv(y)> — the defining property TF's
    conv2d_transpose gradient relies on."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (5, 5, 3, 8))  # HWIO: in=3, out=8
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    conv_out = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=dn
    )
    # deconv with transpose_kernel=True applies the adjoint of the above conv
    deconv_out = jax.lax.conv_transpose(
        y, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    lhs = jnp.vdot(conv_out, y)
    rhs = jnp.vdot(x, deconv_out)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_batchnorm_train_normalizes_and_updates_stats():
    p, s = L.batchnorm_init(4)
    x = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(0), (64, 8, 8, 4))
    y, s2 = L.batchnorm_apply(p, s, x, train=True, momentum=0.5)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    # running stats moved half-way toward the batch moments (momentum 0.5)
    np.testing.assert_allclose(
        np.asarray(s2["mean"]), 0.5 * np.asarray(x.mean(axis=(0, 1, 2))), rtol=1e-4
    )


def test_batchnorm_eval_uses_running_stats():
    p, s = L.batchnorm_init(4)
    s = {"mean": jnp.full((4,), 2.0), "var": jnp.full((4,), 4.0)}
    x = jnp.full((2, 3, 3, 4), 2.0)
    y, s2 = L.batchnorm_apply(p, s, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)
    assert s2 is s


def test_stochastic_layers_deterministic_under_fixed_key():
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    a = L.gaussian_noise(key, x, 0.3, train=True)
    b = L.gaussian_noise(key, x, 0.3, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = L.dropout(key, x, 0.5, train=True)
    b = L.dropout(key, x, 0.5, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eval mode is identity
    np.testing.assert_array_equal(
        np.asarray(L.dropout(key, x, 0.5, train=False)), np.asarray(x)
    )


def test_dropout_preserves_expectation():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((1000, 32))
    y = L.dropout(key, x, 0.5, train=True)
    assert abs(float(y.mean()) - 1.0) < 0.05


def test_leaky_relu():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(L.leaky_relu(x, 0.1)), [-0.2, 0.0, 3.0])


def test_zca_whitens_covariance():
    rng = np.random.RandomState(0)
    # correlated synthetic images
    imgs = rng.multivariate_normal(
        [128, 128, 128], [[900, 600, 300], [600, 900, 600], [300, 600, 900]], size=500
    )
    imgs = np.clip(imgs, 0, 255).astype(np.uint8).reshape(500, 1, 1, 3)
    stats = fit_zca(imgs, eps=1e-8)
    x = ondevice.rescale(jnp.asarray(imgs))
    white = np.asarray(apply_zca(x, jnp.asarray(stats.mean), jnp.asarray(stats.whiten)))
    flat = white.reshape(500, -1)
    cov = flat.T @ flat / 500
    np.testing.assert_allclose(cov, np.eye(3), atol=0.05)


def test_random_translate_and_flip_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    t1 = ondevice.random_translate(key, x, 2)
    t2 = ondevice.random_translate(key, x, 2)
    assert t1.shape == x.shape
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    f = ondevice.random_flip(key, x)
    assert f.shape == x.shape
    # flipping twice with the same mask restores the original
    reflip = ondevice.random_flip(key, f)
    np.testing.assert_allclose(np.asarray(reflip), np.asarray(x), atol=1e-6)


def test_label_concat_spatial():
    x = jnp.zeros((2, 4, 4, 3))
    y1h = jax.nn.one_hot(jnp.array([1, 3]), 10)
    out = L.label_concat_spatial(x, y1h)
    assert out.shape == (2, 4, 4, 13)
    assert float(out[0, 2, 2, 3 + 1]) == 1.0
    assert float(out[1, 0, 0, 3 + 3]) == 1.0


def test_max_pool_maskbwd_matches_select_and_scatter():
    """The mask-based custom-VJP maxpool backward must equal JAX's
    select_and_scatter gradient on tie-free input (f32 random: ties are
    measure-zero), including SAME padding on odd dims, and must preserve
    total gradient mass when ties exist."""
    for shape in [(2, 8, 8, 3), (2, 7, 7, 3)]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        g = jax.random.normal(jax.random.PRNGKey(1), L.max_pool(x).shape)

        def loss_ref(x):
            return jnp.sum(L._reduce_window_max(x, 2, 2) * g)

        def loss_mask(x):
            return jnp.sum(L._max_pool_maskbwd(x, 2) * g)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_mask)(x)),
            np.asarray(jax.grad(loss_ref)(x)),
            atol=1e-6,
        )

    # ties: all-equal input → each window's cotangent split evenly, total
    # gradient mass preserved exactly
    x = jnp.ones((1, 4, 4, 1))
    g = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1) + 1.0
    gx = jax.grad(lambda x: jnp.sum(L._max_pool_maskbwd(x, 2) * g))(x)
    assert abs(float(jnp.sum(gx)) - float(jnp.sum(g))) < 1e-6
    np.testing.assert_allclose(np.asarray(gx[0, :2, :2, 0]), 0.25, atol=1e-6)
