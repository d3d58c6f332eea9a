"""Pallas conv3x3 / Winograd F(2,3) / u8-bits dropout correctness
(round-3 perf work, VERDICT r2 next-step #1). Pallas kernels run in
interpret mode on the CPU backend; numerical ground truth is the XLA conv.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triplegan_tpu.ops.pallas_conv import (
    conv3x3,
    conv3x3_nopad,
    conv3x3_wgrad,
    reference_conv3x3,
)
from triplegan_tpu.ops.winograd import conv3x3_winograd


@pytest.mark.parametrize("padding", ["SAME", "VALID"])
def test_pallas_conv3x3_matches_xla(padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    ref = reference_conv3x3(x, w, padding)
    got = conv3x3(x, w, padding, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("padding", ["SAME", "VALID"])
def test_pallas_conv3x3_grads_match_xla(padding):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.2, jnp.float32)
    g = jnp.asarray(rng.randn(2, 6 if padding == "SAME" else 4,
                              6 if padding == "SAME" else 4, 8), jnp.float32)
    gx_r, gw_r = jax.grad(
        lambda a, b: jnp.sum(reference_conv3x3(a, b, padding) * g), (0, 1)
    )(x, w)
    gx_p, gw_p = jax.grad(
        lambda a, b: jnp.sum(conv3x3(a, b, padding, True) * g), (0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-3)


def test_pallas_wgrad_direct():
    """conv3x3_wgrad against einsum over extracted patches."""
    rng = np.random.RandomState(2)
    x = rng.randn(4, 7, 7, 8).astype(np.float32)
    g = rng.randn(4, 5, 5, 16).astype(np.float32)
    got = conv3x3_wgrad(jnp.asarray(x), jnp.asarray(g), interpret=True)
    want = np.zeros((3, 3, 8, 16), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x[:, dy : dy + 5, dx : dx + 5, :].reshape(-1, 8)
            want[dy, dx] = patch.T @ g.reshape(-1, 16)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_pallas_conv_batch_tiling_grid():
    """Batch sizes that force multiple grid tiles produce identical results
    (exercises the grid-accumulating wgrad)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 6, 6, 128), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    ref = reference_conv3x3(x, w, "SAME")
    got = conv3x3(x, w, "SAME", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_winograd_matches_xla():
    rng = np.random.RandomState(4)
    for (n, h, w_, cin, cout) in [(2, 8, 8, 16, 8), (3, 6, 10, 4, 12)]:
        x = jnp.asarray(rng.randn(n, h, w_, cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.2, jnp.float32)
        ref = reference_conv3x3(x, wk, "SAME")
        got = conv3x3_winograd(x, wk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("cin,cout,pad", [(3, 128, "SAME"), (13, 32, "SAME"), (1, 8, "VALID")])
def test_small_cin_patches_conv_matches_direct(cin, cout, pad, monkeypatch):
    """The patches+dot formulation for tiny-Cin first layers (r3 trace: XLA
    direct conv at 6–22% MXU there) is numerically the same conv, and
    conv2d_apply genuinely dispatches to it for 9·Cin ≤ 128 under
    TRIPLEGAN_SMALLCIN=patches (env read at trace time)."""
    from triplegan_tpu.nn import layers as L

    monkeypatch.setenv("TRIPLEGAN_SMALLCIN", "patches")
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    ref = reference_conv3x3(x, w, pad)
    np.testing.assert_allclose(
        np.asarray(L._conv3x3_patches(x, w, pad)), np.asarray(ref),
        atol=1e-4, rtol=1e-4,
    )
    calls = []
    real_patches = L._conv3x3_patches
    monkeypatch.setattr(
        L, "_conv3x3_patches",
        lambda *a, **k: (calls.append(1), real_patches(*a, **k))[1],
    )
    np.testing.assert_allclose(
        np.asarray(L.conv2d_apply({"w": w}, x, padding=pad)), np.asarray(ref),
        atol=1e-4, rtol=1e-4,
    )
    assert calls, "conv2d_apply did not dispatch to the patches formulation"
    # gradients route through the same formulation
    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    gx_r, gw_r = jax.grad(
        lambda a, b: jnp.sum(reference_conv3x3(a, b, pad) * g), (0, 1)
    )(x, w)
    gx_p, gw_p = jax.grad(
        lambda a, b: jnp.sum(L.conv2d_apply({"w": b}, a, padding=pad) * g), (0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-3)


def test_dropout_u8_bits_variant(monkeypatch):
    from triplegan_tpu.nn import layers as L

    monkeypatch.setenv("TRIPLEGAN_DROPOUT_BITS", "8")
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2048, 64), jnp.float32)
    y = np.asarray(L.dropout(key, x, 0.5, train=True))
    # kept elements scaled by exactly 256/128 = 2 (0.5 is exactly
    # representable in the n/256 quantization)
    vals = set(np.unique(y).tolist())
    assert vals <= {0.0, 2.0}
    keep_frac = (y != 0).mean()
    assert abs(keep_frac - 0.5) < 0.02
    # expectation preserved
    np.testing.assert_allclose(y.mean(), 1.0, atol=0.05)
    # eval mode / rate 0: identity regardless of variant
    np.testing.assert_array_equal(
        np.asarray(L.dropout(key, x, 0.5, train=False)), np.asarray(x)
    )


def test_dropout_u8_bits_tiny_rate_is_noop(monkeypatch):
    """rate small enough that keep rounds to 256/256 must be an exact no-op —
    regression: the u8 comparison `bits < 256` wraps the Python int to
    uint8(0) and would silently zero the whole activation."""
    from triplegan_tpu.nn import layers as L

    monkeypatch.setenv("TRIPLEGAN_DROPOUT_BITS", "8")
    key = jax.random.PRNGKey(1)
    x = jnp.ones((64, 32), jnp.float32)
    for rate in (1e-4, 1e-3, 0.00195):
        y = np.asarray(L.dropout(key, x, rate, train=True))
        np.testing.assert_array_equal(y, np.asarray(x))


def test_dropout_u8_bits_nondefault():
    """The exact-bernoulli path stays the default (no env set)."""
    assert os.environ.get("TRIPLEGAN_DROPOUT_BITS", "32") == "32"
