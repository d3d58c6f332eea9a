"""Data-dependent weight-norm initialization (Salimans & Kingma 2016).

SURVEY.md §7 hard-part 3 flags that weight-norm implementations of this
lineage often use data-dependent init: with w = g·v/‖v‖, run one batch
through each weight-normed layer and set

    g ← init_scale / std(y),    b ← −mean(y) · g

per output channel, where y is the layer's pre-activation computed with
g = 1, b = 0 — so every WN layer starts with zero-mean, unit-variance
(×init_scale) pre-activations. The adjustment is sequential (fixing layer k
changes layer k+1's input), so these functions run the forward pass once,
normalizing as they go, and return updated params.

Usage (before training):

    state = state.replace(params={**state.params,
        "disc": ddinit_discriminator(disc, state.params["disc"], x, y),
        "gen":  ddinit_generator(gen, state.params["gen"], state.bn["gen"], z, y),
    })

Stochastic layers (noise/dropout) are disabled during init; batch-norm
layers are untouched (they self-normalize).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from triplegan_tpu.nn import layers as L

_EPS = 1e-8


def _stats(y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    axes = tuple(range(y.ndim - 1))
    m = jnp.mean(y, axis=axes)
    s = jnp.std(y, axis=axes)
    return m, s


def _adjust(p, t, init_scale):
    """t = pre-activation with the direction-only kernel (g=1, b=0)."""
    m, s = _stats(t)
    g = init_scale / (s + _EPS)
    b = -m * g
    y = (t - m) / (s + _EPS) * init_scale
    new_p = dict(p)
    new_p["g"] = g.astype(p["g"].dtype)
    if "b" in p:
        new_p["b"] = b.astype(p["b"].dtype)
    return new_p, y


def wn_dense_ddinit(p, x, init_scale=1.0):
    v = p["v"]
    vn = v / jnp.sqrt(jnp.sum(jnp.square(v), axis=0) + _EPS)
    t = jnp.dot(x, vn.astype(x.dtype))
    return _adjust(p, t, init_scale)


def wn_conv_ddinit(p, x, *, stride=1, padding="SAME", init_scale=1.0):
    v = p["v"]
    vn = v / jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + _EPS)
    dn = lax.conv_dimension_numbers(x.shape, vn.shape, ("NHWC", "HWIO", "NHWC"))
    t = lax.conv_general_dilated(
        x, vn.astype(x.dtype), (stride, stride), padding, dimension_numbers=dn
    )
    return _adjust(p, t, init_scale)


def wn_deconv_ddinit(p, x, *, stride=2, init_scale=1.0):
    v = p["v"]
    vn = v / jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + _EPS)
    t = lax.conv_transpose(
        x,
        vn.astype(x.dtype),
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False,
    )
    return _adjust(p, t, init_scale)


# ---------------------------------------------------------------------------
# Per-network drivers (mirror the apply flow with stochastic layers off)
# ---------------------------------------------------------------------------


def ddinit_discriminator(disc, params, x, y, init_scale=1.0):
    """Data-dependent init of every WN conv + the WN head of D, using one
    real (x, y) batch. Returns updated params."""
    new_params = dict(params)
    y1h = L.onehot(y, disc.num_classes, dtype=x.dtype)
    h = L.label_concat_spatial(x, y1h)
    for i, s in enumerate(disc.strides):
        name = f"conv{i}"
        new_params[name], h = wn_conv_ddinit(
            params[name], h, stride=s, init_scale=init_scale
        )
        h = L.leaky_relu(h, disc.lrelu_slope)
        if s == 2 and disc.label_reconcat and i + 1 < len(disc.widths):
            h = L.label_concat_spatial(h, y1h)
    h = L.global_avg_pool(h)
    h = jnp.concatenate([h, y1h], axis=-1)
    new_params["head"], _ = wn_dense_ddinit(params["head"], h, init_scale)
    return new_params


def ddinit_generator(gen, params, bn_state, z, y, init_scale=1.0):
    """Data-dependent init of G's weight-normed output deconv: run the
    deterministic forward to the last hidden, then normalize the output
    layer's pre-tanh activations. Returns updated params."""
    s0 = gen.base_size
    y1h = L.onehot(y, gen.num_classes, dtype=z.dtype)
    h = L.dense_apply(params["dense"], jnp.concatenate([z, y1h], axis=-1))
    h = h.reshape(h.shape[0], s0, s0, gen.widths[0])
    h, _ = L.batchnorm_apply(params["bn0"], bn_state["bn0"], h, train=True)
    h = jax.nn.relu(h)
    for i in range(len(gen.widths) - 1):
        h = L.deconv2d_apply(params[f"deconv{i}"], h, stride=2)
        h, _ = L.batchnorm_apply(
            params[f"bn{i + 1}"], bn_state[f"bn{i + 1}"], h, train=True
        )
        h = jax.nn.relu(h)
    new_params = dict(params)
    new_params["deconv_out"], _ = wn_deconv_ddinit(
        params["deconv_out"], h, init_scale=init_scale
    )
    return new_params
