"""The three Triple-GAN players as pure functional networks.

Reference parity (SURVEY.md §2.1 #5–7, Appendix B):

  * Generator  — label-conditional transposed-conv stack: z ⊕ onehot(y) →
    dense → s0×s0×W0 → BN+ReLU → stride-2 deconvs → image, weight-norm on the
    output deconv, tanh.
  * Discriminator — weight-norm conv stack on (x, y) pairs with label planes
    broadcast-concatenated spatially, Gaussian-noise/dropout regularization,
    leaky-ReLU(0.2), global pool → dense 1 (returns LOGITS; the sigmoid lives
    in the loss for numerical stability).
  * Classifier — "conv-large"-style CNN p(y|x): Gaussian input noise, conv
    blocks with BN+leaky-ReLU(0.1), maxpool+dropout between blocks, a VALID
    conv + NiN 1×1 tail, global average pool, linear head (returns LOGITS).

All three are shape-generic (28×28 MNIST / 32×32 SVHN+CIFAR / 96×96 STL-10)
via dataclass specs; widths/strides come from configs (SURVEY.md §2.1 #1).

Every ``apply`` is a pure function ``(params, state, inputs, train, rng) ->
(out, new_state)`` where ``state`` holds batch-norm running statistics —
trivially jit/grad/shard_map-compatible. ``axis_name`` turns on cross-device
sync-BN inside a mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from triplegan_tpu.nn import layers as L

Params = Dict[str, Any]
State = Dict[str, Any]


def _split(rng: Optional[jax.Array], n: int):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


# ===========================================================================
# Generator
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class Generator:
    """z ⊕ onehot(y) → image in [-1, 1].  (SURVEY.md Appendix B "G")."""

    image_size: int = 32
    channels: int = 3
    num_classes: int = 10
    z_dim: int = 100
    widths: Tuple[int, ...] = (512, 256, 128)  # widths[0] = dense proj, rest = deconvs
    kernel: int = 5
    bn_momentum: float = 0.99
    use_pallas: bool = False

    @property
    def base_size(self) -> int:
        s0 = self.image_size // (2 ** len(self.widths))
        assert s0 * (2 ** len(self.widths)) == self.image_size, (
            f"image_size {self.image_size} not divisible by 2^{len(self.widths)}"
        )
        return s0

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        s0 = self.base_size
        ks = _split(key, 2 + len(self.widths))
        params: Params = {}
        state: State = {}
        in_dim = self.z_dim + self.num_classes
        params["dense"] = L.dense_init(ks[0], in_dim, s0 * s0 * self.widths[0])
        params["bn0"], state["bn0"] = L.batchnorm_init(self.widths[0])
        prev = self.widths[0]
        for i, w in enumerate(self.widths[1:]):
            params[f"deconv{i}"] = L.deconv2d_init(ks[1 + i], prev, w, kernel=self.kernel)
            params[f"bn{i + 1}"], state[f"bn{i + 1}"] = L.batchnorm_init(w)
            prev = w
        # Output deconv carries weight-norm (SURVEY.md Appendix B).
        params["deconv_out"] = L.deconv2d_init(
            ks[-1], prev, self.channels, kernel=self.kernel, weight_norm=True
        )
        return params, state

    def apply(
        self,
        params: Params,
        state: State,
        z: jax.Array,
        y: jax.Array,
        *,
        train: bool,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, State]:
        s0 = self.base_size
        y1h = L.onehot(y, self.num_classes, dtype=z.dtype)
        h = L.dense_apply(params["dense"], jnp.concatenate([z, y1h], axis=-1))
        h = h.reshape(h.shape[0], s0, s0, self.widths[0])
        new_state: State = {}
        h, new_state["bn0"] = L.batchnorm_act_apply(
            params["bn0"], state["bn0"], h, train=train, act="relu",
            momentum=self.bn_momentum, axis_name=axis_name, use_pallas=self.use_pallas,
        )
        for i in range(len(self.widths) - 1):
            h = L.deconv2d_apply(params[f"deconv{i}"], h, stride=2)
            h, new_state[f"bn{i + 1}"] = L.batchnorm_act_apply(
                params[f"bn{i + 1}"], state[f"bn{i + 1}"], h, train=train, act="relu",
                momentum=self.bn_momentum, axis_name=axis_name, use_pallas=self.use_pallas,
            )
        # weight-norm output deconv + tanh, fused epilogue under Pallas
        h = L.deconv2d_wn_act_apply(
            params["deconv_out"], h, stride=2, act="tanh", use_pallas=self.use_pallas
        )
        return h, new_state


# ===========================================================================
# Discriminator
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class Discriminator:
    """D(x, y) → real-pair logit.  (SURVEY.md Appendix B "D")."""

    image_size: int = 32
    channels: int = 3
    num_classes: int = 10
    widths: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    strides: Tuple[int, ...] = (1, 2, 1, 2, 1, 2)
    kernel: int = 3
    input_noise: float = 0.05
    input_dropout: float = 0.2
    block_dropout: float = 0.2
    lrelu_slope: float = 0.2
    # Re-concat broadcast label planes at the intermediate feature maps after
    # each stride-2 block (SURVEY.md Appendix B: "y re-concatenated at
    # intermediate feature maps"); False = input + GAP-head concat only.
    label_reconcat: bool = True
    use_pallas: bool = False

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        assert len(self.widths) == len(self.strides)
        ks = _split(key, len(self.widths) + 1)
        params: Params = {}
        in_ch = self.channels + self.num_classes  # label planes concatenated at input
        for i, (w, s) in enumerate(zip(self.widths, self.strides)):
            params[f"conv{i}"] = L.conv2d_init(
                ks[i], in_ch, w, kernel=self.kernel, weight_norm=True
            )
            in_ch = w
            if s == 2 and self.label_reconcat and i + 1 < len(self.widths):
                in_ch += self.num_classes
        # Head: GAP features ⊕ onehot(y) → 1 logit (label re-concat at the top).
        params["head"] = L.dense_init(
            ks[-1], self.widths[-1] + self.num_classes, 1, weight_norm=True
        )
        return params, {}

    def apply(
        self,
        params: Params,
        state: State,
        x: jax.Array,
        y: jax.Array,
        *,
        train: bool,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, State]:
        del axis_name  # D has no batch-norm (weight-norm only), nothing to sync
        n_stoch = 2 + sum(1 for s in self.strides if s == 2)
        keys = _split(rng, n_stoch)
        ki = 0
        y1h = L.onehot(y, self.num_classes, dtype=x.dtype)
        h = L.label_concat_spatial(x, y1h)
        h = L.gaussian_noise(keys[ki], h, self.input_noise, train=train); ki += 1
        h = L.dropout(keys[ki], h, self.input_dropout, train=train); ki += 1
        for i, (w, s) in enumerate(zip(self.widths, self.strides)):
            h = L.conv2d_wn_act_apply(
                params[f"conv{i}"], h, stride=s, act="leaky_relu",
                slope=self.lrelu_slope, use_pallas=self.use_pallas,
            )
            if s == 2:
                h = L.dropout(keys[ki], h, self.block_dropout, train=train); ki += 1
                if self.label_reconcat and i + 1 < len(self.widths):
                    # Label planes re-injected at the downsampled resolution
                    # (SURVEY.md Appendix B).
                    h = L.label_concat_spatial(h, y1h)
        h = L.global_avg_pool(h)
        h = jnp.concatenate([h, y1h], axis=-1)
        logit = L.dense_apply(params["head"], h)
        return logit[:, 0], state


# ===========================================================================
# Classifier
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class Classifier:
    """p(y|x) CNN — "conv-large" for CIFAR, scaled down for MNIST/SVHN.

    (SURVEY.md Appendix B "C": Gaussian noise σ≈0.15 → 3×conv3x3-128 BN+lReLU
    → maxpool+dropout → 3×conv3x3-256 → maxpool+dropout → conv3x3-512 VALID →
    NiN 1×1-256 → NiN 1×1-128 → GAP → dense 10.)
    """

    image_size: int = 32
    channels: int = 3
    num_classes: int = 10
    conv_blocks: Tuple[Tuple[int, ...], ...] = ((128, 128, 128), (256, 256, 256))
    tail: Tuple[int, ...] = (512, 256, 128)  # first is 3x3 VALID conv, rest are NiN 1x1
    input_noise: float = 0.15
    block_dropout: float = 0.5
    lrelu_slope: float = 0.1
    bn_momentum: float = 0.99
    use_pallas: bool = False

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        n_convs = sum(len(b) for b in self.conv_blocks) + len(self.tail)
        ks = _split(key, n_convs + 1)
        params: Params = {}
        state: State = {}
        in_ch = self.channels
        idx = 0
        for bi, block in enumerate(self.conv_blocks):
            for ci, w in enumerate(block):
                name = f"b{bi}c{ci}"
                params[name] = L.conv2d_init(ks[idx], in_ch, w, kernel=3, use_bias=False)
                params[f"{name}_bn"], state[f"{name}_bn"] = L.batchnorm_init(w)
                in_ch = w
                idx += 1
        for ti, w in enumerate(self.tail):
            name = f"t{ti}"
            k = 3 if ti == 0 else 1
            params[name] = L.conv2d_init(ks[idx], in_ch, w, kernel=k, use_bias=False)
            params[f"{name}_bn"], state[f"{name}_bn"] = L.batchnorm_init(w)
            in_ch = w
            idx += 1
        params["head"] = L.dense_init(ks[-1], in_ch, self.num_classes)
        return params, state

    def apply(
        self,
        params: Params,
        state: State,
        x: jax.Array,
        *,
        train: bool,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
        return_features: bool = False,
    ) -> Tuple[jax.Array, State]:
        """``return_features=True`` additionally yields the GAP penultimate
        activations (the classifier's pool features, used as the built-in
        FID feature space) — the output becomes ``((logits, feats), state)``."""
        n_stoch = 1 + len(self.conv_blocks)
        keys = _split(rng, n_stoch)
        ki = 0
        new_state: State = {}
        h = L.gaussian_noise(keys[ki], x, self.input_noise, train=train); ki += 1
        for bi, block in enumerate(self.conv_blocks):
            for ci in range(len(block)):
                name = f"b{bi}c{ci}"
                h = L.conv2d_apply(params[name], h)
                h, new_state[f"{name}_bn"] = L.batchnorm_act_apply(
                    params[f"{name}_bn"], state[f"{name}_bn"], h,
                    train=train, act="leaky_relu", slope=self.lrelu_slope,
                    momentum=self.bn_momentum, axis_name=axis_name,
                    use_pallas=self.use_pallas,
                )
            h = L.max_pool(h)
            h = L.dropout(keys[ki], h, self.block_dropout, train=train); ki += 1
        for ti in range(len(self.tail)):
            name = f"t{ti}"
            pad = "VALID" if ti == 0 else "SAME"
            h = L.conv2d_apply(params[name], h, padding=pad)
            h, new_state[f"{name}_bn"] = L.batchnorm_act_apply(
                params[f"{name}_bn"], state[f"{name}_bn"], h,
                train=train, act="leaky_relu", slope=self.lrelu_slope,
                momentum=self.bn_momentum, axis_name=axis_name,
                use_pallas=self.use_pallas,
            )
        h = L.global_avg_pool(h)
        logits = L.dense_apply(params["head"], h)
        if return_features:
            return (logits, h), new_state
        return logits, new_state
