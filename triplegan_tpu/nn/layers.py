"""Pure-functional layer helpers (the rebuild of the reference's layer base).

Reference parity (SURVEY.md §2.1 #4 — ``Model/model_base.py`` [T]): the
reference exposes graph-builder helpers ``_conv2d``, ``_deconv2d``, ``_dense``,
``_batch_norm``, ``_weight_norm``, ``_gaussian_noise``, ``_dropout``,
``_leaky_relu``. Here each helper is an ``<layer>_init(key, ...) -> params``
plus ``<layer>_apply(params, x, ...) -> y`` pair over plain-dict pytrees, so
everything composes with jax transforms (jit / grad / shard_map / vmap).

TPU-first notes:
  * layouts are NHWC with channels last (lane dimension) so XLA tiles convs
    onto the MXU without transposes;
  * batch-norm supports a cross-device ``axis_name`` psum so a data-parallel
    step reproduces single-device global-batch statistics exactly (sync-BN);
  * weight normalization (w = g * v / ||v||) is folded into the kernel before
    the conv, so the MXU sees an ordinary conv — the normalization itself is
    a tiny per-output-channel reduction XLA fuses away.

Numerical conventions match the TF-1.x reference semantics:
  * ``SAME`` padding for stride-2 conv/deconv (TF ``conv2d_transpose`` SAME:
    out = in * stride);
  * batch-norm defaults momentum=0.99, eps=1e-3 (``tf.layers.batch_normalization``
    defaults the reference would inherit).
"""

from __future__ import annotations

import functools as _functools
import math
import os as _os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]
State = Dict[str, Any]

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def _normal(key: jax.Array, shape: Sequence[int], stddev: float) -> jax.Array:
    return stddev * jax.random.normal(key, tuple(shape), dtype=jnp.float32)


def he_normal(key: jax.Array, shape: Sequence[int], fan_in: int) -> jax.Array:
    return _normal(key, shape, math.sqrt(2.0 / max(fan_in, 1)))


# ---------------------------------------------------------------------------
# Weight normalization  (Salimans & Kingma 2016) — reference's `_weight_norm`
# ---------------------------------------------------------------------------


def _wn_kernel(v: jax.Array, g: jax.Array, reduce_axes: Tuple[int, ...]) -> jax.Array:
    """w = g * v / ||v||, per output channel (last axis of v)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=reduce_axes, keepdims=True) + 1e-12)
    return v * (g / jnp.squeeze(norm, axis=reduce_axes))


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    *,
    weight_norm: bool = False,
    w_std: float = 0.05,
    use_bias: bool = True,
) -> Params:
    v = _normal(key, (in_dim, out_dim), w_std)
    p: Params = {}
    if weight_norm:
        p["v"] = v
        p["g"] = jnp.ones((out_dim,), jnp.float32)
    else:
        p["w"] = v
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense_apply(p: Params, x: jax.Array) -> jax.Array:
    if "v" in p:
        w = _wn_kernel(p["v"], p["g"], (0,))
    else:
        w = p["w"]
    # The MXU accumulates bf16 matmuls in f32 internally; output rounds to
    # the compute dtype once. (An explicit f32 preferred_element_type would
    # break the bf16 backward pass: the transposed op would mix dtypes.)
    y = jnp.dot(x, w.astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv2D (NHWC, HWIO)  — reference's `_conv2d`
# ---------------------------------------------------------------------------

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    *,
    kernel: int = 3,
    weight_norm: bool = False,
    w_std: float = 0.05,
    use_bias: bool = True,
) -> Params:
    shape = (kernel, kernel, in_ch, out_ch)
    v = _normal(key, shape, w_std)
    p: Params = {}
    if weight_norm:
        p["v"] = v
        p["g"] = jnp.ones((out_ch,), jnp.float32)
    else:
        p["w"] = v
    if use_bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def _conv3x3_patches(x: jax.Array, w: jax.Array, padding: str) -> jax.Array:
    """3×3 stride-1 conv as explicit patches + one K=9·Cin matmul.

    For first-layer convs with tiny Cin (classifier Cin=3, D's image⊕label
    input Cin=13), XLA's direct conv runs at 6–22% MXU (r3 trace): the
    implicit-GEMM contraction depth 9·Cin ≪ 128 and the filter-gradient
    orientation is worse still (M=Cin sublane rows). Materializing the nine
    shifted views and contracting once makes forward a (N·H·W, 9Cin)×(9Cin,
    Cout) dot, and — via this formulation's autodiff transpose — the wgrad a
    K-huge reduction dot and the dgrad a K=Cout dot + overlap-add, all far
    better MXU shapes. Measured A/B in docs/DESIGN.md's perf journal.
    """
    pad = 1 if padding == "SAME" else 0
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
    n, hp, wp, c = xp.shape
    ho, wo = hp - 2, wp - 2
    patches = jnp.concatenate(
        [xp[:, dy : dy + ho, dx : dx + wo, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (N, Ho, Wo, 9C) — same (dy, dx, c) order as w.reshape(9C, Cout)
    y = lax.dot_general(
        patches.reshape(-1, 9 * c),
        w.reshape(9 * c, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(n, ho, wo, -1).astype(x.dtype)


# A/B 2026-08-17 (full step, real chip): patches 7106 img/s vs direct-conv
# 8440 — the materialized 9·Cin patches tensor is pure extra HBM traffic
# (D's 768-row 13-channel input: 184 MB per use), and the first-layer convs
# are HBM-bound, not MXU-bound (fwd writes its 67 MB output at ≥82 µs floor
# vs 110 µs measured), so there was never the MXU headroom the utilization
# number suggested. Kept off-by-default (TRIPLEGAN_SMALLCIN=patches, read at
# trace time so tests can flip it) with this record.


def conv2d_apply(
    p: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: str = "SAME",
) -> jax.Array:
    if "v" in p:
        w = _wn_kernel(p["v"], p["g"], (0, 1, 2))
    else:
        w = p["w"]
    if (
        _os.environ.get("TRIPLEGAN_SMALLCIN", "conv") == "patches"
        and w.shape[0] == w.shape[1] == 3
        and stride == 1
        and 9 * w.shape[2] <= 128
    ):
        y = _conv3x3_patches(x, w.astype(x.dtype), padding)
    else:
        dn = lax.conv_dimension_numbers(x.shape, w.shape, _CONV_DIMS)
        y = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=dn,
        )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Transposed Conv2D — reference's `_deconv2d` (TF conv2d_transpose SAME)
# ---------------------------------------------------------------------------


def deconv2d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    *,
    kernel: int = 5,
    weight_norm: bool = False,
    w_std: float = 0.05,
    use_bias: bool = True,
) -> Params:
    # HWIO with I = in_ch of the *forward* (transposed) op.
    shape = (kernel, kernel, in_ch, out_ch)
    v = _normal(key, shape, w_std)
    p: Params = {}
    if weight_norm:
        p["v"] = v
        p["g"] = jnp.ones((out_ch,), jnp.float32)
    else:
        p["w"] = v
    if use_bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def _subpixel_plan(k: int, s: int) -> Tuple[list, int, int]:
    """Phase decomposition of a stride-``s`` SAME transposed conv.

    ``lax.conv_transpose(..., 'SAME')`` convolves a zero-dilated input; on
    the MXU that wastes (s²−1)/s² of the systolic work multiplying zeros and
    tiles poorly (measured 41% MXU utilization vs 81% for dense convs). The
    identical math regroups by output phase a = o mod s:

        y[s·i + a] = Σ_p w[p] · x[i + (a + p − pad_a)/s]   (integral terms)

    i.e. one DENSE conv per phase with a small kernel of the parity-matching
    taps — emitted here as a single conv with s²·C_out output channels
    followed by a depth-to-space interleave. Returns (per-phase tap lists
    [(p, offset)], d_min, d_max) where offsets index the dense kernel.
    """
    # Begin-padding exactly as jax._src.lax._conv_transpose_padding('SAME').
    pad_len = k + s - 2
    pad_a = k - 1 if s > k - 1 else int(math.ceil(pad_len / 2))
    phases = []
    offsets = []
    for a in range(s):
        taps = [
            (p, (a + p - pad_a) // s)
            for p in range(k)
            if (a + p - pad_a) % s == 0
        ]
        phases.append(taps)
        offsets += [d for _, d in taps]
    return phases, min(offsets), max(offsets)


def _deconv2d_subpixel(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """Dense-conv + depth-to-space evaluation of ``conv_transpose`` SAME.

    Bit-identical math to ``lax.conv_transpose(x, w, (s, s), 'SAME',
    transpose_kernel=False)`` (same taps, different summation grouping);
    asserted against it in tests/test_layers.py. AD through this gives
    dense-conv backward passes, so the efficiency carries to the gradient.
    """
    k, _, cin, cout = w.shape
    s = stride
    n, h, wd, _ = x.shape
    phases, d_min, d_max = _subpixel_plan(k, s)
    kk = d_max - d_min + 1
    # Assemble the (kk, kk, cin, s*s*cout) phase kernel from w's taps.
    wp = jnp.zeros((kk, kk, cin, s * s, cout), w.dtype)
    for a in range(s):
        for b in range(s):
            for (pu, du) in phases[a]:
                for (pv, dv) in phases[b]:
                    wp = wp.at[du - d_min, dv - d_min, :, a * s + b, :].set(
                        w[pu, pv]
                    )
    wp = wp.reshape(kk, kk, cin, s * s * cout)
    dn = lax.conv_dimension_numbers(x.shape, wp.shape, _CONV_DIMS)
    pad = ((-d_min, d_max), (-d_min, d_max))
    y = lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), pad, dimension_numbers=dn
    )
    # (n, h, w, s, s, cout) -> interleave phases into space.
    y = y.reshape(n, h, wd, s, s, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * s, wd * s, cout)
    return y



_DECONV_IMPL = _os.environ.get("TRIPLEGAN_DECONV", "subpixel")


def deconv2d_apply(
    p: Params,
    x: jax.Array,
    *,
    stride: int = 2,
) -> jax.Array:
    """TF-semantics `conv2d_transpose` with SAME padding: out = in * stride.

    Evaluated as a subpixel (phase-grouped dense) conv — see
    ``_deconv2d_subpixel`` — which matches ``lax.conv_transpose`` exactly
    while keeping the MXU on dense work. TRIPLEGAN_DECONV=transpose selects
    the lax.conv_transpose lowering (for A/B measurement).
    """
    if "v" in p:
        w = _wn_kernel(p["v"], p["g"], (0, 1, 2))
    else:
        w = p["w"]
    y = _deconv_raw(x, w, stride)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y.astype(x.dtype)


def _deconv_raw(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """The deconv lowering behind TRIPLEGAN_DECONV — shared by every deconv
    path (incl. the Pallas-epilogue variant) so A/B measurements apply
    uniformly; subpixel default measured +7% step throughput (DESIGN.md)."""
    if _DECONV_IMPL == "transpose":
        return lax.conv_transpose(
            x,
            w.astype(x.dtype),
            strides=(stride, stride),
            padding="SAME",
            dimension_numbers=_CONV_DIMS,
            transpose_kernel=False,
        )
    return _deconv2d_subpixel(x, w.astype(x.dtype), stride)


# ---------------------------------------------------------------------------
# Batch normalization — reference's `_batch_norm`
# ---------------------------------------------------------------------------


def batchnorm_init(num_features: int) -> Tuple[Params, State]:
    params = {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def batchnorm_apply(
    p: Params,
    s: State,
    x: jax.Array,
    *,
    train: bool,
    momentum: float = 0.99,
    eps: float = 1e-3,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, State]:
    """BN over all axes but the last (channel) axis.

    With ``axis_name`` set (inside shard_map/pmap), moments are psum-averaged
    across the mesh axis so the data-parallel step reproduces single-device
    global-batch statistics bit-for-bit in expectation (sync-BN) — this is
    what makes `sharded step == single-device step` testable (SURVEY.md §4.6).
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        new_s = {
            "mean": momentum * s["mean"] + (1.0 - momentum) * mean,
            "var": momentum * s["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + eps) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_s


# ---------------------------------------------------------------------------
# Stochastic layers — reference's `_gaussian_noise` / `_dropout`
# ---------------------------------------------------------------------------


def gaussian_noise(key: Optional[jax.Array], x: jax.Array, sigma: float, *, train: bool) -> jax.Array:
    if not train or sigma <= 0.0 or key is None:
        return x
    return x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float, *, train: bool) -> jax.Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    if _os.environ.get("TRIPLEGAN_DROPOUT_BITS", "32") == "8":
        # Measured variant (docs/DESIGN.md perf journal): draw the mask from
        # uint8 random bits instead of the u32-bits→f32-uniform bernoulli
        # path — 4× less RNG material generated, moved between layouts, and
        # kept as AD residuals. The keep probability quantizes to n/256
        # (exact for the networks' 0.5; ≤0.4% relative bias otherwise),
        # and the scale uses the ACTUAL quantized keep so the estimator
        # stays unbiased.
        thresh = max(int(round(keep * 256.0)), 1)
        if thresh >= 256:
            # keep rounds to 256/256 = 1.0 on the u8 grid — dropout is a
            # no-op. Must early-return: `bits < 256` would wrap the Python
            # int to uint8 0 and silently zero the whole activation.
            return x
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
        mask = (bits < thresh).astype(x.dtype) * (256.0 / thresh)
        return x * mask
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    # multiply (not select): the scaled mask fuses into neighboring
    # elementwise chains and its VJP is a plain multiply too.
    return x * (mask.astype(x.dtype) * (1.0 / keep))


# ---------------------------------------------------------------------------
# Activations / pooling — reference's `_leaky_relu` etc.
# ---------------------------------------------------------------------------


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# Fused epilogues (Pallas when enabled — SURVEY.md §2.2 north-star kernels)
# ---------------------------------------------------------------------------


def _apply_act(x: jax.Array, act: Optional[str], slope: float) -> jax.Array:
    if act is None or act == "linear":
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "leaky_relu":
        return leaky_relu(x, slope)
    if act == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown act {act!r}")


def _scale_bias_act(x, k, b, act, slope, use_pallas):
    """Per-channel affine + activation: Pallas fused kernel when requested
    (interpreted off-TPU so tests run anywhere), plain XLA otherwise."""
    if use_pallas:
        from triplegan_tpu.ops.pallas_fused import scale_bias_act

        interpret = jax.default_backend() != "tpu"
        return scale_bias_act(x, k, b, act or "linear", slope, interpret)
    return _apply_act(x * k + b, act, slope).astype(x.dtype)


def batchnorm_act_apply(
    p: Params,
    s: State,
    x: jax.Array,
    *,
    train: bool,
    act: Optional[str] = None,
    slope: float = 0.1,
    momentum: float = 0.99,
    eps: float = 1e-3,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
) -> Tuple[jax.Array, State]:
    """Batch-norm folded to per-channel affine + fused activation:
    y = act(x·k + b), k = scale·rsqrt(var+eps), b = bias − mean·k.
    Same moment/running-stat semantics as ``batchnorm_apply``."""
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        new_s = {
            "mean": momentum * s["mean"] + (1.0 - momentum) * mean,
            "var": momentum * s["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    k = p["scale"] * lax.rsqrt(var + eps)
    b = p["bias"] - mean * k
    y = _scale_bias_act(x, k.astype(x.dtype), b.astype(x.dtype), act, slope, use_pallas)
    return y, new_s


def conv2d_wn_act_apply(
    p: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    padding: str = "SAME",
    act: Optional[str] = None,
    slope: float = 0.2,
    use_pallas: bool = False,
) -> jax.Array:
    """Weight-norm conv with the normalization as a fused epilogue.

    conv(x, v·g/‖v‖) ≡ conv(x, v)·(g/‖v‖) per output channel (convolution is
    linear in the kernel), so the MXU runs the raw-v conv and the Pallas
    epilogue applies scale+bias+activation in one VMEM pass — the north-star
    "conv + weight-norm (+BN) + leaky-ReLU" fusion [B].
    """
    if "v" not in p or not use_pallas:
        y = conv2d_apply(p, x, stride=stride, padding=padding)
        return _apply_act(y, act, slope)
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + 1e-12)
    k = (g / norm).astype(x.dtype)
    b = p.get("b", jnp.zeros_like(g)).astype(x.dtype)
    dn = lax.conv_dimension_numbers(x.shape, v.shape, _CONV_DIMS)
    y = lax.conv_general_dilated(
        x,
        v.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=dn,
    ).astype(x.dtype)
    return _scale_bias_act(y, k, b, act, slope, True)


def deconv2d_wn_act_apply(
    p: Params,
    x: jax.Array,
    *,
    stride: int = 2,
    act: Optional[str] = None,
    slope: float = 0.2,
    use_pallas: bool = False,
) -> jax.Array:
    """Weight-norm transposed conv with fused epilogue (same linearity trick)
    — the north-star "transposed-conv + weight-norm" kernel [B]."""
    if "v" not in p or not use_pallas:
        y = deconv2d_apply(p, x, stride=stride)
        return _apply_act(y, act, slope)
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + 1e-12)
    k = (g / norm).astype(x.dtype)
    b = p.get("b", jnp.zeros_like(g)).astype(x.dtype)
    y = _deconv_raw(x, v, stride).astype(x.dtype)
    return _scale_bias_act(y, k, b, act, slope, True)


# reduce_window wins on TPU when combined with the subpixel deconv
# (A/B 2026-08-16: subpixel+window 8390 img/s vs subpixel+reshape 7672 —
# the reshape form's relayouts interfere with neighboring conv fusions).
_MAXPOOL_IMPL = _os.environ.get("TRIPLEGAN_MAXPOOL", "window")


def _reduce_window_max(x: jax.Array, window: int, stride: int) -> jax.Array:
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "SAME",
    )


def _pool_repeat(a: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """Broadcast a pooled map back to input positions (stride == window:
    each input position belongs to exactly one window, SAME padding)."""
    a = jnp.repeat(a, window, axis=1)[:, :h]
    return jnp.repeat(a, window, axis=2)[:, :, :w]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_maskbwd(x: jax.Array, window: int) -> jax.Array:
    return _reduce_window_max(x, window, window)


def _mp_fwd(x, window):
    y = _reduce_window_max(x, window, window)
    return y, (x, y)


def _mp_bwd(window, res, g):
    x, y = res
    _, h, w, _ = x.shape
    mask = (x == _pool_repeat(y, window, h, w)).astype(g.dtype)
    # Split the window's gradient evenly across ties (select_and_scatter
    # sends it all to one element; ties are rare in f32, real in bf16 —
    # even-split keeps the total gradient mass identical either way).
    cnt = lax.reduce_window(
        mask, jnp.zeros((), g.dtype), lax.add,
        (1, window, window, 1), (1, window, window, 1), "SAME",
    )
    return (mask * _pool_repeat(g / cnt, window, h, w),)


_max_pool_maskbwd.defvjp(_mp_fwd, _mp_bwd)


def max_pool(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    if (
        _MAXPOOL_IMPL == "reshape"
        and window == stride
        and h % window == 0
        and w % window == 0
    ):
        # Non-overlapping pooling on divisible dims: reshape + max reduce.
        # Equivalent to reduce_window but avoids its slow TPU lowering
        # (profiled 3.3 ms/step fwd + a 2.0 ms select-and-scatter bwd; the
        # reshape form lowers to plain fusions on both passes).
        y = x.reshape(n, h // window, window, w // window, window, c)
        return y.max(axis=(2, 4))
    if (
        _MAXPOOL_IMPL == "maskbwd"
        and window == stride
        and jnp.issubdtype(x.dtype, jnp.floating)
    ):
        # reduce_window forward (fusion-friendly layout, same as default)
        # with a mask-based custom VJP: the backward becomes elementwise
        # compare/multiply fusions instead of TPU's slow select_and_scatter.
        return _max_pool_maskbwd(x, window)
    return _reduce_window_max(x, window, stride)


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))


def onehot(labels: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def label_concat_spatial(x: jax.Array, y_onehot: jax.Array) -> jax.Array:
    """Broadcast one-hot labels to spatial planes and concat on channels.

    The reference's "label embedding-concat" for the discriminator input
    (SURVEY.md Appendix A: labels broadcast-concatenated spatially for D).
    """
    n, h, w, _ = x.shape
    planes = jnp.broadcast_to(
        y_onehot[:, None, None, :].astype(x.dtype), (n, h, w, y_onehot.shape[-1])
    )
    return jnp.concatenate([x, planes], axis=-1)
