"""Hand-written Mosaic/Pallas 3×3 stride-1 convolution kernels (NHWC, HWIO).

VERDICT r2 next-step #1b: the one named-but-never-built perf lever — a real
Pallas conv for the small-spatial classifier layers (reference equivalent:
the cuDNN convs behind ``tf.nn.conv2d``, SURVEY.md §2.2). XLA's convs run at
~80% of nominal MXU on these shapes; this kernel exists to measure whether a
shift-and-accumulate formulation with explicit VMEM residency can beat that.

Formulation: out[n,h,w,:] = Σ_{dy,dx} x_pad[n,h+dy,w+dx,:] @ W[dy,dx] — nine
MXU matmuls per batch-tile, each contracting (BN·Ho·Wo, Cin)×(Cin, Cout),
accumulated in f32. The input tile (with halo) is loaded into VMEM ONCE and
re-read at nine sublane offsets, so HBM traffic is exactly one pass over x
and one over out — the same as XLA's implicit-GEMM conv, but with the whole
schedule under our control.

The gradient convs reuse the same kernel:
  * dgrad: full-correlation of the padded cotangent with the spatially
    flipped, in/out-transposed kernel — again a 3×3 stride-1 conv;
  * wgrad: dW[dy,dx] = patchᵀ(x_pad, dy,dx) @ g — nine (Cin, M)×(M, Cout)
    reduction matmuls, grid-accumulated over batch tiles.

``conv3x3`` wires fwd/dgrad/wgrad into a ``jax.custom_vjp``; A/B
measurement against XLA's convs is done by ``tools/convbench.py``
(CB_IMPLS), with the verdict recorded in docs/DESIGN.md's perf journal.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_batch_tile(n: int, h: int, w: int, cin: int, cout: int,
                     vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest power-of-two batch tile whose working set fits the budget:
    x halo tile (bf16) + f32 accumulator + bf16 out + full kernel."""
    w_bytes = 9 * cin * cout * 2
    for bn in (64, 32, 16, 8, 4, 2, 1):
        if n % bn:
            continue
        x_bytes = bn * (h + 2) * (w + 2) * cin * 2
        acc_bytes = bn * h * w * cout * 4
        out_bytes = bn * h * w * cout * 2
        if w_bytes + x_bytes + acc_bytes + out_bytes <= vmem_budget:
            return bn
    return 1


def _fwd_kernel(x_ref, w_ref, o_ref, *, ho: int, wo: int, cout: int):
    bn = x_ref.shape[0]
    cin = x_ref.shape[-1]
    acc = jnp.zeros((bn * ho * wo, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[:, dy : dy + ho, dx : dx + wo, :].reshape(
                bn * ho * wo, cin
            )
            acc = acc + jnp.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    o_ref[:] = acc.reshape(bn, ho, wo, cout).astype(o_ref.dtype)


def conv3x3_nopad(x_pad: jax.Array, w: jax.Array, *,
                  interpret: bool = False) -> jax.Array:
    """3×3 stride-1 VALID conv of an already-padded input.

    ``x_pad``: (N, Ho+2, Wo+2, Cin); ``w``: (3, 3, Cin, Cout) →
    (N, Ho, Wo, Cout). The caller chooses SAME (pad by 1) / full (pad by 2)
    / true-VALID (no pad) semantics via the padding it applies.
    """
    n, hp, wp, cin = x_pad.shape
    ho, wo = hp - 2, wp - 2
    cout = w.shape[-1]
    bn = _pick_batch_tile(n, ho, wo, cin, cout)
    kern = functools.partial(_fwd_kernel, ho=ho, wo=wo, cout=cout)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x_pad.dtype),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, hp, wp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * 9 * cin * cout,
            bytes_accessed=(n * hp * wp * cin + n * ho * wo * cout) * 2
            + 9 * cin * cout * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, w)


def _wgrad_kernel(x_ref, g_ref, o_ref, *, ho: int, wo: int):
    bn = x_ref.shape[0]
    cin = x_ref.shape[-1]
    cout = g_ref.shape[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    g2 = g_ref[:].reshape(bn * ho * wo, cout)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[:, dy : dy + ho, dx : dx + wo, :].reshape(
                bn * ho * wo, cin
            )
            contrib = jax.lax.dot_general(
                patch, g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[dy, dx] = o_ref[dy, dx] + contrib


def conv3x3_wgrad(x_pad: jax.Array, g: jax.Array, *,
                  interpret: bool = False) -> jax.Array:
    """Filter gradient: dW[dy,dx] = Σ_n,h,w x_pad[n,h+dy,w+dx,:]ᵀ g[n,h,w,:].

    ``x_pad``: (N, Ho+2, Wo+2, Cin); ``g``: (N, Ho, Wo, Cout) →
    (3, 3, Cin, Cout) f32. Accumulates across batch tiles by revisiting the
    output block (sequential TPU grid).
    """
    n, hp, wp, cin = x_pad.shape
    ho, wo = hp - 2, wp - 2
    cout = g.shape[-1]
    bn = _pick_batch_tile(n, ho, wo, cin, cout)
    kern = functools.partial(_wgrad_kernel, ho=ho, wo=wo)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, hp, wp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, ho, wo, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * 9 * cin * cout,
            bytes_accessed=(n * hp * wp * cin + n * ho * wo * cout) * 2
            + 9 * cin * cout * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, g)


def _pad_hw(x: jax.Array, p: int) -> jax.Array:
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3(x: jax.Array, w: jax.Array, padding: str = "SAME",
            interpret: bool = False) -> jax.Array:
    """Differentiable 3×3 stride-1 conv (SAME or VALID) with Pallas
    forward, dgrad, and wgrad kernels. Matches
    ``lax.conv_general_dilated(x, w, (1,1), padding, NHWC/HWIO)``."""
    p = 1 if padding == "SAME" else 0
    return conv3x3_nopad(_pad_hw(x, p), w.astype(x.dtype), interpret=interpret)


def _conv3x3_fwd(x, w, padding, interpret):
    return conv3x3(x, w, padding, interpret), (x, w)


def _conv3x3_bwd(padding, interpret, res, g):
    x, w = res
    p = 1 if padding == "SAME" else 0
    # dgrad: full correlation of g with the flipped, in/out-swapped kernel.
    # SAME fwd → pad g by 1; VALID fwd → pad g by 2 (output grows back to H).
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_nopad(
        _pad_hw(g, 2 - p), w_flip.astype(g.dtype), interpret=interpret
    )
    dw = conv3x3_wgrad(_pad_hw(x, p), g, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def reference_conv3x3(x: jax.Array, w: jax.Array, padding: str = "SAME") -> jax.Array:
    """XLA reference for tests/A-B timing."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding, dimension_numbers=dn
    )
