"""Layer-level conv A/B microbenchmark: XLA vs Pallas vs Winograd.

Times a single conv op (forward, or forward+VJP) on the real chip with the
ops chained through a data dependency inside one jitted lax.scan — per-op
duration is wall/iters with no dispatch noise. The chain feeds each
iteration's weight from the previous output's first element ×0.0 (XLA must
preserve NaN semantics, so ×0.0 is not folded and the dependency is real).

Usage:  python tools/convbench.py [shape ...]
Env:    CB_ITERS (default 50), CB_DTYPE (default bfloat16), CB_IMPLS.

Results feed docs/DESIGN.md's perf journal (VERDICT r2 next-step #1).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from triplegan_tpu.ops.pallas_conv import conv3x3, reference_conv3x3
from triplegan_tpu.ops.winograd import conv3x3_winograd

# (name, N, H, W, Cin, Cout, padding) — the classifier's layer shapes at the
# bench batch (256) plus D's batched first layer (768 rows, 13 channels).
SHAPES = [
    ("clf_b0c1_32x128", 256, 32, 32, 128, 128, "SAME"),
    ("clf_b1c1_16x256", 256, 16, 16, 256, 256, "SAME"),
    ("clf_t0_8x256to512", 256, 8, 8, 256, 512, "VALID"),
    ("clf_b0c0_32x3to128", 256, 32, 32, 3, 128, "SAME"),
    ("disc_c0_32x13to32", 768, 32, 32, 13, 32, "SAME"),
]


def make_impl(impl: str, padding: str):
    if impl == "xla":
        return functools.partial(reference_conv3x3, padding=padding)
    if impl == "pallas":
        return lambda x, w: conv3x3(x, w, padding)
    if impl == "winograd":
        if padding != "SAME":
            return None
        return conv3x3_winograd
    if impl == "patches":
        from triplegan_tpu.nn.layers import _conv3x3_patches

        return lambda x, w: _conv3x3_patches(x, w, padding)
    if impl == "noop":
        # Measures the chain overhead itself (the per-iteration elementwise
        # touches of x and w): subtract from the op rows.
        return lambda x, w: x
    raise ValueError(impl)


def bench(fn, x, w, iters: int, mode: str):
    # Chain iterations through a single-element read scaled by 1e-30 (not
    # ×0.0, and not ravel(): a ravel of the NHWC output forces a full
    # relayout copy that polluted the first measurements). BOTH operands are
    # made iteration-dependent: with a constant x the wgrad (xᵀ·g, w-free)
    # hoists out of the scan, and with a constant-ones cotangent both grads
    # collapse to reductions — so the loss projects onto a fixed random G
    # and x is re-derived from the carry each iteration. The "noop" impl
    # row measures the chain's own cost; subtract it.
    gproj = None
    if mode != "fwd":
        gshape = jax.eval_shape(fn, x, w).shape
        gproj = jnp.asarray(
            np.random.RandomState(7).randn(*gshape) * 0.01, jnp.float32
        )

    if mode == "fwd":
        def body(c, _):
            xi = (x.astype(jnp.float32) + c * 1e-30).astype(x.dtype)
            wi = (w.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(w.dtype)
            y = fn(xi, wi)
            return y[0, 0, 0, 0].astype(jnp.float32) * 1e-30, None
    else:  # fwd+vjp
        def loss(xx, ww):
            return jnp.sum(fn(xx, ww).astype(jnp.float32) * gproj)

        gfn = jax.grad(loss, argnums=(0, 1))

        def body(c, _):
            xi = (x.astype(jnp.float32) + c * 1e-30).astype(x.dtype)
            wi = (w.astype(jnp.float32) * (1.0 + c * 1e-30)).astype(w.dtype)
            dx, dw = gfn(xi, wi)
            return (
                dw[0, 0, 0, 0].astype(jnp.float32)
                + dx[0, 0, 0, 0].astype(jnp.float32)
            ) * 1e-30, None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    r = run()
    float(r)  # compile + warm
    t0 = time.perf_counter()
    r = run()
    float(r)  # hard fence
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(os.environ.get("CB_ITERS", "50"))
    dtype = jnp.bfloat16 if os.environ.get("CB_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    impls = os.environ.get("CB_IMPLS", "xla,pallas,winograd").split(",")
    only = set(sys.argv[1:])
    rng = np.random.RandomState(0)
    print(f"{'shape':<22} {'impl':<9} {'mode':<7} {'us/op':>8} {'TF/s':>7} {'MXU%':>6}")
    for name, n, h, w_, cin, cout, pad in SHAPES:
        if only and name not in only:
            continue
        x = jnp.asarray(rng.randn(n, h, w_, cin) * 0.5, dtype)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) / np.sqrt(9 * cin), dtype)
        ho = h if pad == "SAME" else h - 2
        wo = w_ if pad == "SAME" else w_ - 2
        flops_fwd = 2 * n * ho * wo * 9 * cin * cout
        for impl in impls:
            fn = make_impl(impl, pad)
            if fn is None:
                continue
            for mode in ("fwd", "fwdbwd"):
                try:
                    sec = bench(fn, x, wk, iters, mode)
                except Exception as e:
                    print(f"{name:<22} {impl:<9} {mode:<7}    FAIL {type(e).__name__}: {str(e)[:60]}")
                    continue
                fl = flops_fwd * (1 if mode == "fwd" else 3)
                tfs = fl / sec / 1e12
                print(f"{name:<22} {impl:<9} {mode:<7} {sec*1e6:8.1f} {tfs:7.1f} {100*tfs/197:6.1f}")


if __name__ == "__main__":
    main()
