"""Winograd F(2×2, 3×3) convolution (NHWC, stride 1, SAME) for empirical A/B.

VERDICT r2 next-step #1c: round 2 rejected Winograd *analytically* (4× tile
inflation adds more HBM traffic than MXU time saved without a fused kernel);
this module exists to test that claim *empirically* on one layer
(tools/convbench.py, results in docs/DESIGN.md's perf journal).

Arithmetic: the 3×3 conv over each 2×2 output tile becomes 16 elementwise-
indexed matmuls of contraction depth Cin — 16/36 of direct-conv MACs
(2.25× fewer), paid for with input/output tile transforms (4×4 butterflies)
and a 4× blow-up of the activation tensor streamed through HBM.

Transform matrices (Lavin & Gray 2015):
    Bᵀ = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G  = [[1,0,0],[½,½,½],[½,−½,½],[0,0,1]]
    Aᵀ = [[1,1,1,0],[0,1,-1,-1]]
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def conv3x3_winograd(x: jax.Array, w: jax.Array) -> jax.Array:
    """3×3 stride-1 SAME conv via F(2×2,3×3). Requires even H and W.

    ``x``: (N, H, W, Cin); ``w``: (3, 3, Cin, Cout) → (N, H, W, Cout).
    Matmuls run in the input dtype (bf16 on the bench path); transforms and
    accumulation in f32.
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, "F(2,3) tiles need even H, W"
    h2, w2 = h // 2, wd // 2
    bt = jnp.asarray(_BT)
    at = jnp.asarray(_AT)
    g = jnp.asarray(_G)

    # Kernel transform U = G w Gᵀ  → (4, 4, Cin, Cout)
    u = jnp.einsum("ki,ijco,lj->klco", g, w.astype(jnp.float32), g)

    # Overlapping 4×4 input tiles at stride 2: tile t covers rows 2t..2t+3
    # of the SAME-padded input; gathered as 16 strided slices (no gather op).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for dy in range(4):
        cols = []
        for dx in range(4):
            cols.append(xp[:, dy : dy + 2 * h2 : 2, dx : dx + 2 * w2 : 2, :])
        rows.append(jnp.stack(cols))
    tiles = jnp.stack(rows)  # (4, 4, N, H2, W2, Cin)

    # Input transform V = Bᵀ X B over the two tile axes (f32 butterflies).
    v = jnp.einsum(
        "ki,ijnhwc,lj->klnhwc", bt, tiles.astype(jnp.float32), bt
    ).astype(x.dtype)

    # 16 batched matmuls in the Winograd domain.
    m = jnp.einsum(
        "klnhwc,klcd->klnhwd", v, u.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )

    # Output transform Y = Aᵀ M A → (2, 2, N, H2, W2, Cout), then interleave
    # the 2×2 phases back into (N, H, W, Cout).
    y = jnp.einsum("ak,klnhwd,bl->nhawbd", at, m, at)
    return y.reshape(n, h, wd, cout).astype(x.dtype)
