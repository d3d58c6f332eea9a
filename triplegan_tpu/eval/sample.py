"""Class-conditional sample grids (reference's Testing/ sample script,
SURVEY.md §3.3): a fixed z grid crossed with all labels → one row per class,
de-normalized from G's tanh range back to uint8 pixels, saved as PNG."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_sample_fn(cfg, nets):
    """Returns jittable ``(state, z, labels) -> images`` in [-1, 1].

    G samples in EVAL mode (BN running statistics), matching the reference's
    ``is_training=False`` reuse graph for sampling.
    """
    gen, _, _ = nets

    def sample(state, z, labels):
        x, _ = gen.apply(state.params["gen"], state.bn["gen"], z, labels, train=False)
        return x

    return jax.jit(sample)


def class_grid_inputs(cfg, n_per_class: int, seed: int = 0):
    """z grid × all labels: row r = class r, n_per_class columns sharing z
    across rows so per-column style is comparable (the usual GAN grid)."""
    key = jax.random.PRNGKey(seed)
    z_row = jax.random.normal(key, (n_per_class, cfg.z_dim), dtype=jnp.float32)
    z = jnp.tile(z_row, (cfg.num_classes, 1))
    labels = jnp.repeat(jnp.arange(cfg.num_classes, dtype=jnp.int32), n_per_class)
    return z, labels


def to_uint8_grid(images, n_rows: int, n_cols: int) -> np.ndarray:
    """(-1,1) NHWC device images → one (rows*H, cols*W, C) uint8 tile image."""
    x = np.asarray(images, dtype=np.float32)
    x = np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = x.shape
    assert n >= n_rows * n_cols
    x = x[: n_rows * n_cols].reshape(n_rows, n_cols, h, w, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(n_rows * h, n_cols * w, c)


def save_png(grid_uint8: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = grid_uint8
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
