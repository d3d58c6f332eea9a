"""ZCA whitening: fit once on host, apply on device as a single matmul.

Reference parity (SURVEY.md §2.1 #2, §3.1, §7 hard-part 5): the reference
fits ZCA statistics on the CIFAR-10 train set (numpy eigendecomposition) at
prep time, stores mean + whitening matrix, and whitens inputs to C and D at
train/eval time. TPU-native design: the fit stays a host-side float64
eigendecomposition (bit-stable, done once); the apply is a D×D (3072×3072
for CIFAR) matmul that XLA tiles straight onto the MXU — per-batch cost is
negligible and fuses with the surrounding step.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ZCAStats:
    """mean: (D,) and whitening matrix W: (D, D), D = H*W*C."""

    mean: np.ndarray
    whiten: np.ndarray

    def save(self, path: str) -> None:
        np.savez(path, mean=self.mean, whiten=self.whiten)

    @staticmethod
    def load(path: str) -> "ZCAStats":
        z = np.load(path)
        return ZCAStats(mean=z["mean"], whiten=z["whiten"])


def fit_zca(images: np.ndarray, eps: float = 1e-5) -> ZCAStats:
    """Fit ZCA on uint8/float images (N, H, W, C).

    Float64 eigendecomposition for bit-stable statistics across runs
    (SURVEY.md §7 hard-part 5). Input pixels are first rescaled to [-1, 1],
    matching the on-device `rescale` transform, so whitening composes as
    `W @ (rescale(x) - mean)`.

    N must comfortably exceed D = H·W·C: with N < D the covariance is
    rank-deficient and the whitening matrix amplifies every null-space
    direction by 1/sqrt(eps) (~316×), destroying unseen images — observed as
    chance-level eval on tiny synthetic fits. Real CIFAR-10 (N = 50k,
    D = 3072) is fine; a warning is emitted otherwise.
    """
    n = images.shape[0]
    dims = int(np.prod(images.shape[1:]))
    if n < dims:
        import warnings

        warnings.warn(
            f"fit_zca: {n} samples < {dims} dims — covariance is rank-"
            "deficient; whitening will amplify null directions on unseen "
            "data. Fit on more samples or disable ZCA.",
            stacklevel=2,
        )
    flat = images.reshape(n, -1).astype(np.float64)
    flat = flat / 127.5 - 1.0
    mean = flat.mean(axis=0)
    centered = flat - mean
    cov = centered.T @ centered / n
    # Symmetric eigendecomposition — deterministic for a fixed input.
    eigval, eigvec = np.linalg.eigh(cov)
    eigval = np.maximum(eigval, 0.0)
    whiten = (eigvec * (1.0 / np.sqrt(eigval + eps))) @ eigvec.T
    return ZCAStats(mean=mean.astype(np.float32), whiten=whiten.astype(np.float32))


def apply_zca(x: jnp.ndarray, mean: jnp.ndarray, whiten: jnp.ndarray) -> jnp.ndarray:
    """On-device whitening: (N,H,W,C) in [-1,1] → whitened (N,H,W,C).

    One (N, D) x (D, D) matmul on the MXU.
    """
    n = x.shape[0]
    shape = x.shape
    flat = x.reshape(n, -1)
    white = jnp.dot(
        flat - mean.astype(flat.dtype),
        whiten.astype(flat.dtype).T,
        preferred_element_type=flat.dtype,
    )
    return white.reshape(shape)
