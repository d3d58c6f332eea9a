"""Fréchet Inception Distance (FID) between generated and real samples.

Beyond-parity extra: the reference's eval surface ([ref-expected]
``Testing/``, SURVEY.md §2.1 #11) reports only the Inception score; FID
(Heusel et al. 2017) is the de-facto standard companion metric for GAN
sample quality, so the framework ships it with the same pluggable-scorer
design as :mod:`eval.inception` — the canonical feature space is an
ImageNet Inception-v3 pool3 layer (no network here to fetch those weights),
and any ``images -> features`` function works: an external SavedModel with
``output_name`` selecting the pool tensor, an ``.npz`` linear probe, or the
framework's own trained classifier's GAP features.

FID(a, b) = ||mu_a - mu_b||^2 + tr(C_a + C_b - 2 sqrtm(C_a C_b)).

The matrix square root is computed without scipy: with A = sqrtm(C_a)
(symmetric PSD eigendecomposition), tr(sqrtm(C_a C_b)) = tr(sqrtm(A C_b A))
— the inner matrix is symmetric PSD, so its root follows from one more
``eigh``. Tiny negative eigenvalues from finite-sample noise are clipped.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def activation_stats(
    features_fn: Callable, images, batch_size: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of ``features_fn`` over ``images``, driven in
    ``batch_size`` chunks (an Inception-v3 extractor resizes to 299²×3 f32 —
    the full set at once would be multiple GB). Features are accumulated in
    float64: FID's trace arithmetic cancels catastrophically in f32. An
    extractor exposing ``preferred_batch`` (fixed-serving-batch stablehlo
    artifacts) overrides the chunk size so chunks land aligned."""
    batch_size = int(getattr(features_fn, "preferred_batch", None) or batch_size)
    chunks = [
        np.asarray(features_fn(images[i : i + batch_size]), dtype=np.float64)
        for i in range(0, images.shape[0], batch_size)
    ]
    feats = np.concatenate(chunks, axis=0)
    if feats.ndim != 2:
        feats = feats.reshape(feats.shape[0], -1)
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    cov = np.atleast_2d(cov)  # d==1 collapses to a scalar otherwise
    return mu, cov


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric-PSD matrix square root via eigh, clipping the negative
    eigenvalue dust finite-sample covariances produce."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """Fréchet distance between Gaussians N(mu1, cov1) and N(mu2, cov2)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = mu1 - mu2
    a = _sqrtm_psd(cov1)
    inner = a @ cov2 @ a  # symmetric PSD; same nonzero spectrum as cov1@cov2
    vals = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = float(np.sqrt(np.clip(vals, 0.0, None)).sum())
    fid = float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)
    # exact-zero distance lands at ~-1e-12 from rounding; never report <0
    return max(fid, 0.0)


def fid_score(
    features_fn: Callable, images_a, images_b, batch_size: int = 256
) -> float:
    """FID between two image sets under ``features_fn``'s feature space.

    Convention: ``images_a`` = generated samples, ``images_b`` = real data,
    both in the same input distribution the extractor expects (raw [-1, 1]
    for external scorers; whitened for the built-in classifier on zca
    configs — the CLI handles this)."""
    mu_a, cov_a = activation_stats(features_fn, images_a, batch_size)
    mu_b, cov_b = activation_stats(features_fn, images_b, batch_size)
    return frechet_distance(mu_a, cov_a, mu_b, cov_b)
