"""Inception-style score for class-conditional generation
(SURVEY.md §2.1 #11, §6: CIFAR-10 conditional IS ≈ 5.08 in the paper).

IS = exp( E_x[ KL( p(y|x) || p(y) ) ] ), computed over generated samples
with a pluggable scoring classifier. The canonical metric uses an
ImageNet Inception-v3; this environment has no network to fetch those
weights, so the scorer is an argument: any ``images -> logits`` function
(e.g. this framework's own trained classifier in eval mode, or a user-
supplied Inception port at deploy time).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    n_splits: int = 10,
) -> Tuple[float, float]:
    """Mean ± std of the score over `n_splits` disjoint splits (the standard
    Salimans et al. protocol)."""
    probs = np.asarray(jax.nn.softmax(logits_fn(images), axis=-1), dtype=np.float64)
    n = probs.shape[0]
    split_size = max(n // n_splits, 1)
    scores = []
    for i in range(0, n - split_size + 1, split_size):
        p = probs[i : i + split_size]
        py = p.mean(axis=0, keepdims=True)
        kl = np.sum(p * (np.log(p + 1e-12) - np.log(py + 1e-12)), axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
