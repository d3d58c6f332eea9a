"""Dataset containers, loading, the labeled/unlabeled split, and the
synthetic no-network fixture.

Reference parity (SURVEY.md §2.1 #2, §3.1): the reference downloads raw
MNIST/SVHN/CIFAR-10, splits a class-balanced labeled subset (100 / 1000 /
4000 labels) from the unlabeled pool, and serializes to TFRecords. Here the
serialized form is a directory of ``.npz`` files (``train.npz`` /
``test.npz`` with uint8 ``images`` NHWC and int32 ``labels``), written by
``triplegan_tpu.data.prepare``; the split is re-derived deterministically
from a seed at load time so the on-disk format stays minimal.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np


@dataclasses.dataclass
class SemiSupervisedData:
    """Host-resident dataset: uint8 NHWC images, int32 labels."""

    x_label: np.ndarray
    y_label: np.ndarray
    x_unlabel: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray
    num_classes: int

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return tuple(self.x_label.shape[1:])  # type: ignore[return-value]


def semi_split(
    images: np.ndarray,
    labels: np.ndarray,
    num_labeled: int,
    num_classes: int,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Class-balanced labeled subset + full unlabeled pool.

    Matches the reference's split semantics (SURVEY.md §3.1): `num_labeled /
    num_classes` examples per class for the labeled stream; the *entire*
    training set (including the labeled examples) forms the unlabeled pool,
    as in the standard semi-supervised GAN protocol.
    """
    rng = np.random.RandomState(seed)
    per_class = num_labeled // num_classes
    idx_label = []
    for c in range(num_classes):
        cls_idx = np.flatnonzero(labels == c)
        rng.shuffle(cls_idx)
        idx_label.append(cls_idx[:per_class])
    idx_label = np.concatenate(idx_label)
    rng.shuffle(idx_label)
    return images[idx_label], labels[idx_label], images


def synthetic_dataset(
    image_size: int = 32,
    channels: int = 3,
    num_classes: int = 10,
    n_train: int = 256,
    n_test: int = 128,
    num_labeled: int = 64,
    seed: int = 0,
) -> SemiSupervisedData:
    """In-memory synthetic dataset so every test runs with no network and no
    real data (SURVEY.md §4.5).

    Images are class-dependent noisy blobs (mean shifted per class) so a
    classifier can actually learn — smoke tests can assert loss decreases.
    """
    rng = np.random.RandomState(seed)

    def make(n):
        y = rng.randint(0, num_classes, size=n).astype(np.int32)
        base = (y[:, None, None, None].astype(np.float32) + 1.0) * (
            255.0 / (num_classes + 1)
        )
        x = base + rng.normal(0, 24.0, size=(n, image_size, image_size, channels))
        return np.clip(x, 0, 255).astype(np.uint8), y

    x_tr, y_tr = make(n_train)
    x_te, y_te = make(n_test)
    x_l, y_l, x_u = semi_split(x_tr, y_tr, num_labeled, num_classes, seed)
    return SemiSupervisedData(x_l, y_l, x_u, x_te, y_te, num_classes)


def make_shapes(
    n: int,
    image_size: int = 32,
    channels: int = 3,
    num_classes: int = 10,
    amplitude: float = 60.0,
    noise_std: float = 20.0,
    rng: np.random.RandomState | None = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Learnable STRUCTURED synthetic images: phase-randomized gratings.

    The brightness-blob ``synthetic_dataset`` above is noise-dominated by
    construction (per-pixel SNR ≈ 1) — fine for smoke tests, but flagship-
    architecture A/B runs on it carry no error signal (VERDICT r4 weak #4).
    This generator encodes class identity in GEOMETRY at controllable SNR:

      class c → a 2-D cosine grating with orientation ``c % 2`` (vertical /
      horizontal stripes) and spatial frequency ``2 + c // 2`` cycles per
      image (10 classes = 2 orientations × 5 frequencies), with a fresh
      UNIFORM random phase per sample, identical across channels, plus
      i.i.d. per-pixel Gaussian noise per channel.

    Properties that make it the right fixture for pipeline A/Bs:
      * every class has the same mean brightness and energy — no scalar
        shortcut; a classifier must learn oriented frequency filters;
      * the random phase means class identity is translation-structured:
        ``aug_translate`` moves the phase (class-preserving), so the
        augmentation path meaningfully participates in training;
      * horizontal flip maps phase φ → −φ within the same class, so
        ``aug_flip`` leaves every class distribution invariant;
      * gratings are maximally spatially correlated, so ZCA whitening
        transforms them non-trivially (the knob VERDICT r4 #2 targets);
      * SNR = amplitude / (noise_std · √2) per channel — tunable from
        trivially learnable to chance.

    Reference lineage: no reference equivalent ([ref-expected] ships only
    real datasets); this exists because real CIFAR/SVHN are environment-
    blocked and cross-implementation training comparisons need a dataset
    both implementations can learn in reduced epochs (docs/PARITY.md §12).
    """
    if rng is None:
        rng = np.random.RandomState(seed)
    y = rng.randint(0, num_classes, size=n).astype(np.int32)
    orient = y % 2  # 0: stripes vary along x (vertical), 1: along y
    freq = 2.0 + (y // 2).astype(np.float64)
    phase = rng.uniform(0.0, 1.0, size=n)
    coord = np.arange(image_size, dtype=np.float64) / image_size
    # (n, image_size): one 1-D cosine profile per sample
    prof = np.cos(2.0 * np.pi * (freq[:, None] * coord[None, :]
                                 + phase[:, None]))
    img = np.where(
        (orient == 0)[:, None, None],
        prof[:, None, :],  # vary along x → broadcast over rows
        prof[:, :, None],  # vary along y → broadcast over cols
    ) * amplitude + 127.5
    img = img[..., None] + rng.normal(
        0.0, noise_std, size=(n, image_size, image_size, channels))
    return np.clip(img, 0, 255).astype(np.uint8), y


def shapes_dataset(
    image_size: int = 32,
    channels: int = 3,
    num_classes: int = 10,
    n_train: int = 2000,
    n_test: int = 500,
    num_labeled: int = 200,
    seed: int = 0,
    amplitude: float = 60.0,
    noise_std: float = 20.0,
) -> SemiSupervisedData:
    """In-memory ``SemiSupervisedData`` over ``make_shapes`` (one RNG stream
    for train+test so the splits are disjoint draws)."""
    rng = np.random.RandomState(seed)
    x_tr, y_tr = make_shapes(n_train, image_size, channels, num_classes,
                             amplitude, noise_std, rng)
    x_te, y_te = make_shapes(n_test, image_size, channels, num_classes,
                             amplitude, noise_std, rng)
    x_l, y_l, x_u = semi_split(x_tr, y_tr, num_labeled, num_classes, seed)
    return SemiSupervisedData(x_l, y_l, x_u, x_te, y_te, num_classes)


def load_dataset(
    data_dir: str,
    dataset: str,
    num_labeled: int,
    num_classes: int = 10,
    seed: int = 0,
) -> SemiSupervisedData:
    """Load prepared ``.npz`` shards (see ``triplegan_tpu.data.prepare``).

    Layout: ``{data_dir}/{dataset}/train.npz`` and ``test.npz``, each with
    ``images`` (uint8 NHWC) and ``labels`` (int).
    """
    ddir = os.path.join(data_dir, dataset)
    if not os.path.exists(os.path.join(ddir, "train.npz")):
        raise FileNotFoundError(
            f"no prepared dataset at {ddir}/train.npz — run "
            f"`python -m triplegan_tpu.cli prepare --dataset {dataset} "
            f"--raw-dir <raw> --data-dir {data_dir}` first"
        )
    train = np.load(os.path.join(ddir, "train.npz"))
    test = np.load(os.path.join(ddir, "test.npz"))
    x_tr = np.ascontiguousarray(train["images"], dtype=np.uint8)
    y_tr = np.asarray(train["labels"], dtype=np.int32)
    x_te = np.ascontiguousarray(test["images"], dtype=np.uint8)
    y_te = np.asarray(test["labels"], dtype=np.int32)
    x_l, y_l, x_u = semi_split(x_tr, y_tr, num_labeled, num_classes, seed)
    return SemiSupervisedData(x_l, y_l, x_u, x_te, y_te, num_classes)
