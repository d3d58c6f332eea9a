"""Dataset preparation tool (rebuild of the reference's TFRecord converters,
SURVEY.md §2.1 #2, §3.1): raw dataset files → ``{data_dir}/{name}/train.npz``
+ ``test.npz`` (uint8 NHWC images, int32 labels), plus cached ZCA statistics
for CIFAR-10.

This environment has no network (SURVEY.md §7), so downloading is a
separate, optional concern: ``prepare(name, raw_dir, out_dir)`` converts raw
files that are already on disk (the standard distribution formats: MNIST idx,
CIFAR-10 python pickles, SVHN .mat, STL-10 binaries). The runtime data layer
only ever sees the .npz interface.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Tuple

import numpy as np


def _save(out_dir: str, name: str, split: str, images: np.ndarray, labels: np.ndarray):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(
        os.path.join(d, f"{split}.npz"),
        images=np.ascontiguousarray(images, dtype=np.uint8),
        labels=np.asarray(labels, dtype=np.int32),
    )


def _open_maybe_gz(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return open(path, "rb")


# ---------------------------------------------------------------------------
# MNIST (idx format)
# ---------------------------------------------------------------------------


def _read_idx_images(path: str) -> np.ndarray:
    # Malformed raw files must fail with the FILE named: these are the
    # first bytes a user's download ever flows through. (No ``assert`` for
    # validation — asserts vanish under ``python -O``.)
    with _open_maybe_gz(path) as f:
        header = f.read(16)
        if len(header) < 16:
            raise ValueError(f"{path}: truncated idx header ({len(header)} bytes)")
        magic, n, rows, cols = struct.unpack(">IIII", header)
        if magic != 2051:
            raise ValueError(f"{path}: bad idx image magic {magic} (want 2051)")
        data = np.frombuffer(f.read(), dtype=np.uint8)
    if data.size != n * rows * cols:
        raise ValueError(
            f"{path}: idx payload has {data.size} bytes, header promises "
            f"{n}x{rows}x{cols}={n * rows * cols}"
        )
    return data.reshape(n, rows, cols, 1)


def _read_idx_labels(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        header = f.read(8)
        if len(header) < 8:
            raise ValueError(f"{path}: truncated idx header ({len(header)} bytes)")
        magic, n = struct.unpack(">II", header)
        if magic != 2049:
            raise ValueError(f"{path}: bad idx label magic {magic} (want 2049)")
        data = np.frombuffer(f.read(), dtype=np.uint8)
    if data.size != n:
        raise ValueError(
            f"{path}: idx payload has {data.size} labels, header promises {n}"
        )
    return data.astype(np.int32)


def prepare_mnist(raw_dir: str, out_dir: str) -> None:
    x_tr = _read_idx_images(os.path.join(raw_dir, "train-images-idx3-ubyte"))
    y_tr = _read_idx_labels(os.path.join(raw_dir, "train-labels-idx1-ubyte"))
    x_te = _read_idx_images(os.path.join(raw_dir, "t10k-images-idx3-ubyte"))
    y_te = _read_idx_labels(os.path.join(raw_dir, "t10k-labels-idx1-ubyte"))
    for split, x, y in (("train", x_tr, y_tr), ("test", x_te, y_te)):
        if len(x) != len(y):
            raise ValueError(
                f"mnist {split}: {len(x)} images but {len(y)} labels — "
                f"mismatched idx files in {raw_dir}"
            )
    _save(out_dir, "mnist", "train", x_tr, y_tr)
    _save(out_dir, "mnist", "test", x_te, y_te)


# ---------------------------------------------------------------------------
# CIFAR-10 (python pickle batches)
# ---------------------------------------------------------------------------


def _read_cifar_batch(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        try:
            d = pickle.load(f, encoding="bytes")
        except Exception as e:
            raise ValueError(f"{path}: not a CIFAR-10 pickle batch ({e})") from e
    if not isinstance(d, dict) or b"data" not in d or b"labels" not in d:
        raise ValueError(f"{path}: CIFAR-10 batch is missing data/labels keys")
    raw = np.asarray(d[b"data"])
    if raw.ndim != 2 or raw.shape[1] != 3072:
        raise ValueError(f"{path}: CIFAR-10 rows must be 3072 bytes, got {raw.shape}")
    x = raw.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.asarray(d[b"labels"], dtype=np.int32)
    if len(y) != len(x):
        raise ValueError(f"{path}: {len(x)} images but {len(y)} labels")
    return x, y


def prepare_cifar10(raw_dir: str, out_dir: str, fit_zca_stats: bool = True) -> None:
    bdir = os.path.join(raw_dir, "cifar-10-batches-py")
    if not os.path.isdir(bdir):
        bdir = raw_dir
    xs, ys = [], []
    for i in range(1, 6):
        x, y = _read_cifar_batch(os.path.join(bdir, f"data_batch_{i}"))
        xs.append(x)
        ys.append(y)
    x_tr, y_tr = np.concatenate(xs), np.concatenate(ys)
    x_te, y_te = _read_cifar_batch(os.path.join(bdir, "test_batch"))
    _save(out_dir, "cifar10", "train", x_tr, y_tr)
    _save(out_dir, "cifar10", "test", x_te, y_te)
    if fit_zca_stats:
        from triplegan_tpu.data.zca import fit_zca

        stats = fit_zca(x_tr)
        stats.save(os.path.join(out_dir, "cifar10", "zca_stats.npz"))


# ---------------------------------------------------------------------------
# SVHN (.mat cropped-digits format)
# ---------------------------------------------------------------------------


def prepare_svhn(raw_dir: str, out_dir: str) -> None:
    from scipy.io import loadmat

    def read(split):
        path = os.path.join(raw_dir, f"{split}_32x32.mat")
        m = loadmat(path)
        if "X" not in m or "y" not in m:
            raise ValueError(f"{path}: SVHN .mat is missing X/y variables")
        x = m["X"].transpose(3, 0, 1, 2)  # HWCN → NHWC
        y = m["y"].reshape(-1).astype(np.int32)
        y[y == 10] = 0  # SVHN labels digit 0 as class 10
        return x, y

    x_tr, y_tr = read("train")
    x_te, y_te = read("test")
    for split, x, y in (("train", x_tr, y_tr), ("test", x_te, y_te)):
        if len(x) != len(y):
            raise ValueError(
                f"svhn {split}_32x32.mat: {len(x)} images but {len(y)} labels"
            )
    _save(out_dir, "svhn", "train", x_tr, y_tr)
    _save(out_dir, "svhn", "test", x_te, y_te)


# ---------------------------------------------------------------------------
# STL-10 (binary format)
# ---------------------------------------------------------------------------


def prepare_stl10(raw_dir: str, out_dir: str) -> None:
    bdir = os.path.join(raw_dir, "stl10_binary")
    if not os.path.isdir(bdir):
        bdir = raw_dir

    def read_images(path):
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), dtype=np.uint8)
        if data.size == 0 or data.size % (3 * 96 * 96) != 0:
            raise ValueError(
                f"{path}: STL-10 image file must be a multiple of "
                f"3*96*96={3 * 96 * 96} bytes, got {data.size}"
            )
        return data.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)  # CWH → NHWC

    def read_labels(path):
        with open(path, "rb") as f:
            return (np.frombuffer(f.read(), dtype=np.uint8).astype(np.int32) - 1)

    x_tr = read_images(os.path.join(bdir, "train_X.bin"))
    y_tr = read_labels(os.path.join(bdir, "train_y.bin"))
    x_te = read_images(os.path.join(bdir, "test_X.bin"))
    y_te = read_labels(os.path.join(bdir, "test_y.bin"))
    for split, x, y in (("train", x_tr, y_tr), ("test", x_te, y_te)):
        if len(x) != len(y):
            raise ValueError(
                f"stl10 {split}: {len(x)} images in {split}_X.bin but "
                f"{len(y)} labels in {split}_y.bin"
            )
    # STL-10's 100k unlabeled images live in unlabeled_X.bin; fold them into
    # the train images with label -1 when present.
    unl = os.path.join(bdir, "unlabeled_X.bin")
    if os.path.exists(unl):
        x_u = read_images(unl)
        x_tr = np.concatenate([x_tr, x_u])
        y_tr = np.concatenate([y_tr, np.full((len(x_u),), -1, np.int32)])
    _save(out_dir, "stl10", "train", x_tr, y_tr)
    _save(out_dir, "stl10", "test", x_te, y_te)


# ---------------------------------------------------------------------------
# sklearn digits (real data bundled with scikit-learn — no download needed)
# ---------------------------------------------------------------------------


DIGITS_TEST_PER_CLASS = 50
DIGITS_SPLIT_SEED = 0


def prepare_digits(raw_dir: str, out_dir: str) -> None:
    """scikit-learn's bundled handwritten-digits set (UCI optdigits): 1,797
    REAL 8×8 grayscale digit images that ship inside the sklearn package —
    the one real image dataset reachable with zero network egress, used for
    the real-data semi-supervised validation experiment (docs/PARITY.md §8).

    ``raw_dir`` is ignored: there are no raw files to convert. Pixels
    (0..16) rescale to uint8 0..255 and upsample nearest-neighbor to 28×28×1
    so the ``mnist100`` architecture applies unchanged. The train/test split
    is stratified (``DIGITS_TEST_PER_CLASS`` per class held out, seed
    ``DIGITS_SPLIT_SEED``) and deterministic, so every run of this converter
    produces byte-identical shards.

    Reference lineage: the reference ships no equivalent ([ref-expected]
    Input_Pipeline/ covers MNIST/SVHN/CIFAR only) — this exists because the
    rebuild's parity metric is environment-blocked and digits is the only
    real data available here.
    """
    try:
        from sklearn.datasets import load_digits
    except ImportError as e:  # pragma: no cover - sklearn is baked in here
        raise RuntimeError(
            "prepare --dataset digits needs scikit-learn (bundles the data)"
        ) from e

    d = load_digits()
    x = np.round(d.images * (255.0 / 16.0)).astype(np.uint8)  # (1797, 8, 8)
    y = d.target.astype(np.int32)

    idx28 = (np.arange(28) * 8) // 28
    x = x[:, idx28][:, :, idx28][..., None]  # nearest-neighbor → (N, 28, 28, 1)

    rng = np.random.RandomState(DIGITS_SPLIT_SEED)
    test_idx = []
    for c in range(10):
        cls = np.flatnonzero(y == c)
        rng.shuffle(cls)
        test_idx.append(cls[:DIGITS_TEST_PER_CLASS])
    test_idx = np.concatenate(test_idx)
    test_mask = np.zeros(len(y), bool)
    test_mask[test_idx] = True
    train_idx = np.flatnonzero(~test_mask)
    rng.shuffle(train_idx)

    _save(out_dir, "digits", "train", x[train_idx], y[train_idx])
    _save(out_dir, "digits", "test", x[test_idx], y[test_idx])


# ---------------------------------------------------------------------------
# shapes (structured learnable synthetic — generated, no raw files)
# ---------------------------------------------------------------------------


SHAPES_SEED = 0
# > 3072 pixel dims so the prepare-time ZCA covariance is full-rank (the
# fit warns and whitening amplifies null directions below that).
SHAPES_N_TRAIN = 4000
SHAPES_N_TEST = 1000


def prepare_shapes(raw_dir: str, out_dir: str, image_size: int = 32,
                   name: str = "shapes") -> None:
    """Deterministic structured synthetic set (phase-randomized gratings,
    ``data/datasets.py::make_shapes``): 4,000 train + 1,000 test 32×32×3
    images whose class identity is GEOMETRY (orientation × frequency) at
    SNR ≈ 2.1 — learnable by the cifar10_4k architecture in reduced
    epochs, unlike the noise-dominated ``synthetic`` fixture.

    ``raw_dir`` is ignored (nothing to convert); the fixed seed makes
    every invocation byte-identical, so two independent implementations
    (this framework and tools/tf_parity_train.py) reading the shards see
    the SAME data — the precondition for the training-level ZCA +
    augmentation cross-validation (docs/PARITY.md §12, VERDICT r4 #2).
    ZCA statistics are fitted on the train images at prepare time, like
    CIFAR-10's."""
    from triplegan_tpu.data.datasets import make_shapes
    from triplegan_tpu.data.zca import fit_zca

    rng = np.random.RandomState(SHAPES_SEED)
    x_tr, y_tr = make_shapes(SHAPES_N_TRAIN, image_size=image_size, rng=rng)
    x_te, y_te = make_shapes(SHAPES_N_TEST, image_size=image_size, rng=rng)
    _save(out_dir, name, "train", x_tr, y_tr)
    _save(out_dir, name, "test", x_te, y_te)
    stats = fit_zca(x_tr)
    stats.save(os.path.join(out_dir, name, "zca_stats.npz"))


def prepare_shapes16(raw_dir: str, out_dir: str) -> None:
    """16×16 variant of ``shapes`` (same generator/seed/counts, FFT-oracle
    still 100% separable): the spatial size the training-level TF cross-
    validation can afford — the conv-large architecture at 32×32 costs
    ≥13 s/step on this single CPU core (docs/PARITY.md §12)."""
    prepare_shapes(raw_dir, out_dir, image_size=16, name="shapes16")


PREPARERS = {
    "mnist": prepare_mnist,
    "cifar10": prepare_cifar10,
    "svhn": prepare_svhn,
    "stl10": prepare_stl10,
    "digits": prepare_digits,
    "shapes": prepare_shapes,
    "shapes16": prepare_shapes16,
}

# Datasets whose converter needs no raw files on disk (data ships in-package).
RAW_FREE = frozenset({"digits", "shapes", "shapes16"})


def prepare(name: str, raw_dir: str, out_dir: str, download: bool = False) -> None:
    if name not in PREPARERS:
        raise KeyError(f"unknown dataset '{name}'; available: {sorted(PREPARERS)}")
    if not raw_dir and name not in RAW_FREE:
        raise ValueError(
            f"dataset '{name}' converts raw files on disk — pass --raw-dir "
            f"(only {sorted(RAW_FREE)} need none)"
        )
    if download and name not in RAW_FREE:
        from triplegan_tpu.data.download import download_dataset

        download_dataset(name, raw_dir)
    PREPARERS[name](raw_dir, out_dir)
