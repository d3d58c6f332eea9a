"""Fabricate full-scale raw dataset trees in each dataset's NATIVE format.

Used by the deploy rehearsals and the parity-runbook dry-run
(docs/PARITY.md §7): the build environment has no real data or network, so
`prepare → train → eval → inception` are exercised at real dataset sizes
against trees this script writes. Structured synthetic images (class-coded
blobs + noise) so training has signal; formats match what
`data/prepare.py` parses (CIFAR pickle batches, MNIST idx, SVHN .mat,
STL-10 binary).

Usage: python tools/make_fake_raw.py {cifar10,mnist,svhn,stl10} [out_dir]
"""

from __future__ import annotations

import os
import pickle
import struct
import sys

import numpy as np


def _images(n, hw, ch, labels, seed):
    """Class-structured uint8 images: per-class mean pattern + noise."""
    rng = np.random.RandomState(seed)
    protos = rng.randint(0, 255, size=(10, hw, hw, ch)).astype(np.float32)
    noise = rng.randint(-60, 60, size=(n, hw, hw, ch)).astype(np.float32)
    x = protos[labels] * 0.5 + 127.5 * 0.5 + noise
    return np.clip(x, 0, 255).astype(np.uint8)


def cifar10(out):
    d = os.path.join(out, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for bi in range(5):
        labels = rng.randint(0, 10, 10000)
        x = _images(10000, 32, 3, labels, seed=bi)
        data = x.transpose(0, 3, 1, 2).reshape(10000, -1)  # CHW rows
        with open(os.path.join(d, f"data_batch_{bi + 1}"), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)
    labels = rng.randint(0, 10, 10000)
    x = _images(10000, 32, 3, labels, seed=99)
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump(
            {b"data": x.transpose(0, 3, 1, 2).reshape(10000, -1),
             b"labels": labels.tolist()}, f,
        )


def _idx_images(path, x):
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, x.shape[0], x.shape[1], x.shape[2]))
        f.write(x.tobytes())


def _idx_labels(path, y):
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 2049, y.shape[0]))
        f.write(y.astype(np.uint8).tobytes())


def mnist(out):
    import gzip

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in (("train", 60000), ("t10k", 10000)):
        y = rng.randint(0, 10, n)
        x = _images(n, 28, 1, y, seed=hash(split) % 1000)[..., 0]
        raw_i, raw_l = f"/tmp/_{split}i", f"/tmp/_{split}l"
        _idx_images(raw_i, x)
        _idx_labels(raw_l, y)
        for raw, name in ((raw_i, f"{split}-images-idx3-ubyte.gz"),
                          (raw_l, f"{split}-labels-idx1-ubyte.gz")):
            with open(raw, "rb") as fi, gzip.open(os.path.join(out, name), "wb") as fo:
                fo.write(fi.read())
            os.remove(raw)


def svhn(out):
    from scipy.io import savemat

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in (("train", 73257), ("test", 26032)):
        y = rng.randint(0, 10, n)
        x = _images(n, 32, 3, y, seed=hash(split) % 1000)
        # SVHN layout: (H, W, C, N); labels 1..10 with '0' stored as 10
        X = x.transpose(1, 2, 3, 0)
        yy = np.where(y == 0, 10, y).astype(np.uint8).reshape(-1, 1)
        savemat(os.path.join(out, f"{split}_32x32.mat"), {"X": X, "y": yy})


def stl10(out):
    d = os.path.join(out, "stl10_binary")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)

    def dump(name, n, with_labels):
        y = rng.randint(0, 10, n)
        x = _images(n, 96, 3, y, seed=hash(name) % 1000)
        # STL-10 binary: uint8 column-major per image (C, W, H ordering)
        with open(os.path.join(d, f"{name}_X.bin"), "wb") as f:
            f.write(x.transpose(0, 3, 2, 1).tobytes())
        if with_labels:
            with open(os.path.join(d, f"{name}_y.bin"), "wb") as f:
                f.write((y + 1).astype(np.uint8).tobytes())  # labels 1..10

    dump("train", 5000, True)
    dump("test", 8000, True)
    dump("unlabeled", 100000, False)


def main():
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/fullscale/{name}/raw"
    {"cifar10": cifar10, "mnist": mnist, "svhn": svhn, "stl10": stl10}[name](out)
    print(f"wrote fabricated {name} raw tree to {out}")


if __name__ == "__main__":
    main()
