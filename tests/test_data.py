"""Data-layer tests: split semantics, sampler stream behavior, prepare-tool
round-trips on synthetic raw files (no network — SURVEY.md §4.5)."""

import os
import pickle
import struct

import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.data.datasets import load_dataset, semi_split, synthetic_dataset
from triplegan_tpu.data.pipeline import BatchSampler
from triplegan_tpu.data.prepare import prepare


def test_semi_split_class_balanced():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 10, size=1000).astype(np.int32)
    x = rng.randint(0, 255, size=(1000, 4, 4, 1)).astype(np.uint8)
    x_l, y_l, x_u = semi_split(x, y, num_labeled=100, num_classes=10, seed=0)
    assert len(x_l) == 100
    counts = np.bincount(y_l, minlength=10)
    np.testing.assert_array_equal(counts, 10)
    assert len(x_u) == 1000  # unlabeled pool = full train set


def test_semi_split_deterministic():
    rng = np.random.RandomState(0)
    y = rng.randint(0, 10, size=500).astype(np.int32)
    x = rng.randint(0, 255, size=(500, 2, 2, 1)).astype(np.uint8)
    a = semi_split(x, y, 50, 10, seed=3)
    b = semi_split(x, y, 50, 10, seed=3)
    np.testing.assert_array_equal(a[1], b[1])


def test_sampler_covers_epoch_without_replacement():
    cfg = tiny_config()
    data = tiny_data(cfg, n_train=64)
    sampler = BatchSampler(data, batch_size=8, seed=0)
    seen = []
    for _ in range(8):  # one epoch of the unlabeled stream (64/8)
        b = sampler.next()
        seen.append(b["x_u"])
    seen = np.concatenate(seen)
    # every unlabeled image appears exactly once per epoch
    uniq = np.unique(seen.reshape(len(seen), -1), axis=0)
    expect_uniq = np.unique(data.x_unlabel.reshape(len(data.x_unlabel), -1), axis=0)
    assert len(uniq) == len(expect_uniq)


def test_next_triple_contract():
    cfg = tiny_config()
    data = tiny_data(cfg)
    sampler = BatchSampler(data, batch_size=8, seed=0)
    t = sampler.next_triple(z_dim=16, num_classes=10)
    assert set(t.keys()) == {"d", "g", "c"}
    for part in ("d", "c"):
        assert t[part]["x_l"].shape == (8, cfg.image_size, cfg.image_size, 3)
        assert t[part]["x_u"].dtype == np.uint8
        assert t[part]["z"].shape == (8, 16)
    assert t["g"]["z"].shape == (8, 16)
    assert t["g"]["y_g"].min() >= 0 and t["g"]["y_g"].max() < 10
    # D and C see independent batches (the reference's 3 sess.run semantics)
    assert not np.array_equal(t["d"]["x_u"], t["c"]["x_u"])


def test_test_batches_padding_and_mask():
    cfg = tiny_config()
    data = tiny_data(cfg, n_test=30)
    sampler = BatchSampler(data, batch_size=8, seed=0)
    batches = list(sampler.test_batches())
    assert all(b["x"].shape[0] == 8 for b in batches)
    total_valid = sum(int(b["mask"].sum()) for b in batches)
    assert total_valid == 30


def _write_fake_mnist(raw_dir):
    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in [("train", 60), ("t10k", 20)]:
        imgs = rng.randint(0, 255, size=(n, 28, 28), dtype=np.uint8)
        labels = rng.randint(0, 10, size=n, dtype=np.uint8)
        with open(os.path.join(raw_dir, f"{split}-images-idx3-ubyte"), "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(imgs.tobytes())
        with open(os.path.join(raw_dir, f"{split}-labels-idx1-ubyte"), "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())


def test_prepare_mnist_roundtrip(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    _write_fake_mnist(raw)
    prepare("mnist", raw, out)
    ds = load_dataset(out, "mnist", num_labeled=20, num_classes=10)
    assert ds.x_label.shape[1:] == (28, 28, 1)
    assert len(ds.x_unlabel) == 60
    assert len(ds.x_test) == 20


def _write_fake_cifar(raw_dir):
    bdir = os.path.join(raw_dir, "cifar-10-batches-py")
    os.makedirs(bdir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        d = {
            b"data": rng.randint(0, 255, size=(20, 3072), dtype=np.uint8),
            b"labels": rng.randint(0, 10, size=20).tolist(),
        }
        with open(os.path.join(bdir, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)
    d = {
        b"data": rng.randint(0, 255, size=(20, 3072), dtype=np.uint8),
        b"labels": rng.randint(0, 10, size=20).tolist(),
    }
    with open(os.path.join(bdir, "test_batch"), "wb") as f:
        pickle.dump(d, f)


def test_prepare_cifar10_roundtrip_with_zca(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    _write_fake_cifar(raw)
    prepare("cifar10", raw, out)
    ds = load_dataset(out, "cifar10", num_labeled=20, num_classes=10)
    assert ds.x_unlabel.shape == (100, 32, 32, 3)
    assert os.path.exists(os.path.join(out, "cifar10", "zca_stats.npz"))


def test_prepare_svhn_roundtrip(tmp_path):
    from scipy.io import savemat

    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, n in [("train", 40), ("test", 16)]:
        x = rng.randint(0, 255, size=(32, 32, 3, n), dtype=np.uint8)  # HWCN
        y = rng.randint(1, 11, size=(n, 1))  # SVHN labels 1..10 (10 = digit 0)
        savemat(os.path.join(raw, f"{split}_32x32.mat"), {"X": x, "y": y})
    prepare("svhn", raw, out)
    ds = load_dataset(out, "svhn", num_labeled=20, num_classes=10)
    assert ds.x_unlabel.shape == (40, 32, 32, 3)
    assert ds.y_test.min() >= 0 and ds.y_test.max() <= 9  # label 10 remapped to 0


def test_prepare_stl10_roundtrip(tmp_path):
    bdir = tmp_path / "raw" / "stl10_binary"
    os.makedirs(bdir, exist_ok=True)
    rng = np.random.RandomState(0)

    def write_images(name, n):
        (bdir / name).write_bytes(
            rng.randint(0, 255, size=(n, 3, 96, 96), dtype=np.uint8).tobytes()
        )

    def write_labels(name, n):
        (bdir / name).write_bytes(
            rng.randint(1, 11, size=n, dtype=np.uint8).tobytes()  # 1-indexed
        )

    write_images("train_X.bin", 20)
    write_labels("train_y.bin", 20)
    write_images("test_X.bin", 10)
    write_labels("test_y.bin", 10)
    write_images("unlabeled_X.bin", 30)
    out = str(tmp_path / "out")
    prepare("stl10", str(tmp_path / "raw"), out)
    ds = load_dataset(out, "stl10", num_labeled=10, num_classes=10)
    assert ds.x_unlabel.shape == (50, 96, 96, 3)  # 20 train + 30 unlabeled
    assert ds.y_test.min() >= 0 and ds.y_test.max() <= 9  # 0-indexed after prep


def test_synthetic_dataset_learnable_signal():
    """Class means must differ so smoke training can reduce loss."""
    ds = synthetic_dataset(image_size=8, channels=1, n_train=200, num_labeled=50)
    m0 = ds.x_label[ds.y_label == 0].mean()
    m9 = ds.x_label[ds.y_label == 9].mean()
    assert abs(m9 - m0) > 50


# ---------- malformed raw files fail with the file NAMED ----------


def test_prepare_mnist_truncated_and_bad_magic(tmp_path):
    """Converter error paths (reference parity is silent numpy crashes;
    here every malformed raw file names itself): truncated header, wrong
    magic, and payload/header disagreement."""
    import struct

    from triplegan_tpu.data.prepare import _read_idx_images, _read_idx_labels

    p = tmp_path / "train-images-idx3-ubyte"
    p.write_bytes(b"\x00\x00")  # truncated header
    with pytest.raises(ValueError, match="truncated idx header"):
        _read_idx_images(str(p))
    p.write_bytes(struct.pack(">IIII", 1234, 1, 2, 2) + b"\x00" * 4)
    with pytest.raises(ValueError, match="bad idx image magic 1234"):
        _read_idx_images(str(p))
    p.write_bytes(struct.pack(">IIII", 2051, 2, 2, 2) + b"\x00" * 5)  # want 8
    with pytest.raises(ValueError, match="payload has 5 bytes"):
        _read_idx_images(str(p))
    q = tmp_path / "labels"
    q.write_bytes(struct.pack(">II", 2049, 3) + b"\x00" * 2)
    with pytest.raises(ValueError, match="2 labels, header promises 3"):
        _read_idx_labels(str(q))


def test_prepare_cifar_batch_validation(tmp_path):
    import pickle

    from triplegan_tpu.data.prepare import _read_cifar_batch

    p = tmp_path / "data_batch_1"
    p.write_bytes(b"not a pickle at all")
    with pytest.raises(ValueError, match="not a CIFAR-10 pickle"):
        _read_cifar_batch(str(p))
    p.write_bytes(pickle.dumps({b"data": np.zeros((2, 3072), np.uint8)}))
    with pytest.raises(ValueError, match="missing data/labels"):
        _read_cifar_batch(str(p))
    p.write_bytes(
        pickle.dumps({b"data": np.zeros((2, 100), np.uint8), b"labels": [0, 1]})
    )
    with pytest.raises(ValueError, match="3072 bytes"):
        _read_cifar_batch(str(p))
    p.write_bytes(
        pickle.dumps({b"data": np.zeros((2, 3072), np.uint8), b"labels": [0]})
    )
    with pytest.raises(ValueError, match="2 images but 1 labels"):
        _read_cifar_batch(str(p))


def test_prepare_stl10_truncated_images(tmp_path):
    from triplegan_tpu.data.prepare import prepare_stl10

    (tmp_path / "train_X.bin").write_bytes(b"\x00" * 1000)  # not a multiple
    with pytest.raises(ValueError, match="multiple of 3\\*96\\*96"):
        prepare_stl10(str(tmp_path), str(tmp_path / "out"))
