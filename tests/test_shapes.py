"""The structured learnable synthetic dataset (``shapes``): class identity
is geometry (orientation × spatial frequency of a phase-randomized grating)
at controllable SNR — the fixture VERDICT r4 (#2a / weak #4) demands so
flagship-architecture A/B and cross-implementation runs carry real error
signal, unlike the brightness-blob ``synthetic`` set (per-pixel SNR ≈ 1)."""

import numpy as np
import pytest

from triplegan_tpu.data.datasets import make_shapes, shapes_dataset
from triplegan_tpu.data.prepare import prepare


def _fft_classify(x: np.ndarray) -> np.ndarray:
    """Oracle classifier straight from the construction: the grating of
    class c = 2*(f-2) + orient puts its spectral energy at (ky=0, kx=f)
    for orient 0 (varies along x) or (ky=f, kx=0) for orient 1."""
    g = x.astype(np.float64).mean(-1)
    g -= g.mean(axis=(1, 2), keepdims=True)
    spec = np.abs(np.fft.fft2(g))
    feats = np.stack(
        [spec[:, 0, f] if o == 0 else spec[:, f, 0]
         for f in range(2, 7) for o in (0, 1)], axis=1)
    # feats column order: (f=2,o=0),(f=2,o=1),(f=3,o=0)... = class order
    return np.argmax(feats, axis=1)


def test_deterministic_and_uint8():
    x1, y1 = make_shapes(64, seed=3)
    x2, y2 = make_shapes(64, seed=3)
    assert x1.dtype == np.uint8 and y1.dtype == np.int32
    assert x1.shape == (64, 32, 32, 3)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    x3, _ = make_shapes(64, seed=4)
    assert not np.array_equal(x1, x3)


def test_classes_are_geometry_not_brightness():
    """No scalar shortcut: per-class mean brightness is ~equal; the
    FFT oracle recovers the class from geometry almost perfectly."""
    x, y = make_shapes(500, seed=0)
    means = np.array([x[y == c].mean() for c in range(10)])
    assert np.ptp(means) < 2.0  # uint8 scale: classes within ~2 gray levels
    acc = float((_fft_classify(x) == y).mean())
    assert acc > 0.95, f"FFT oracle accuracy {acc}"


def test_snr_knob_reaches_chance():
    """noise_std >> amplitude must drown the signal (the knob spans
    learnable → chance)."""
    x, y = make_shapes(400, amplitude=2.0, noise_std=60.0, seed=0)
    acc = float((_fft_classify(x) == y).mean())
    assert acc < 0.4


def test_flip_preserves_class_distribution():
    """Horizontal flip maps phase φ → −φ within the same class, so the
    FFT oracle must classify flipped images identically."""
    x, y = make_shapes(300, seed=1)
    flipped = x[:, :, ::-1, :]
    assert (_fft_classify(flipped) == y).mean() > 0.95


def test_translate_preserves_class():
    """A 2-px roll (the aug_translate regime) keeps the class readable —
    translation only moves the phase."""
    x, y = make_shapes(300, seed=2)
    rolled = np.roll(x, 2, axis=2)
    assert (_fft_classify(rolled) == y).mean() > 0.95


def test_shapes_dataset_split():
    d = shapes_dataset(n_train=400, n_test=100, num_labeled=50, seed=0)
    assert d.x_label.shape == (50, 32, 32, 3)
    assert d.x_unlabel.shape[0] == 400
    assert d.x_test.shape == (100, 32, 32, 3)
    # class-balanced labeled subset
    counts = np.bincount(d.y_label, minlength=10)
    assert (counts == 5).all()


def test_prepare_shapes_writes_shards_and_zca(tmp_path):
    prepare("shapes", "", str(tmp_path))
    train = np.load(tmp_path / "shapes" / "train.npz")
    test = np.load(tmp_path / "shapes" / "test.npz")
    assert train["images"].shape == (4000, 32, 32, 3)
    assert test["images"].shape == (1000, 32, 32, 3)
    assert (tmp_path / "shapes" / "zca_stats.npz").exists()
    # byte-identical across invocations (two implementations must read the
    # SAME data — the §12 cross-validation precondition)
    prepare("shapes", "", str(tmp_path))
    train2 = np.load(tmp_path / "shapes" / "train.npz")
    np.testing.assert_array_equal(train["images"], train2["images"])
    np.testing.assert_array_equal(train["labels"], train2["labels"])
    # and the FFT oracle reads the prepared shards too
    acc = (_fft_classify(train["images"][:300]) == train["labels"][:300]).mean()
    assert acc > 0.95


def test_prepare_shapes16_variant(tmp_path):
    """16×16 variant: same generator/seed, FFT-oracle separable — the
    spatial size the TF-side training cross-validation can afford."""
    prepare("shapes16", "", str(tmp_path))
    train = np.load(tmp_path / "shapes16" / "train.npz")
    assert train["images"].shape == (4000, 16, 16, 3)
    assert (tmp_path / "shapes16" / "zca_stats.npz").exists()
    acc = (_fft_classify(train["images"][:300]) == train["labels"][:300]).mean()
    assert acc > 0.95
