"""Native batch assembler: builds with the system toolchain, matches numpy
fancy indexing exactly, rejects out-of-range indices, falls back cleanly."""

import numpy as np
import pytest

from triplegan_tpu.data import native


def test_native_builds_here():
    # g++ is part of this environment; the library must compile and load.
    assert native.native_available(), "native batch assembler failed to build"


def test_gather_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, size=(1000, 32, 32, 3), dtype=np.uint8)
    idx = rng.randint(0, 1000, size=256)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_multithreaded_matches():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 255, size=(5000, 28, 28, 1), dtype=np.uint8)
    idx = rng.randint(0, 5000, size=2048)
    np.testing.assert_array_equal(native.gather_rows(src, idx, n_threads=4), src[idx])


def test_gather_float_rows():
    rng = np.random.RandomState(2)
    src = rng.normal(size=(100, 17)).astype(np.float32)
    idx = rng.randint(0, 100, size=33)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rejects_out_of_range():
    """One strict contract on both paths (native clamps at the C++ level as
    a memory-safety backstop; numpy would wrap negatives — either would
    silently mask a broken sampler, so the binding raises first)."""
    src = np.arange(10, dtype=np.uint8).reshape(10, 1)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([-5, 0]))
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([0, 99]))


def test_fallback_on_noncontiguous():
    src = np.arange(200, dtype=np.uint8).reshape(20, 10)[:, ::2]  # non-contiguous
    idx = np.array([1, 3, 5])
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_sampler_uses_gather(monkeypatch):
    from tests.helpers import tiny_config, tiny_data
    from triplegan_tpu.data.pipeline import BatchSampler

    cfg = tiny_config()
    data = tiny_data(cfg)
    sampler = BatchSampler(data, 8, seed=0)
    b = sampler.next()
    assert b["x_l"].shape == (8, cfg.image_size, cfg.image_size, 3)
    assert b["x_l"].dtype == np.uint8


def test_gather_rows_bounds_checked():
    """The native memcpy gather must raise on bad indices like numpy does,
    not read out-of-bounds memory."""
    import numpy as np
    import pytest

    from triplegan_tpu.data.native import gather_rows

    src = np.arange(20, dtype=np.uint8).reshape(4, 5)
    with pytest.raises(IndexError):
        gather_rows(src, np.array([0, 4]))
    with pytest.raises(IndexError):
        gather_rows(src, np.array([-1]))
    np.testing.assert_array_equal(gather_rows(src, np.array([], np.int64)).shape, (0, 5))
