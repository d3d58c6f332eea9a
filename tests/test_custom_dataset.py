"""Bring-your-own-dataset contract: any ``{data_dir}/{name}/train.npz`` +
``test.npz`` with uint8 NHWC ``images`` and int ``labels`` trains through
the CLI with ``--set dataset=<name>`` plus the shape keys — the networks
are shape-generic and nothing special-cases the built-in dataset names
(the TF reference hardwires its four datasets in its input pipeline;
[ref-expected] Input_Pipeline/ — SURVEY.md §2.1 #2/#3).

Also locks the fail-fast shape/label validation in _resolve_data: a
config/dataset mismatch must name the --set keys to fix, not surface as
an opaque jit shape error."""

import os

import numpy as np
import pytest

from triplegan_tpu.cli import main

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive


def _write_custom(data_dir, name="plankton", size=20, channels=1,
                  num_classes=4, n_train=48, n_test=16):
    rng = np.random.RandomState(0)
    ddir = os.path.join(data_dir, name)
    os.makedirs(ddir, exist_ok=True)
    for split, n in [("train", n_train), ("test", n_test)]:
        np.savez(
            os.path.join(ddir, f"{split}.npz"),
            images=rng.randint(0, 255, size=(n, size, size, channels),
                               dtype=np.uint8),
            labels=rng.randint(0, num_classes, size=n).astype(np.int64),
        )
    return ddir


CUSTOM_SETS = [
    "dataset=plankton", "image_size=20", "channels=1", "num_classes=4",
    "num_labeled=16", "z_dim=16",
    "gen.widths=(32, 16)",
    "disc.widths=(16, 16)", "disc.strides=(1, 2)",
    "clf.conv_blocks=((8, 8), (16,))", "clf.tail=(16, 8)",
    "batch_size=8", "steps_per_epoch=2", "epochs=1",
    "zca=False", "aug_translate=0", "aug_flip=False",
    "log_every=1", "scan_steps=1",
]


def test_custom_npz_trains_and_evals(tmp_path, capsys):
    data_dir = str(tmp_path / "data")
    _write_custom(data_dir)
    wd = str(tmp_path / "runs")
    main(["train", "--config", "mnist100", "--workdir", wd,
          "--data-dir", data_dir,
          *[f for kv in CUSTOM_SETS for f in ("--set", kv)]])
    out = capsys.readouterr().out
    assert "done: step=" in out
    # eval merges the persisted config (dataset=plankton included)
    main(["eval", "--config", "mnist100", "--workdir", wd,
          "--data-dir", data_dir])
    assert "test error:" in capsys.readouterr().out


def test_shape_mismatch_names_config_keys(tmp_path):
    data_dir = str(tmp_path / "data")
    _write_custom(data_dir, size=20, channels=1)
    wd = str(tmp_path / "runs")
    bad = [kv for kv in CUSTOM_SETS if not kv.startswith("image_size")]
    with pytest.raises(ValueError, match=r"--set image_size=20"):
        main(["train", "--config", "mnist100", "--workdir", wd,
              "--data-dir", data_dir,
              *[f for kv in bad for f in ("--set", kv)],
              "--set", "image_size=28"])


def test_label_overflow_names_num_classes(tmp_path):
    data_dir = str(tmp_path / "data")
    _write_custom(data_dir, num_classes=8)  # labels up to 7
    wd = str(tmp_path / "runs")
    bad = [kv for kv in CUSTOM_SETS if not kv.startswith("num_classes")]
    with pytest.raises(ValueError, match=r"--set num_classes=8"):
        main(["train", "--config", "mnist100", "--workdir", wd,
              "--data-dir", data_dir,
              *[f for kv in bad for f in ("--set", kv)],
              "--set", "num_classes=4"])
