"""CLI surface tests: train → eval → sample → inception through
``cli.main(argv)`` on a tiny synthetic config (the reference's entry-script
equivalents, SURVEY.md §2.1 #1/#10/#11)."""

import os

import pytest

from triplegan_tpu.cli import main

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive

TINY = [
    "--set", "dataset=synthetic",
    "--set", "image_size=16",
    "--set", "num_labeled=40",
    "--set", "z_dim=16",
    "--set", "gen.widths=(32, 16)",
    "--set", "disc.widths=(16, 16)",
    "--set", "disc.strides=(1, 2)",
    "--set", "clf.conv_blocks=((8, 8), (16,))",
    "--set", "clf.tail=(16, 8)",
    "--set", "batch_size=8",
    "--set", "steps_per_epoch=2",
    "--set", "epochs=1",
    "--set", "zca=False",
    "--set", "aug_translate=0",
    "--set", "aug_flip=False",
    "--set", "log_every=1",
]


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cli"))
    main(["train", "--config", "mnist100", "--workdir", wd, *TINY])
    return wd


def test_cli_train_writes_artifacts(trained_workdir):
    run_dir = os.path.join(trained_workdir, "mnist100")
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))


def test_cli_eval_from_checkpoint(trained_workdir, capsys):
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir, *TINY])
    out = capsys.readouterr().out
    assert "test error:" in out


def test_cli_eval_honors_mesh_shape(trained_workdir, capsys):
    """cmd_eval must run the sharded eval path (and agree with 1-device)
    when mesh_shape is set — 8 fake CPU devices from conftest."""
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir, *TINY])
    single = capsys.readouterr().out
    main([
        "eval", "--config", "mnist100", "--workdir", trained_workdir, *TINY,
        "--set", "mesh_shape=(8,)", "--set", "batch_size=16",
    ])
    sharded = capsys.readouterr().out
    assert "test error:" in sharded
    assert single.strip().splitlines()[-1] == sharded.strip().splitlines()[-1]


def test_cli_eval_rejects_indivisible_mesh_batch(trained_workdir):
    """Sharded eval must fail with the same clear message train gives when
    batch_size doesn't divide over the mesh, not an internal sharding error."""
    with pytest.raises(SystemExit, match="batch_size=12 must divide"):
        main([
            "eval", "--config", "mnist100", "--workdir", trained_workdir, *TINY,
            "--set", "mesh_shape=(8,)", "--set", "batch_size=12",
        ])


def test_cli_platform_flag(trained_workdir, capsys, monkeypatch):
    """Every subcommand accepts --platform (the TPU plugin ignores
    JAX_PLATFORMS; this and TRIPLEGAN_PLATFORM are the reliable CPU-forcing
    overrides — the env form is proven in tests/test_parity_campaign.py
    where CLI subprocesses must not touch the TPU backend). conftest
    already forces the cpu backend session-wide, so asserting the backend
    would be vacuous — instead record the actual config update and the
    env export that subprocesses (doctor probe, campaign legs) rely on."""
    import jax

    # setenv-then-delenv records the original state with monkeypatch, so
    # the env export main() performs below is undone at teardown.
    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "sentinel")
    monkeypatch.delenv("TRIPLEGAN_PLATFORM")
    updates = []
    real_update = jax.config.update
    monkeypatch.setattr(
        jax.config, "update",
        lambda k, v: (updates.append((k, v)), real_update(k, v)),
    )
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
          *TINY, "--platform", "cpu"])
    assert "test error:" in capsys.readouterr().out
    assert ("jax_platforms", "cpu") in updates  # flag reached jax.config
    # the resolved platform is exported for subprocesses (flag form too)
    assert os.environ.get("TRIPLEGAN_PLATFORM") == "cpu"


def test_cli_platform_env_validated(trained_workdir, monkeypatch, capsys):
    """A typo'd TRIPLEGAN_PLATFORM fails fast with the same clear message
    argparse gives the flag form, instead of dying inside JAX backend
    resolution (or probing a dark TPU)."""
    monkeypatch.setenv("TRIPLEGAN_PLATFORM", "CPU")
    with pytest.raises(SystemExit):
        main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
              *TINY])
    assert "must be 'cpu' or 'tpu'" in capsys.readouterr().err


def test_cli_sample_writes_png(trained_workdir, tmp_path):
    out = str(tmp_path / "grid.png")
    main([
        "sample", "--config", "mnist100", "--workdir", trained_workdir,
        "--out", out, "--n-per-class", "3", *TINY,
    ])
    assert os.path.exists(out)


def test_cli_inception_runs(trained_workdir, capsys):
    main([
        "inception", "--config", "mnist100", "--workdir", trained_workdir,
        "--n-samples", "62", "--n-splits", "2", *TINY,  # 62 % batch 8 != 0:
    ])  # exercises the chunked generator's padded final piece
    assert "inception score" in capsys.readouterr().out


def test_cli_eval_restores_without_repeating_overrides(tmp_path, capsys):
    """Regression: a checkpoint trained with non-default, shape-affecting
    overrides (prng_impl=rbg stores a (4,)-word key; threefry is (2,)) must
    be restorable by eval/sample with NO --set repeated — the train driver
    persists config.json and the CLI merges it back."""
    import jax

    wd = str(tmp_path / "runs")
    try:
        main([
            "train", "--config", "mnist100", "--workdir", wd, *TINY,
            "--set", "prng_impl=rbg",
        ])
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        assert os.path.exists(os.path.join(wd, "mnist100", "config.json"))
        main(["eval", "--config", "mnist100", "--workdir", wd])
        assert "test error:" in capsys.readouterr().out
        out = str(tmp_path / "grid.png")
        main(["sample", "--config", "mnist100", "--workdir", wd,
              "--out", out, "--n-per-class", "2"])
        assert os.path.exists(out)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_cli_resume_without_repeating_overrides(tmp_path, capsys):
    """Resuming with a bare `train --config X --workdir W` must reconstruct
    the original run's --set overrides from config.json (and must NOT
    clobber config.json before the restore succeeds)."""
    import jax
    import json

    wd = str(tmp_path / "runs")
    try:
        main([
            "train", "--config", "mnist100", "--workdir", wd, *TINY,
            "--set", "prng_impl=rbg",
        ])
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        capsys.readouterr()
        main(["train", "--config", "mnist100", "--workdir", wd,
              "--max-steps", "2"])
        out = capsys.readouterr().out
        assert "resumed from step 2" in out
        with open(os.path.join(wd, "mnist100", "config.json")) as f:
            assert json.load(f)["prng_impl"] == "rbg"
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_cli_eval_honors_name_override(tmp_path, capsys):
    """A run trained under --set name=... must merge ITS config.json (the
    run-dir lookup happens after overrides are applied)."""
    import jax

    wd = str(tmp_path / "runs")
    try:
        main([
            "train", "--config", "mnist100", "--workdir", wd, *TINY,
            "--set", "name=exp2", "--set", "prng_impl=rbg",
        ])
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        main(["eval", "--config", "mnist100", "--workdir", wd,
              "--set", "name=exp2"])
        assert "test error:" in capsys.readouterr().out
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_cli_eval_without_checkpoint_exits(tmp_path):
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["eval", "--config", "mnist100", "--workdir", str(tmp_path), *TINY])


def test_cli_rejects_unknown_override(tmp_path):
    with pytest.raises(SystemExit, match="unknown config key"):
        main([
            "train", "--config", "mnist100", "--workdir", str(tmp_path),
            "--set", "bogus=1",
        ])


def test_cli_prepare_and_train_roundtrip(tmp_path):
    import numpy as np
    import struct

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.RandomState(0)
    for split, n in [("train", 40), ("t10k", 16)]:
        imgs = rng.randint(0, 255, size=(n, 28, 28), dtype=np.uint8)
        labels = rng.randint(0, 10, size=n, dtype=np.uint8)
        with open(raw / f"{split}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(imgs.tobytes())
        with open(raw / f"{split}-labels-idx1-ubyte", "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())
    data_dir = str(tmp_path / "npz")
    main(["prepare", "--dataset", "mnist", "--raw-dir", str(raw), "--data-dir", data_dir])
    wd = str(tmp_path / "runs")
    main([
        "train", "--config", "mnist100", "--workdir", wd, "--data-dir", data_dir,
        "--set", "num_labeled=20", "--set", "batch_size=8",
        "--set", "steps_per_epoch=2", "--set", "epochs=1", "--set", "log_every=1",
    ])
    assert os.path.isdir(os.path.join(wd, "mnist100", "ckpt"))


def test_cli_eval_specific_step(trained_workdir, capsys):
    """--step restores a named checkpoint (the reference's
    Saver.restore(<specific ckpt>)); a bogus step exits with the latest."""
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
          "--step", "2", *TINY])
    assert "test error:" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="no checkpoint for step 99"):
        main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
              "--step", "99", *TINY])


def test_cli_eval_artifact_qualification(trained_workdir, capsys):
    """eval --artifact scores the test set through an exported classifier
    .stablehlo; the artifact must reproduce the checkpoint's test error
    exactly (same params, same baked-in transform — deploy qualification)."""
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir, *TINY])
    want = capsys.readouterr().out.strip().split("test error:")[1]

    out_dir = os.path.join(trained_workdir, "mnist100", "export")
    main(["export", "--config", "mnist100", "--workdir", trained_workdir,
          "--what", "classifier", "--batch-size", "8", *TINY])
    capsys.readouterr()
    artifact = os.path.join(out_dir, "classify.stablehlo")
    assert os.path.exists(artifact)
    main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
          "--artifact", artifact, *TINY])
    got = capsys.readouterr().out
    assert "test error (artifact):" in got
    assert got.strip().split("test error (artifact):")[1] == want

    # a generator artifact (2 inputs) → clean exit, not an unpack crash
    main(["export", "--config", "mnist100", "--workdir", trained_workdir,
          "--what", "generator", "--batch-size", "8", *TINY])
    capsys.readouterr()
    with pytest.raises(SystemExit, match="not a classifier artifact"):
        main(["eval", "--config", "mnist100", "--workdir", trained_workdir,
              "--artifact", os.path.join(out_dir, "generate.stablehlo"), *TINY])


def test_cli_predict_checkpoint_and_artifact_agree(trained_workdir, tmp_path, capsys):
    """predict labels a raw .npy through the checkpoint or an exported
    artifact — identical logits either way; probs are a softmax; bad
    inputs exit cleanly naming the problem."""
    import numpy as np

    imgs = np.random.RandomState(3).randint(
        0, 256, size=(9, 16, 16, 1)
    ).astype(np.uint8)
    inp = str(tmp_path / "in.npy")
    np.save(inp, imgs)

    main(["predict", "--config", "mnist100", "--workdir", trained_workdir,
          "--input", inp, "--out", str(tmp_path / "p1.npz"),
          "--batch-size", "4", *TINY])
    main(["export", "--config", "mnist100", "--workdir", trained_workdir,
          "--what", "classifier", "--batch-size", "4", *TINY])
    capsys.readouterr()
    artifact = os.path.join(trained_workdir, "mnist100", "export",
                            "classify.stablehlo")
    main(["predict", "--artifact", artifact, "--input", inp,
          "--out", str(tmp_path / "p2.npz")])
    out = capsys.readouterr().out
    assert "predicted 9 images" in out

    p1 = np.load(tmp_path / "p1.npz")
    p2 = np.load(tmp_path / "p2.npz")
    np.testing.assert_allclose(p1["logits"], p2["logits"], atol=1e-5)
    np.testing.assert_allclose(p1["probs"].sum(-1), 1.0, atol=1e-5)
    assert p1["labels"].dtype == np.int32 and p1["labels"].shape == (9,)

    # float input → clean exit naming dtype
    bad = str(tmp_path / "bad.npy")
    np.save(bad, imgs.astype(np.float32))
    with pytest.raises(SystemExit, match="uint8"):
        main(["predict", "--artifact", artifact, "--input", bad,
              "--out", str(tmp_path / "p3.npz")])
    # no source → clean exit
    with pytest.raises(SystemExit, match="--config .* or --artifact"):
        main(["predict", "--input", inp, "--out", str(tmp_path / "p4.npz")])


def test_cli_predict_input_error_paths(tmp_path):
    """Review regressions: empty input, missing file, and the export
    npz+quantize conflict all exit cleanly."""
    import numpy as np

    empty = str(tmp_path / "empty.npy")
    np.save(empty, np.zeros((0, 16, 16, 1), np.uint8))
    with pytest.raises(SystemExit, match="0 images"):
        main(["predict", "--artifact", "x.stablehlo", "--input", empty])
    with pytest.raises(SystemExit, match="no such input file"):
        main(["predict", "--artifact", "x.stablehlo",
              "--input", str(tmp_path / "nope.npy")])
    with pytest.raises(SystemExit, match="npz stores the raw"):
        main(["export", "--config", "mnist100", "--workdir", str(tmp_path),
              "--format", "npz", "--quantize", "int8", *TINY])
