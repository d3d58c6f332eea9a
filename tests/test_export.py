"""Serving export (beyond-parity extra, export.py): StableHLO round-trip,
SavedModel signatures, npz interchange, and the CLI surface — every format
is checked for numerical agreement with the in-process model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.export import (
    export_artifacts,
    export_npz,
    export_stablehlo,
    load_stablehlo,
    make_serving_fns,
)
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, generate = make_serving_fns(cfg, nets, state)
    rng = np.random.RandomState(0)
    imgs = rng.randint(
        0, 256, size=(4, cfg.image_size, cfg.image_size, cfg.channels)
    ).astype(np.uint8)
    z = rng.normal(size=(4, cfg.z_dim)).astype(np.float32)
    y = rng.randint(0, cfg.num_classes, size=(4,)).astype(np.int32)
    return cfg, nets, state, classify, generate, imgs, z, y


def test_serving_classify_matches_eval_path(served):
    """The baked-in transform must reproduce the eval-time preprocessing
    (rescale; no zca in tiny_config) + eval-mode classifier exactly."""
    cfg, nets, state, classify, _, imgs, _, _ = served
    _, _, clf = nets
    x = jnp.asarray(imgs).astype(jnp.float32) / 127.5 - 1.0
    want, _ = clf.apply(state.params["clf"], state.bn["clf"], x, train=False)
    np.testing.assert_allclose(
        np.asarray(classify(jnp.asarray(imgs))), np.asarray(want), rtol=1e-6
    )


def test_serving_classify_bf16_matches_eval_dtype_path(served):
    """Review regression: on a bfloat16 config the served classifier must
    compute through the SAME bf16 pipeline as make_eval_step — an f32
    re-implementation drifts from what `cli eval` reports."""
    from triplegan_tpu.data import ondevice

    cfg = tiny_config()
    cfg.compute_dtype = "bfloat16"
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    classify, _ = make_serving_fns(cfg, nets, state)
    _, _, clf = nets
    imgs = np.random.RandomState(1).randint(
        0, 256, size=(4, cfg.image_size, cfg.image_size, cfg.channels)
    ).astype(np.uint8)
    # the eval path, verbatim (train/step.py make_eval_step)
    x = ondevice.standard_pipeline(
        None, jnp.asarray(imgs), train=False, dtype=jnp.bfloat16, do_rescale=True
    )
    want, _ = clf.apply(state.params["clf"], state.bn["clf"], x, train=False)
    got = classify(jnp.asarray(imgs))
    assert got.dtype == jnp.float32  # f32 at the serving boundary
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, dtype=np.float32), rtol=1e-6, atol=1e-6
    )


def test_stablehlo_multiplatform_fallback_warns(served, tmp_path, monkeypatch):
    """Review regression: a failed cpu+tpu export must fall back LOUDLY to
    the default backend, not silently produce a single-platform artifact."""
    import warnings

    from triplegan_tpu import export as export_mod

    cfg, _, _, classify, _, imgs, _, _ = served
    real_export = jax.export.export

    def flaky_export(fn, **kwargs):
        if kwargs.get("platforms") is not None:
            raise ValueError("synthetic multi-platform lowering failure")
        return real_export(fn, **kwargs)

    monkeypatch.setattr(jax.export, "export", flaky_export)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        path = export_mod.export_stablehlo(
            classify, (jnp.asarray(imgs),), str(tmp_path / "fb.shlo")
        )
    assert any("multi-platform export" in str(w.message) for w in caught)
    monkeypatch.undo()
    re_c = export_mod.load_stablehlo(path)  # fallback artifact still serves
    np.testing.assert_allclose(
        np.asarray(re_c(imgs)), np.asarray(classify(jnp.asarray(imgs))), rtol=1e-5
    )


def test_cli_export_generator_skips_zca_load(tmp_path, capsys, monkeypatch):
    """Review regression: generator-only / npz exports never need ZCA stats
    and must not trigger a dataset load + refit."""
    from tests.test_cli import TINY
    from triplegan_tpu import cli

    wd = str(tmp_path / "lazyzca")
    cli.main(["train", "--config", "mnist100", "--workdir", wd, *TINY])

    def boom(cfg, workdir):
        raise AssertionError("_load_zca must not be called for this export")

    monkeypatch.setattr(cli, "_load_zca", boom)
    capsys.readouterr()
    cli.main([
        "export", "--config", "mnist100", "--workdir", wd,
        "--what", "generator", "--batch-size", "4", *TINY,
    ])
    cli.main([
        "export", "--config", "mnist100", "--workdir", wd,
        "--format", "npz", *TINY,
    ])
    out = capsys.readouterr().out
    assert out.count("exported:") == 2


def test_stablehlo_roundtrip(served, tmp_path):
    cfg, _, _, classify, generate, imgs, z, y = served
    p1 = export_stablehlo(classify, (jnp.asarray(imgs),), str(tmp_path / "c.shlo"))
    p2 = export_stablehlo(
        generate, (jnp.asarray(z), jnp.asarray(y)), str(tmp_path / "g.shlo")
    )
    re_c = load_stablehlo(p1)
    re_g = load_stablehlo(p2)
    np.testing.assert_allclose(
        np.asarray(re_c(imgs)), np.asarray(classify(jnp.asarray(imgs))), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(re_g(z, y)),
        np.asarray(generate(jnp.asarray(z), jnp.asarray(y))),
        rtol=1e-5, atol=1e-6,
    )


def test_savedmodel_roundtrip(served, tmp_path):
    tf = pytest.importorskip("tensorflow")
    cfg, nets, state, classify, generate, imgs, z, y = served
    paths = export_artifacts(
        cfg, nets, state, str(tmp_path), fmt="savedmodel", batch_size=4
    )
    mod = tf.saved_model.load(paths[0])
    got_c = mod.signatures["classify"](classify_arg0=tf.constant(imgs))
    got_g = mod.signatures["generate"](
        generate_arg0=tf.constant(z), generate_arg1=tf.constant(y)
    )
    np.testing.assert_allclose(
        next(iter(got_c.values())).numpy(),
        np.asarray(classify(jnp.asarray(imgs))),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        next(iter(got_g.values())).numpy(),
        np.asarray(generate(jnp.asarray(z), jnp.asarray(y))),
        rtol=1e-5, atol=1e-5,
    )


def test_stablehlo_artifact_as_is_fid_scorer(served, tmp_path):
    """Composition: an exported classifier (.stablehlo) plugs into
    load_scorer, so IS/FID can score with any exported model. Float [-1,1]
    inputs map back to the exact uint8 pixels; ragged chunks pad to the
    serving batch; shape mismatches fail with the contract in the message."""
    from triplegan_tpu.eval.inception import load_scorer

    cfg, _, _, classify, _, imgs, _, _ = served
    path = export_stablehlo(
        classify, (jnp.asarray(imgs),), str(tmp_path / "classify.stablehlo")
    )
    scorer = load_scorer(path, outputs="logits")

    # uint8 → [-1,1] float → (inside the scorer) back to the same uint8
    imgs7 = np.concatenate([imgs, imgs[:3]], axis=0)  # 7 rows vs serving batch 4
    floats = imgs7.astype(np.float32) / 127.5 - 1.0
    want = np.concatenate(
        [np.asarray(classify(jnp.asarray(imgs7[i : i + 4])))
         for i in (0,)] + [np.asarray(classify(jnp.asarray(
             np.concatenate([imgs7[4:], imgs7[6:7]], axis=0))))[:3]],
        axis=0,
    )
    got = np.asarray(scorer(floats))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="serving contract"):
        scorer(np.zeros((2, 8, 8, 3), np.float32))


def test_npz_export_contains_all_leaves(served, tmp_path):
    cfg, _, state, _, _, _, _, _ = served
    path = export_npz(state, str(tmp_path / "params.npz"))
    wts = np.load(path)
    n_leaves = len(jax.tree.leaves(state.params)) + len(jax.tree.leaves(state.bn))
    assert len(wts.files) == n_leaves
    assert any(k.startswith("params/clf") for k in wts.files)
    assert any(k.startswith("bn/gen") for k in wts.files)
    # spot-check one array round-trips exactly
    key = sorted(k for k in wts.files if k.startswith("params/"))[0]
    leaf_map = {
        "/".join(str(getattr(p, "key", p)) for p in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    np.testing.assert_array_equal(wts[key], np.asarray(leaf_map[key[len("params/"):]]))


def test_export_artifacts_validates_args(served, tmp_path):
    cfg, nets, state, _, _, _, _, _ = served
    with pytest.raises(ValueError, match="what must be"):
        export_artifacts(cfg, nets, state, str(tmp_path), what="nope")
    with pytest.raises(ValueError, match="fmt must be"):
        export_artifacts(cfg, nets, state, str(tmp_path), fmt="nope")


def test_cli_export_stablehlo_serves_trained_model(tmp_path, capsys):
    """CLI end-to-end: train a tiny run, export, reload the StableHLO
    classifier, and check it reproduces the checkpoint's eval logits."""
    from tests.test_cli import TINY
    from triplegan_tpu.cli import main

    wd = str(tmp_path / "expcli")
    main(["train", "--config", "mnist100", "--workdir", wd, *TINY])
    capsys.readouterr()
    main([
        "export", "--config", "mnist100", "--workdir", wd,
        "--what", "classifier", "--batch-size", "4", *TINY,
    ])
    out = capsys.readouterr().out
    assert "exported:" in out
    path = out.strip().split("exported: ", 1)[1].splitlines()[0]
    assert os.path.exists(path)
    served_fn = load_stablehlo(path)
    imgs = np.random.RandomState(0).randint(0, 256, size=(4, 16, 16, 1)).astype(np.uint8)
    logits = np.asarray(served_fn(imgs))
    assert logits.shape == (4, 10) and np.all(np.isfinite(logits))


# ---------- weight-only int8 quantized export ----------


def test_quantize_int8_roundtrip_bound():
    """Symmetric per-output-channel PTQ: reconstruction error ≤ scale/2
    per element; 1-D arrays (biases, BN affines) pass through untouched."""
    from triplegan_tpu.export import QTensor, dequantize, quantize_int8

    rng = np.random.RandomState(0)
    params = {
        "conv": {"w": rng.normal(size=(3, 3, 8, 16)).astype(np.float32),
                 "b": rng.normal(size=(16,)).astype(np.float32)},
        "dense": {"w": (rng.normal(size=(32, 10)) * 5).astype(np.float32)},
    }
    qt = quantize_int8(params)
    assert isinstance(qt["conv"]["w"], QTensor)
    assert qt["conv"]["w"].q.dtype == jnp.int8
    assert qt["conv"]["w"].scale.shape == (1, 1, 1, 16)  # per-out-channel
    assert not isinstance(qt["conv"]["b"], QTensor)  # 1-D untouched
    deq = dequantize(qt)
    np.testing.assert_array_equal(np.asarray(deq["conv"]["b"]), params["conv"]["b"])
    for k in ("conv", "dense"):
        w, scale = params[k]["w"], np.asarray(qt[k]["w"].scale)
        err = np.abs(np.asarray(deq[k]["w"]) - w)
        assert (err <= scale / 2 + 1e-6).all()
    # max|w| per channel maps to ±127 exactly
    np.testing.assert_allclose(
        np.max(np.abs(np.asarray(qt["dense"]["w"].q)), axis=0), 127
    )


def test_quantized_serving_fns_close_to_f32(served):
    """int8 weight-only serving drifts logits only slightly and keeps the
    classifier's decisions on random inputs; generate stays in [-1,1]."""
    from triplegan_tpu.export import make_serving_fns

    cfg, nets, state, classify, generate, imgs, z, y = served
    qclassify, qgenerate = make_serving_fns(cfg, nets, state, quantize="int8")
    want = np.asarray(classify(jnp.asarray(imgs)))
    got = np.asarray(qclassify(jnp.asarray(imgs)))
    assert np.max(np.abs(got - want)) < 0.05  # fresh-init logits are O(1)
    # (no argmax-equality check: fresh-init logits are near-tied, so the
    # tiny quantization drift can legitimately flip between ~equal classes)
    gq = np.asarray(qgenerate(jnp.asarray(z), jnp.asarray(y)))
    assert np.abs(gq).max() <= 1.0 + 1e-6
    assert np.max(np.abs(gq - np.asarray(generate(jnp.asarray(z), jnp.asarray(y))))) < 0.05


def test_quantized_stablehlo_artifact_shrinks_and_serves(tmp_path):
    """The traced artifact embeds int8 weight constants: materially smaller
    than the f32 export, still loadable and close in outputs."""
    from triplegan_tpu.export import export_artifacts, load_stablehlo

    cfg = tiny_config()
    cfg.clf.conv_blocks = ((32, 32), (64,))  # params dominate module overhead
    cfg.clf.tail = (64, 32)
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 1))
    (fpath,) = export_artifacts(
        cfg, nets, state, str(tmp_path / "f"), what="classifier", batch_size=4
    )
    (qpath,) = export_artifacts(
        cfg, nets, state, str(tmp_path / "q"), what="classifier",
        batch_size=4, quantize="int8",
    )
    fsize, qsize = os.path.getsize(fpath), os.path.getsize(qpath)
    assert qsize < 0.6 * fsize, (fsize, qsize)
    imgs = np.random.RandomState(0).randint(
        0, 256, size=(4, 16, 16, 3)
    ).astype(np.uint8)
    fout = np.asarray(load_stablehlo(fpath)(imgs))
    qout = np.asarray(load_stablehlo(qpath)(imgs))
    assert np.max(np.abs(qout - fout)) < 0.05


def test_quantize_npz_rejected(served, tmp_path):
    from triplegan_tpu.export import export_artifacts

    cfg, nets, state, *_ = served
    with pytest.raises(ValueError, match="npz stores the raw"):
        export_artifacts(
            cfg, nets, state, str(tmp_path), fmt="npz", quantize="int8"
        )
