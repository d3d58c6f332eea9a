"""Round-2 parity options + perf machinery:

* subpixel deconv ≡ lax.conv_transpose (exact math, MXU-friendly lowering)
* lax.scan train-step chunking ≡ the same steps dispatched one-by-one
* α_P linear ramp / C-lr anneal schedules
* D intermediate label re-concat (SURVEY.md Appendix B)
* ZCA↔augment pipeline order flag (SURVEY.md §2.1 #3)
* checksum-verified dataset downloader (offline: file:// fixtures)
* pluggable external IS scorer (load_scorer)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks


# ---------------------------------------------------------------------------
# subpixel deconv
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "k,s,h,cin,cout",
    [(5, 2, 4, 7, 5), (3, 2, 5, 4, 6), (4, 2, 6, 3, 2), (5, 3, 4, 5, 4), (3, 1, 5, 4, 3)],
)
def test_subpixel_deconv_equals_conv_transpose(k, s, h, cin, cout):
    from jax import lax

    from triplegan_tpu.nn.layers import _CONV_DIMS, _deconv2d_subpixel

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, h, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    ref = lax.conv_transpose(
        x, w, (s, s), "SAME", dimension_numbers=_CONV_DIMS, transpose_kernel=False
    )
    got = _deconv2d_subpixel(x, w, s)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# scan chunking
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant", ["generic", "hoisted"])
def test_scan_train_step_equals_sequential_steps(variant):
    from triplegan_tpu.data.pipeline import upload_device_data
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import (
        make_device_train_step,
        make_scan_device_train_step,
        make_scan_train_step,
    )

    cfg = tiny_config()
    cfg.data_on_device = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = upload_device_data(tiny_data(cfg))
    step = make_device_train_step(cfg, nets, opts, 16)

    s_seq = create_state(cfg, nets, opts)
    for _ in range(4):
        s_seq, m_seq = jax.jit(step)(s_seq, data)

    if variant == "generic":
        scanned = jax.jit(make_scan_train_step(step, 4))
    else:
        # hoisted sampling must reproduce the same batch sequence exactly
        scanned = jax.jit(make_scan_device_train_step(cfg, nets, opts, 16, 4))
    s_scan, m_scan = scanned(create_state(cfg, nets, opts), data)

    assert int(s_scan.step) == int(s_seq.step) == 4
    # Tolerances as in test_parallel._allclose_trees: the scanned body is a
    # different XLA program (different fusion/reduction order), and Adam's
    # rsqrt(v)+eps amplifies near-zero f32 differences (observed ≈5e-5 after
    # 4 steps). A semantic divergence (wrong step count / stale state) shows
    # up orders of magnitude larger.
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
    for k in m_seq:
        np.testing.assert_allclose(float(m_seq[k]), float(m_scan[k]), atol=2e-3, rtol=2e-3)


def test_train_loop_scan_steps(tmp_path):
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.data_on_device = True
    cfg.scan_steps = 4
    cfg.workdir = str(tmp_path)
    result = train(cfg, verbose=False)
    assert result["steps"] == 16
    assert np.isfinite(result["test_error"])


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def test_alpha_p_ramp_schedule():
    from triplegan_tpu.train.schedule import alpha_p_schedule

    gate = alpha_p_schedule(0.1, warmup_steps=10, ramp_steps=0)
    assert float(gate(9)) == 0.0 and float(gate(10)) == pytest.approx(0.1)

    ramp = alpha_p_schedule(0.1, warmup_steps=10, ramp_steps=10)
    assert float(ramp(10)) == 0.0
    assert float(ramp(15)) == pytest.approx(0.05)
    assert float(ramp(20)) == pytest.approx(0.1)
    assert float(ramp(100)) == pytest.approx(0.1)


def test_c_lr_anneal_schedule():
    from triplegan_tpu.train.schedule import anneal_every_schedule

    base = lambda c: 1.0
    sched = anneal_every_schedule(base, factor=0.5, every_steps=10)
    assert float(sched(0)) == 1.0
    assert float(sched(9)) == 1.0
    assert float(sched(10)) == pytest.approx(0.5)
    assert float(sched(25)) == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# discriminator label re-concat
# ---------------------------------------------------------------------------


def test_disc_label_reconcat_shapes_and_forward():
    from triplegan_tpu.nn.networks import Discriminator

    for reconcat in (True, False):
        d = Discriminator(
            image_size=16, widths=(8, 8, 16), strides=(1, 2, 1),
            label_reconcat=reconcat,
        )
        params, state = d.init(jax.random.PRNGKey(0))
        # conv2 follows the stride-2 conv1: its input grows by num_classes
        # when label planes are re-injected mid-stack.
        in_ch = params["conv2"]["v"].shape[2]
        assert in_ch == (8 + 10 if reconcat else 8)
        x = jnp.zeros((4, 16, 16, 3))
        y = jnp.zeros((4,), jnp.int32)
        logit, _ = d.apply(params, state, x, y, train=False)
        assert logit.shape == (4,)


def test_disc_label_reconcat_uses_labels():
    """With re-concat on, intermediate labels must change the logit."""
    from triplegan_tpu.nn.networks import Discriminator

    d = Discriminator(image_size=16, widths=(8, 16), strides=(2, 1))
    params, state = d.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    l0, _ = d.apply(params, state, x, jnp.array([0, 0]), train=False)
    l1, _ = d.apply(params, state, x, jnp.array([3, 7]), train=False)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


# ---------------------------------------------------------------------------
# ZCA / augment order
# ---------------------------------------------------------------------------


def test_pipeline_zca_order():
    from triplegan_tpu.data.ondevice import random_translate, rescale, standard_pipeline
    from triplegan_tpu.data.zca import apply_zca, fit_zca

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (8, 8, 8, 3), np.uint8)
    stats = fit_zca(rng.randint(0, 256, (256, 8, 8, 3), np.uint8))
    zm, zw = jnp.asarray(stats.mean), jnp.asarray(stats.whiten)
    key = jax.random.PRNGKey(0)

    got_first = standard_pipeline(
        key, jnp.asarray(x), translate=1, zca_mean=zm, zca_whiten=zw, zca_first=True
    )
    kt, _ = jax.random.split(key)
    want_first = random_translate(kt, apply_zca(rescale(jnp.asarray(x)), zm, zw), 1)
    np.testing.assert_allclose(np.asarray(got_first), np.asarray(want_first), atol=1e-5)

    got_last = standard_pipeline(
        key, jnp.asarray(x), translate=1, zca_mean=zm, zca_whiten=zw, zca_first=False
    )
    want_last = apply_zca(random_translate(kt, rescale(jnp.asarray(x)), 1), zm, zw)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last), atol=1e-5)
    assert not np.allclose(np.asarray(got_first), np.asarray(got_last))


# ---------------------------------------------------------------------------
# downloader
# ---------------------------------------------------------------------------


def test_download_fetch_and_checksum(tmp_path):
    from triplegan_tpu.data.download import Source, fetch, md5_of

    src_file = tmp_path / "payload.bin"
    src_file.write_bytes(b"triple-gan raw data")
    good = Source(
        url=f"file://{src_file}", filename="got.bin", md5=md5_of(str(src_file))
    )
    raw = tmp_path / "raw"
    out = fetch(good, str(raw), progress=False)
    assert os.path.exists(out)
    # idempotent: second call skips (same checksum)
    assert fetch(good, str(raw), progress=False) == out

    bad = Source(url=f"file://{src_file}", filename="bad.bin", md5="0" * 32)
    with pytest.raises(IOError, match="checksum mismatch"):
        fetch(bad, str(raw), progress=False)
    assert not os.path.exists(raw / "bad.bin")


def test_download_cached_archive_still_extracts(tmp_path):
    """A checksum-valid pre-existing archive (copied from elsewhere, or left
    by a run interrupted between download and unpack) must still be
    extracted on the next fetch."""
    import tarfile

    from triplegan_tpu.data.download import Source, fetch, md5_of

    payload = tmp_path / "inner.txt"
    payload.write_bytes(b"raw batch bytes")
    archive = tmp_path / "data.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(payload, arcname="extracted/inner.txt")

    raw = tmp_path / "raw"
    raw.mkdir()
    # Simulate the cached case: archive already in raw_dir, never extracted.
    (raw / "data.tar.gz").write_bytes(archive.read_bytes())
    src = Source(
        url=f"file://{archive}", filename="data.tar.gz",
        md5=md5_of(str(archive)), extract=True,
    )
    fetch(src, str(raw), progress=False)
    assert (raw / "extracted" / "inner.txt").read_bytes() == b"raw batch bytes"


def test_download_rejects_path_traversal_archive(tmp_path):
    """extractall(filter='data') must refuse ../-escaping members."""
    import tarfile

    from triplegan_tpu.data.download import Source, fetch, md5_of

    payload = tmp_path / "evil.txt"
    payload.write_bytes(b"escape")
    archive = tmp_path / "evil.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(payload, arcname="../evil.txt")

    raw = tmp_path / "raw"
    src = Source(
        url=f"file://{archive}", filename="evil.tar.gz",
        md5=md5_of(str(archive)), extract=True,
    )
    with pytest.raises(tarfile.OutsideDestinationError):
        fetch(src, str(raw), progress=False)
    assert not (tmp_path / "evil_out").exists()


def test_download_registry_covers_all_datasets():
    from triplegan_tpu.data.download import SOURCES
    from triplegan_tpu.data.prepare import PREPARERS, RAW_FREE

    # Every dataset whose converter reads raw files has a pinned download
    # source; raw-free datasets (data ships in-package) need none.
    assert set(SOURCES) == set(PREPARERS) - RAW_FREE
    for srcs in SOURCES.values():
        for s in srcs:
            assert len(s.md5) == 32


# ---------------------------------------------------------------------------
# external IS scorer
# ---------------------------------------------------------------------------


def test_load_scorer_npz_and_inception_score(tmp_path):
    from triplegan_tpu.eval.inception import inception_score, load_scorer

    rng = np.random.RandomState(0)
    w = rng.randn(8 * 8 * 3, 10).astype(np.float32)
    path = tmp_path / "scorer.npz"
    np.savez(path, w=w, b=np.zeros(10, np.float32))
    scorer = load_scorer(str(path))
    images = jnp.asarray(rng.randn(20, 8, 8, 3), jnp.float32)
    logits = scorer(images)
    assert logits.shape == (20, 10)
    mean, std = inception_score(scorer, images, n_splits=4)
    assert 1.0 <= mean <= 10.0 and std >= 0.0


def test_inception_score_chunks_scorer_calls():
    """The scorer runs in bounded chunks (an Inception-v3 SavedModel resizes
    to 299² f32 — one call over 5k samples would be ~5 GB), and chunking
    must not change the score."""
    from triplegan_tpu.eval.inception import inception_score

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(20, 4, 4, 1), jnp.float32)
    w = jnp.asarray(rng.randn(16, 10), jnp.float32)
    calls = []

    def scorer(x):
        calls.append(int(x.shape[0]))
        return jnp.reshape(x, (x.shape[0], -1)) @ w

    chunked = inception_score(scorer, images, n_splits=4, batch_size=8)
    assert calls == [8, 8, 4]
    calls.clear()
    whole = inception_score(scorer, images, n_splits=4, batch_size=1000)
    assert calls == [20]
    np.testing.assert_allclose(chunked, whole, rtol=1e-6)


def test_cli_inception_scorer_path(tmp_path):
    """End-to-end: train 2 steps, then score with an external .npz scorer."""
    from triplegan_tpu import cli
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    train(cfg, max_steps=2, verbose=False)

    rng = np.random.RandomState(0)
    w = rng.randn(16 * 16 * 3, 10).astype(np.float32)
    spath = tmp_path / "scorer.npz"
    np.savez(spath, w=w)
    cli.main(
        [
            "inception", "--config", "mnist100", "--workdir", str(tmp_path),
            "--set", "dataset=synthetic", "--set", "image_size=16",
            "--set", "channels=3", "--set", "zca=False",
            "--set", "z_dim=16", "--set", "gen.widths=(32, 16)",
            "--set", "disc.widths=(16, 16)", "--set", "disc.strides=(1, 2)",
            "--set", "clf.conv_blocks=((8, 8), (16,))", "--set", "clf.tail=(16, 8)",
            "--set", "num_labeled=40", "--set", "name=tiny",
            "--n-samples", "16", "--n-splits", "2",
            "--scorer-path", str(spath),
        ]
    )


def test_rescale_flag_wired_and_guarded():
    """cfg.rescale=False feeds raw [0,255] pixels (review: the knob was
    previously dead); combined with ZCA it must refuse loudly, since ZCA
    stats are fit in [-1,1] space."""
    from triplegan_tpu.data.ondevice import standard_pipeline

    x = (np.arange(2 * 4 * 4 * 3) % 256).astype(np.uint8).reshape(2, 4, 4, 3)
    raw = standard_pipeline(None, jnp.asarray(x), train=False, do_rescale=False)
    np.testing.assert_allclose(np.asarray(raw), x.astype(np.float32))
    scaled = standard_pipeline(None, jnp.asarray(x), train=False)
    assert float(jnp.max(scaled)) <= 1.0 and float(jnp.min(scaled)) >= -1.0

    with pytest.raises(ValueError, match="rescale=False is incompatible"):
        standard_pipeline(
            None,
            jnp.asarray(x),
            train=False,
            do_rescale=False,
            zca_mean=jnp.zeros((48,)),
            zca_whiten=jnp.eye(48),
        )


def test_resolve_zca_prefers_prepared_stats(tmp_path):
    """_resolve_zca must load the stats `prepare` saved into the data dir
    instead of refitting (review: the prepare artifact was dead), and cache
    them into the run dir."""
    from triplegan_tpu.data.zca import ZCAStats
    from triplegan_tpu.train.loop import _resolve_zca

    cfg = tiny_config()
    cfg.zca = True
    cfg.dataset = "cifar10"
    cfg.data_dir = str(tmp_path / "data")
    d = cfg.image_size * cfg.image_size * cfg.channels
    marked = ZCAStats(
        mean=np.full((d,), 0.123, np.float32), whiten=np.eye(d, dtype=np.float32)
    )
    os.makedirs(os.path.join(cfg.data_dir, "cifar10"))
    marked.save(os.path.join(cfg.data_dir, "cifar10", "zca_stats.npz"))

    workdir = str(tmp_path / "run")
    stats = _resolve_zca(cfg, tiny_data(cfg), workdir)
    np.testing.assert_allclose(stats.mean, marked.mean)  # loaded, not refit
    assert os.path.exists(os.path.join(workdir, "zca_stats.npz"))


def test_train_loop_cadence_zero_disables(tmp_path):
    """eval_every_epochs=0 / ckpt_every_epochs=0 must disable the periodic
    work, not ZeroDivisionError at the first epoch boundary (review)."""
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.steps_per_epoch = 2
    cfg.epochs = 2
    cfg.eval_every_epochs = 0
    cfg.ckpt_every_epochs = 0
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 4
    assert 0.0 <= result["test_error"] <= 1.0  # final eval still runs


def test_train_profile_dir_writes_trace(tmp_path):
    """cfg.profile_dir captures a jax.profiler trace of the hot loop
    (the reference's nvprof/TF-timeline equivalent, SURVEY §5) — previously
    only bench.py could trace; MIGRATION.md promises it for train runs."""
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path / "run")
    cfg.steps_per_epoch = 4
    cfg.epochs = 2
    cfg.profile_dir = str(tmp_path / "trace")
    cfg.profile_steps = 2
    train(cfg, data=tiny_data(cfg), verbose=False)
    assert os.path.isdir(cfg.profile_dir)
    found = [
        f for _, _, files in os.walk(cfg.profile_dir) for f in files
        if f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb"))
    ]
    assert found, "no trace artifacts written"


def test_load_scorer_tf_savedmodel(tmp_path):
    """The Inception-v3 adapter's SavedModel branch, end-to-end against a
    real (tiny) TF SavedModel with a serving signature: images resized to
    299², dict output unwrapped, chunked scoring works."""
    tf = pytest.importorskip("tensorflow")
    from triplegan_tpu.eval.inception import inception_score, load_scorer

    class TinyScorer(tf.Module):
        def __init__(self):
            super().__init__()
            self.w = tf.Variable(
                tf.random.stateless_normal((3, 10), seed=(0, 0)), name="w"
            )

        @tf.function(
            input_signature=[tf.TensorSpec([None, 299, 299, 3], tf.float32)]
        )
        def __call__(self, x):
            feats = tf.reduce_mean(x, axis=[1, 2])  # (N, 3)
            return {"logits": feats @ self.w}

    mod = TinyScorer()
    d = str(tmp_path / "savedmodel")
    tf.saved_model.save(mod, d, signatures=mod.__call__)

    scorer = load_scorer(d)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(12, 8, 8, 3) * 2 - 1, jnp.float32)
    logits = scorer(images)
    assert logits.shape == (12, 10)
    mean, std = inception_score(scorer, images, n_splits=3, batch_size=4)
    assert 1.0 <= mean <= 10.0 and std >= 0.0


def test_load_scorer_savedmodel_honors_signature_size(tmp_path):
    """A SavedModel whose serving signature declares a non-299 spatial size
    (e.g. a 64² scorer) must be fed at that size, not Inception's 299."""
    tf = pytest.importorskip("tensorflow")
    from triplegan_tpu.eval.inception import load_scorer

    class Sized(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None, 64, 64, 3], tf.float32)])
        def __call__(self, x):
            tf.debugging.assert_equal(tf.shape(x)[1], 64)
            return {"logits": tf.reduce_mean(x, axis=[1, 2])}

    mod = Sized()
    d = str(tmp_path / "sm64")
    tf.saved_model.save(mod, d, signatures=mod.__call__)
    scorer = load_scorer(d)
    logits = scorer(jnp.zeros((3, 8, 8, 3), jnp.float32))
    assert logits.shape == (3, 3)
