"""Round-3 fixes and options (VERDICT r2 next-steps #4–#7, ADVICE r2):

* log_every=0 disables interval logging without crashing
* SavedModel/npz scorer: output-by-name selection + probability detection
  (no silent double-softmax)
* configurable translate-crop padding (aug_pad_mode: reflect|zeros)
* scan-chunk metric fidelity (scan_metrics: last|mean)
* restore-only checkpoint managers never purge another process's tmp dirs
* merge_saved warns on type-drifted keys instead of silently dropping them
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks


# ---------------------------------------------------------------------------
# log_every=0
# ---------------------------------------------------------------------------


def test_log_every_zero_disables_interval_logging(tmp_path):
    """cfg.log_every=0 must disable interval logging (like the other
    cadence-0 conventions), not ZeroDivisionError at the first step
    (VERDICT r2 weak #3). The final fetch still runs."""
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.steps_per_epoch = 2
    cfg.epochs = 2
    cfg.log_every = 0
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 4
    assert result["metrics"], "final metrics fetch should still happen"
    # Only the end-of-run scalar record should exist (plus eval records).
    path = os.path.join(result["workdir"], "metrics.jsonl")
    steps_logged = {
        rec["step"] for rec in map(json.loads, open(path)) if "loss_d" in rec
    }
    assert steps_logged == {4}


# ---------------------------------------------------------------------------
# scorer hardening
# ---------------------------------------------------------------------------


def test_pick_output_selection_rules():
    from triplegan_tpu.eval.inception import _pick_output

    # explicit name wins
    assert _pick_output({"a": 1, "logits": 2}, "a") == 1
    with pytest.raises(KeyError):
        _pick_output({"a": 1}, "missing")
    # single output used as-is
    assert _pick_output({"whatever": 7}, None) == 7
    # conventional-name preference, never arbitrary dict order
    assert _pick_output({"zz_first": 0, "logits": 3}, None) == 3
    assert _pick_output({"zz_first": 0, "probabilities": 4}, None) == 4
    with pytest.raises(KeyError, match="scorer-output-name"):
        _pick_output({"foo": 1, "bar": 2}, None)


def test_as_logits_probs_roundtrip():
    """Probability outputs must pass through the downstream softmax
    unchanged (softmax(log p) == p), not be flattened by a second
    softmax (VERDICT r2 weak #4)."""
    from triplegan_tpu.eval.inception import _as_logits

    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float64)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # explicit probs: softmax recovers p exactly
    out = _as_logits(probs, "probs", {})
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(jnp.asarray(out), axis=-1)), probs, atol=1e-6
    )
    # explicit logits: untouched
    np.testing.assert_array_equal(_as_logits(logits, "logits", {}), logits)
    # auto: detects probability rows once, warns, and sticks with it
    state = {}
    with pytest.warns(UserWarning, match="double"):
        out = _as_logits(probs, "auto", state)
    assert state["is_probs"] is True
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(jnp.asarray(out), axis=-1)), probs, atol=1e-6
    )
    # auto on real logits: passthrough, no flattening
    state = {}
    np.testing.assert_array_equal(_as_logits(logits, "auto", state), logits)
    assert state["is_probs"] is False


def test_savedmodel_probs_output_no_double_softmax(tmp_path):
    """A Keras-style SavedModel emitting softmax probabilities must yield
    the same inception score as the equivalent logits-emitting model."""
    tf = pytest.importorskip("tensorflow")
    from triplegan_tpu.eval.inception import inception_score, load_scorer

    class Probs(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None, 8, 8, 3], tf.float32)])
        def __call__(self, x):
            feats = tf.reshape(tf.reduce_mean(x, axis=[1, 2]), (-1, 3))
            logits = tf.concat([feats * 3.0, -feats * 2.0], axis=-1)
            return {"predictions": tf.nn.softmax(logits, axis=-1)}

    class Logits(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None, 8, 8, 3], tf.float32)])
        def __call__(self, x):
            feats = tf.reshape(tf.reduce_mean(x, axis=[1, 2]), (-1, 3))
            return {"logits": tf.concat([feats * 3.0, -feats * 2.0], axis=-1)}

    d_p, d_l = str(tmp_path / "probs"), str(tmp_path / "logits")
    mp, ml = Probs(), Logits()
    tf.saved_model.save(mp, d_p, signatures=mp.__call__)
    tf.saved_model.save(ml, d_l, signatures=ml.__call__)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(24, 8, 8, 3) * 2 - 1, jnp.float32)
    with pytest.warns(UserWarning, match="double"):
        mean_p, _ = inception_score(load_scorer(d_p), images, n_splits=3, batch_size=8)
    mean_l, _ = inception_score(load_scorer(d_l), images, n_splits=3, batch_size=8)
    np.testing.assert_allclose(mean_p, mean_l, rtol=1e-4)


def test_savedmodel_multi_output_by_name(tmp_path):
    """output_name selects the scoring tensor from a multi-output serving
    signature instead of an arbitrary dict pick."""
    tf = pytest.importorskip("tensorflow")
    from triplegan_tpu.eval.inception import load_scorer

    class Multi(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None, 8, 8, 3], tf.float32)])
        def __call__(self, x):
            feats = tf.reshape(tf.reduce_mean(x, axis=[1, 2]), (-1, 3))
            return {"aux_embedding": feats * 100.0, "class_scores": feats}

    mod = Multi()
    d = str(tmp_path / "multi")
    tf.saved_model.save(mod, d, signatures=mod.__call__)

    scorer = load_scorer(d, outputs="logits", output_name="class_scores")
    out = np.asarray(scorer(jnp.ones((2, 8, 8, 3), jnp.float32)))
    np.testing.assert_allclose(out, np.ones((2, 3)), atol=1e-5)
    # no name + no conventional key → explicit error
    with pytest.raises(KeyError, match="scorer-output-name"):
        load_scorer(d)(jnp.ones((2, 8, 8, 3), jnp.float32))


def test_npz_scorer_probs_mode(tmp_path):
    from triplegan_tpu.eval.inception import load_scorer

    # A "linear probe" whose weights happen to emit probability rows.
    w = np.zeros((12, 4), np.float32)
    b = np.asarray([0.1, 0.2, 0.3, 0.4], np.float32)
    path = str(tmp_path / "probe.npz")
    np.savez(path, w=w, b=b)
    scorer = load_scorer(path, outputs="probs")
    out = scorer(jnp.zeros((5, 2, 2, 3), jnp.float32))
    p = np.asarray(jax.nn.softmax(out, axis=-1))
    np.testing.assert_allclose(p, np.tile(b, (5, 1)), atol=1e-5)


def test_load_scorer_rejects_bad_outputs_mode(tmp_path):
    from triplegan_tpu.eval.inception import load_scorer

    np.savez(str(tmp_path / "w.npz"), w=np.zeros((3, 2), np.float32))
    with pytest.raises(ValueError, match="auto|logits|probs"):
        load_scorer(str(tmp_path / "w.npz"), outputs="softmax")


# ---------------------------------------------------------------------------
# aug_pad_mode
# ---------------------------------------------------------------------------


def test_random_translate_pad_modes():
    from triplegan_tpu.data.ondevice import random_translate

    key = jax.random.PRNGKey(3)
    x = jnp.ones((16, 8, 8, 3), jnp.float32)
    # reflect on a constant image is a no-op
    out_r = random_translate(key, x, 2, "reflect")
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(x))
    # zeros shifts real zeros in at the borders for any nonzero offset
    out_z = np.asarray(random_translate(key, x, 2, "zeros"))
    assert out_z.min() == 0.0, "expected zero padding to enter the crop"
    # values are only ever 0 (padding) or 1 (image), never interpolated
    assert set(np.unique(out_z)) <= {0.0, 1.0}
    with pytest.raises(ValueError, match="reflect|zeros"):
        random_translate(key, x, 2, "wrap")


def test_translate_zeros_matches_numpy_reference():
    """pad_mode="zeros" output must be exactly SOME zero-padded crop of the
    input per example — i.e. a literal numpy pad-and-crop, with each example
    translated independently (and not all by the same offset)."""
    from triplegan_tpu.data.ondevice import random_translate

    key = jax.random.PRNGKey(7)
    rng = np.random.RandomState(0)
    x = rng.rand(16, 5, 5, 2).astype(np.float32)
    r = 2
    got = np.asarray(random_translate(key, jnp.asarray(x), r, "zeros"))

    offsets = []
    for i in range(16):
        xp = np.pad(x[i], ((r, r), (r, r), (0, 0)))
        matches = [
            (oy, ox)
            for oy in range(2 * r + 1)
            for ox in range(2 * r + 1)
            if np.allclose(xp[oy : oy + 5, ox : ox + 5], got[i], atol=1e-6)
        ]
        assert matches, f"example {i}: output is not any zero-padded crop"
        offsets.append(matches[0])
    assert len(set(offsets)) > 1, "offsets should vary per example"


def test_standard_pipeline_pad_mode_threads_through():
    from triplegan_tpu.data.ondevice import standard_pipeline

    key = jax.random.PRNGKey(0)
    x = (np.ones((8, 8, 8, 3)) * 255).astype(np.uint8)
    out_r = np.asarray(
        standard_pipeline(key, jnp.asarray(x), translate=2, pad_mode="reflect")
    )
    out_z = np.asarray(
        standard_pipeline(key, jnp.asarray(x), translate=2, pad_mode="zeros")
    )
    # 255-uint8 rescales to 1.0 everywhere; reflect keeps it constant, while
    # zero padding (constant 0.0 — applied after rescale, so 0 = mid-gray in
    # [-1,1]) enters at shifted borders.
    np.testing.assert_allclose(out_r, np.ones_like(out_r), atol=1e-6)
    assert out_z.min() == 0.0


def test_train_step_honors_aug_pad_mode():
    """cfg.aug_pad_mode reaches the compiled step's preprocess (smoke: the
    step builds and runs under both modes and produces finite losses)."""
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import make_train_step

    for mode in ("reflect", "zeros"):
        cfg = tiny_config()
        cfg.aug_translate = 2
        cfg.aug_pad_mode = mode
        nets = make_networks(cfg)
        opts = make_optimizers(cfg, 8)
        state = create_state(cfg, nets, opts)
        sampler = BatchSampler(tiny_data(cfg), cfg.batch_size, seed=0)
        step = jax.jit(make_train_step(cfg, nets, opts, 8))
        state, metrics = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
        assert np.isfinite(float(metrics["loss_d"]))


# ---------------------------------------------------------------------------
# scan_metrics
# ---------------------------------------------------------------------------


def test_scan_metrics_mean_equals_sequential_mean():
    from triplegan_tpu.data.pipeline import upload_device_data
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import (
        make_device_train_step,
        make_scan_device_train_step,
    )

    cfg = tiny_config()
    cfg.data_on_device = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = upload_device_data(tiny_data(cfg))

    step = jax.jit(make_device_train_step(cfg, nets, opts, 16))
    s = create_state(cfg, nets, opts)
    seq = []
    for _ in range(4):
        s, m = step(s, data)
        seq.append({k: float(v) for k, v in m.items()})

    scanned = jax.jit(
        make_scan_device_train_step(cfg, nets, opts, 16, 4, metrics_mode="mean")
    )
    _, m_mean = scanned(create_state(cfg, nets, opts), data)
    for k in seq[0]:
        want = np.mean([d[k] for d in seq])
        np.testing.assert_allclose(float(m_mean[k]), want, atol=2e-3, rtol=2e-3)


def test_scan_metrics_bad_mode_raises():
    from triplegan_tpu.train.step import _reduce_scan_metrics

    with pytest.raises(ValueError, match="last|mean"):
        _reduce_scan_metrics({"a": jnp.zeros((4,))}, "median")


def test_train_loop_scan_metrics_mean(tmp_path):
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.data_on_device = True
    cfg.workdir = str(tmp_path)
    cfg.scan_steps = 2
    cfg.scan_metrics = "mean"
    cfg.steps_per_epoch = 4
    cfg.epochs = 1
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 4
    assert np.isfinite(result["metrics"]["loss_c"])


# ---------------------------------------------------------------------------
# share_pseudo_forward (VERDICT r2 next-step #9 — measured FLOP lever)
# ---------------------------------------------------------------------------


def test_share_pseudo_forward_grads_match_naive():
    """With stochastic layers off, argmax pseudo-labels, and C's unlabeled
    batch set equal to D's, the shared-forward step (one classifier forward
    + vjp-grafted cotangent) must produce the SAME updates as the unshared
    step — train-mode BN uses batch statistics, so the only differences
    (BN-state chaining order, dropout keys) are inert under this setup.
    This pins the correctness of the vjp composition."""
    from tests.helpers import deterministic_config
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import make_train_step

    cfg = deterministic_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 8)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes)
    batch["c"]["x_u"] = batch["d"]["x_u"]  # shared unlabeled batch

    def run(share):
        c = deterministic_config()
        c.share_pseudo_forward = share
        step = jax.jit(
            make_train_step(c, nets, opts, 8, pseudo_label_mode="argmax")
        )
        s, m = step(create_state(c, nets, opts), batch)
        return s, m

    s_a, m_a = run(False)
    s_b, m_b = run(True)
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_share_pseudo_forward_smoke_trains():
    """Full stochastic config: the shared-forward step runs, losses are
    finite, and all three players' params move."""
    from tests.helpers import tiny_config
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg.share_pseudo_forward = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 8)
    sampler = BatchSampler(tiny_data(cfg), cfg.batch_size, seed=0)
    step = jax.jit(make_train_step(cfg, nets, opts, 8))
    state = create_state(cfg, nets, opts)
    before = jax.tree.map(np.asarray, state.params)
    for _ in range(2):
        state, metrics = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    for k in ("loss_d", "loss_g", "loss_c"):
        assert np.isfinite(float(metrics[k]))
    for pl in ("gen", "disc", "clf"):
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(before[pl]), jax.tree.leaves(state.params[pl])
            )
        )
        assert moved, f"{pl} params did not move"


def test_share_pseudo_forward_skips_dead_c_unlabeled_draw():
    """Round-3 review finding: with share_pseudo_forward the C stream's x_u
    is aliased to D's, so both samplers must skip the dead gather — and the
    key-split structure must keep every *used* field's sample sequence
    identical to the untrimmed sampler."""
    from tests.helpers import deterministic_config
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.train.step import _make_batch_sampler

    cfg = deterministic_config()

    # Host sampler: trimmed c stream, d stream untouched.
    s = BatchSampler(tiny_data(cfg), cfg.batch_size, seed=0)
    t = s.next_triple(cfg.z_dim, cfg.num_classes, skip_c_unlabeled=True)
    assert "x_u" not in t["c"] and "x_u" in t["d"]
    assert set(t["c"]) == {"x_l", "y_l", "z", "y_g"}

    # Device sampler: cfg flag trims c, and shared fields match the
    # untrimmed draw exactly (same key folds).
    data = {
        "x_l": jnp.arange(6 * 4 * 4 * 3, dtype=jnp.uint8).reshape(6, 4, 4, 3),
        "y_l": jnp.arange(6, dtype=jnp.int32) % cfg.num_classes,
        "x_u": jnp.arange(8 * 4 * 4 * 3, dtype=jnp.uint8).reshape(8, 4, 4, 3),
    }
    rng = jax.random.PRNGKey(0)
    full = _make_batch_sampler(cfg, None, 1)(rng, 3, data)
    cfg.share_pseudo_forward = True
    trimmed = _make_batch_sampler(cfg, None, 1)(rng, 3, data)
    assert "x_u" not in trimmed["c"] and "x_u" in trimmed["d"]
    for stream in ("d", "c", "g"):
        for k, v in trimmed[stream].items():
            np.testing.assert_array_equal(np.asarray(v), np.asarray(full[stream][k]))


def test_share_pseudo_forward_device_data_smoke():
    """The trimmed device-data batch must flow through the scan-chunked
    production path end-to-end with share_pseudo_forward on."""
    from tests.helpers import tiny_config
    from triplegan_tpu.data.pipeline import upload_device_data
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state
    from triplegan_tpu.train.step import make_scan_device_train_step

    cfg = tiny_config()
    cfg.share_pseudo_forward = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 8)
    data = upload_device_data(tiny_data(cfg))
    scan = jax.jit(make_scan_device_train_step(cfg, nets, opts, 8, 2))
    state, metrics = scan(create_state(cfg, nets, opts), data)
    assert int(state.step) == 2
    for k in ("loss_d", "loss_g", "loss_c"):
        assert np.isfinite(float(metrics[k]))


# ---------------------------------------------------------------------------
# ADVICE r2 items
# ---------------------------------------------------------------------------


def test_final_eval_refreshed_when_run_ends_mid_epoch(tmp_path):
    """A run that stops between epoch boundaries must report the FINAL
    state's test error, not the stale last periodic eval — `cli eval` on the
    final checkpoint and the train loop's 'done' line are compared by the
    parity protocol (docs/PARITY.md §4)."""
    from triplegan_tpu.data.pipeline import BatchSampler
    from triplegan_tpu.train.loop import _test_stream, train
    from triplegan_tpu.train.step import make_eval_step
    from triplegan_tpu.eval.metrics import evaluate_error

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.steps_per_epoch = 4
    cfg.epochs = 2
    cfg.eval_every_epochs = 1
    data = tiny_data(cfg)
    result = train(cfg, data=data, max_steps=6, verbose=False)  # ends mid-epoch 2
    assert result["steps"] == 6
    nets = make_networks(cfg)
    eval_step = jax.jit(make_eval_step(cfg, nets))
    sampler = BatchSampler(data, cfg.batch_size, seed=cfg.seed)
    want = evaluate_error(eval_step, result["state"], _test_stream(sampler, None))
    np.testing.assert_allclose(result["test_error"], want, atol=1e-6)


def test_restore_only_manager_preserves_tmp_dirs(tmp_path):
    """A restore-only manager (eval/sample against a possibly-live run dir)
    must NOT purge *.orbax-checkpoint-tmp — that could destroy another
    process's in-flight async save (ADVICE r2). Only the writing owner
    cleans."""
    from triplegan_tpu.ckpt import CheckpointManager
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 8)
    d = tmp_path / "ckpt"
    w = CheckpointManager(str(d))
    w.save(1, create_state(cfg, nets, opts))
    w.close()

    inflight = d / "2.orbax-checkpoint-tmp"
    inflight.mkdir()
    (inflight / "partial.bin").write_bytes(b"\x00" * 8)

    ro = CheckpointManager(str(d), write=False)
    assert ro.latest_step() == 1
    assert ro.restore(create_state(cfg, nets, opts)) is not None
    ro.close()
    assert inflight.exists(), "restore-only open must not purge tmp dirs"

    # ... while a writing open (train restart) still cleans the debris.
    # orbax performs the cleanup as an async CommitFuture at open — poll
    # with a bound instead of racing it (flaked once under full-suite load).
    w2 = CheckpointManager(str(d))
    deadline = time.time() + 60
    while inflight.exists() and time.time() < deadline:
        time.sleep(0.2)
    w2.close()
    assert not inflight.exists()


def test_merge_saved_warns_on_type_drift(tmp_path):
    from triplegan_tpu.configs.base import merge_saved

    cfg = tiny_config()
    path = str(tmp_path / "config.json")
    with open(path, "w") as f:
        json.dump({"batch_size": "not-an-int", "seed": 5}, f)
    with pytest.warns(UserWarning, match="batch_size"):
        merge_saved(cfg, path)
    assert cfg.seed == 5                       # good keys still merge
    assert cfg.batch_size == 8                 # drifted key keeps the default


def test_fetch_extraction_sentinel(tmp_path, monkeypatch):
    """A checksum-valid archive with a sentinel is not re-extracted; without
    one (pre-copied tarball) it is (ADVICE r2: STL-10 re-extraction cost)."""
    import tarfile

    from triplegan_tpu.data.download import Source, fetch, md5_of

    raw = tmp_path / "raw"
    raw.mkdir()
    inner = tmp_path / "payload.txt"
    inner.write_text("hello")
    archive = raw / "data.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(inner, arcname="payload.txt")
    src = Source("http://unused", "data.tar.gz", md5_of(str(archive)), extract=True)

    # First fetch of the pre-copied tarball: extracts, writes the sentinel.
    fetch(src, str(raw), progress=False)
    assert (raw / "payload.txt").exists()
    sentinel = raw / "data.tar.gz.extracted"
    assert sentinel.exists()

    # Second fetch with the tree intact: must skip extraction entirely.
    import triplegan_tpu.data.download as dl

    opens = []
    real_open = dl.tarfile.open
    monkeypatch.setattr(
        dl.tarfile, "open", lambda *a, **k: (opens.append(1), real_open(*a, **k))[1]
    )
    fetch(src, str(raw), progress=False)
    assert not opens, "sentinel should skip re-extract while the tree exists"

    # Deleted extracted tree → self-heals despite a valid sentinel.
    (raw / "payload.txt").unlink()
    fetch(src, str(raw), progress=False)
    assert (raw / "payload.txt").exists(), "missing members must re-extract"

    # Stale sentinel (different checksum) → re-extract.
    sentinel.write_text("0" * 32)
    fetch(src, str(raw), progress=False)
    assert (raw / "payload.txt").exists()


def test_share_and_fused_flags_are_mutually_exclusive():
    """share_pseudo_forward replaces the C update entirely, so combining it
    with fused_clf_forward would silently measure shared-only; the step
    constructor must refuse the combination."""
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg.share_pseudo_forward = True
    cfg.fused_clf_forward = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 8)
    with pytest.raises(ValueError, match="mutually"):
        make_train_step(cfg, nets, opts, 8)


# ---------------------------------------------------------------------------
# preemption-safe shutdown (SIGTERM → checkpoint → resume)
# ---------------------------------------------------------------------------


def test_sigterm_checkpoints_and_resume_completes(tmp_path, monkeypatch):
    """A SIGTERM mid-run must break the loop after the in-flight dispatch,
    save a checkpoint, return preempted=True (skipping the slow final
    re-eval), restore the previous handler, and let the SAME command resume
    to completion (SURVEY §5 failure detection/recovery)."""
    import signal

    import triplegan_tpu.train.loop as loop_mod

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.steps_per_epoch = 2
    cfg.epochs = 4
    cfg.eval_every_epochs = 1  # first eval at step 2 → the signal hook below
    cfg.ckpt_every_epochs = 0
    data = tiny_data(cfg)
    before = signal.getsignal(signal.SIGTERM)

    real_eval = loop_mod.evaluate_error
    fired = []

    def eval_then_sigterm(*a, **k):
        out = real_eval(*a, **k)
        if not fired:  # deliver the real signal once, mid-loop
            fired.append(True)
            signal.raise_signal(signal.SIGTERM)
        return out

    with monkeypatch.context() as m:
        m.setattr(loop_mod, "evaluate_error", eval_then_sigterm)
        result = loop_mod.train(cfg, data=data, verbose=False)

    assert result["preempted"] is True
    assert result["steps"] == 2, "should stop right after the epoch-1 dispatch"
    assert signal.getsignal(signal.SIGTERM) is before, "handler must be restored"
    # The preempt save is on disk and the same command resumes to completion.
    resumed = loop_mod.train(cfg, data=data, verbose=False)
    assert resumed["preempted"] is False
    assert resumed["steps"] == 8
    assert resumed["test_error"] is not None


def test_cli_train_exits_75_on_preemption(monkeypatch):
    """cmd_train must exit 75 (EX_TEMPFAIL) for a preempted run so restart
    policies re-run (= resume) instead of reading success or crash."""
    import types

    import triplegan_tpu.train.loop as loop_mod
    from triplegan_tpu import cli

    monkeypatch.setattr(
        loop_mod, "train",
        lambda cfg, max_steps=None: {"preempted": True, "steps": 3,
                                     "test_error": None, "metrics": {},
                                     "workdir": "w", "state": None},
    )
    monkeypatch.setattr(cli, "_load_cfg", lambda args: None)
    with pytest.raises(SystemExit) as e:
        cli.cmd_train(types.SimpleNamespace(max_steps=None))
    assert e.value.code == 75
