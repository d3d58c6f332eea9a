"""Smoke integration (SURVEY.md §4.7): a short synthetic Triple-GAN run
through the full driver — losses move, eval + sampling + resume work."""

import os

import numpy as np

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.train.loop import train
import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive


def test_end_to_end_training(tmp_path):
    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == cfg.epochs * cfg.steps_per_epoch
    assert 0.0 <= result["test_error"] <= 1.0
    for k, v in result["metrics"].items():
        assert np.isfinite(v), f"{k} not finite"
    wd = result["workdir"]
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
    pngs = [f for f in os.listdir(wd) if f.endswith(".png")]
    assert pngs, "no sample grids written"
    assert os.path.isdir(os.path.join(wd, "ckpt"))


def test_classifier_learns_on_synthetic(tmp_path):
    """The synthetic dataset is linearly separable by mean intensity; a short
    run must beat chance (90% error) clearly."""
    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.epochs = 8
    cfg.steps_per_epoch = 8
    cfg.eval_every_epochs = 8
    cfg.ckpt_every_epochs = 8
    cfg.lr_c = 3e-3                # learn fast enough for a 64-step smoke run
    cfg.lr_decay_start_frac = 1.0  # no decay inside the smoke window
    result = train(cfg, data=tiny_data(cfg, n_train=256, n_test=128), verbose=False)
    assert result["test_error"] < 0.75, f"error {result['test_error']}"


def test_resume_from_checkpoint(tmp_path):
    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    data = tiny_data(cfg)
    r1 = train(cfg, data=data, max_steps=8, verbose=False)
    assert r1["steps"] == 8
    r2 = train(cfg, data=data, max_steps=4, verbose=False)
    assert r2["steps"] == 12  # resumed from 8, ran 4 more


def test_sample_grid_shape(tmp_path):
    import jax

    from triplegan_tpu.configs.base import make_networks
    from triplegan_tpu.eval.sample import class_grid_inputs, make_sample_fn, to_uint8_grid
    from triplegan_tpu.train.schedule import make_optimizers
    from triplegan_tpu.train.state import create_state

    cfg = tiny_config()
    nets = make_networks(cfg)
    state = create_state(cfg, nets, make_optimizers(cfg, 4))
    z, labels = class_grid_inputs(cfg, n_per_class=4)
    imgs = make_sample_fn(cfg, nets)(state, z, labels)
    grid = to_uint8_grid(imgs, cfg.num_classes, 4)
    assert grid.shape == (cfg.num_classes * cfg.image_size, 4 * cfg.image_size, 3)
    assert grid.dtype == np.uint8


def test_conditional_generation_fidelity(tmp_path):
    """The strongest integration check: after a short run, the trained
    classifier must recognize the generator's class-conditional samples far
    above chance — proving the label-conditioning path (z ⊕ onehot into G,
    label planes into D, R_P into C) end-to-end. (On TPU at full scale this
    reaches 99.3% — docs/DESIGN.md.)"""
    import jax
    import jax.numpy as jnp

    from triplegan_tpu.configs.base import make_networks

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.epochs = 25
    cfg.steps_per_epoch = 15
    cfg.eval_every_epochs = 25
    cfg.ckpt_every_epochs = 25
    cfg.alpha_p_warmup_epochs = 4
    cfg.data_on_device = True
    cfg.lr_c = 1e-3
    cfg.lr_g = 1e-3
    cfg.lr_decay_start_frac = 1.0
    result = train(cfg, data=tiny_data(cfg, n_train=512, n_test=128), verbose=False)
    state = result["state"]
    gen, _, clf = make_networks(cfg)
    n = 200
    y = jnp.tile(jnp.arange(10, dtype=jnp.int32), n // 10)
    z = jax.random.normal(jax.random.PRNGKey(7), (n, cfg.z_dim))
    xg, _ = gen.apply(state.params["gen"], state.bn["gen"], z, y, train=False)
    logits, _ = clf.apply(state.params["clf"], state.bn["clf"], xg, train=False)
    acc = float(jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32)))
    assert acc > 0.25, f"conditional fidelity {acc} barely above chance (0.1)"


def test_train_fully_reproducible(tmp_path):
    """Two full runs with the same seed produce identical final metrics and
    test error (golden-run property; the reference's fixed-seed contract)."""
    cfg1 = tiny_config()
    cfg1.workdir = str(tmp_path / "a")
    r1 = train(cfg1, data=tiny_data(cfg1), verbose=False)
    cfg2 = tiny_config()
    cfg2.workdir = str(tmp_path / "b")
    r2 = train(cfg2, data=tiny_data(cfg2), verbose=False)
    assert r1["test_error"] == r2["test_error"]
    for k in r1["metrics"]:
        assert r1["metrics"][k] == r2["metrics"][k], k


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from triplegan_tpu.utils.profiling import step_timer, trace

    with trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import os

    assert any("plugins" in d or f for d, _, f in os.walk(tmp_path)), "no trace output"
    res = {}
    with step_timer(res):
        jax.block_until_ready(jnp.ones((4,)) * 2)
    assert res["seconds"] > 0


def test_inception_score_uniform_vs_confident():
    import jax.numpy as jnp

    from triplegan_tpu.eval.inception import inception_score

    n, k = 100, 10
    uniform_logits = jnp.zeros((n, k))
    score_u, _ = inception_score(lambda x: uniform_logits, jnp.zeros((n, 1)), n_splits=2)
    assert abs(score_u - 1.0) < 1e-3  # p(y|x)=p(y) → IS = 1
    confident = 50.0 * jnp.eye(k)[np.arange(n) % k]
    score_c, _ = inception_score(lambda x: confident, jnp.zeros((n, 1)), n_splits=2)
    assert score_c > 5.0  # diverse + confident → high IS


def test_grid_layout_and_inputs():
    """Grid geometry: row r is class r, columns share z across rows, and
    to_uint8_grid places image (r, c) at block (r, c) — a wrong transpose
    would silently scramble every saved sample sheet."""
    import jax.numpy as jnp
    import numpy as np

    from tests.helpers import tiny_config
    from triplegan_tpu.eval.sample import class_grid_inputs, to_uint8_grid

    cfg = tiny_config()
    z, labels = class_grid_inputs(cfg, n_per_class=3, seed=0)
    assert z.shape == (cfg.num_classes * 3, cfg.z_dim)
    np.testing.assert_array_equal(
        np.asarray(labels), np.repeat(np.arange(cfg.num_classes), 3)
    )
    # same z for column c in every class row
    np.testing.assert_array_equal(np.asarray(z[:3]), np.asarray(z[3:6]))

    # distinct constant images: value encodes (row, col)
    h = w = 4
    imgs = jnp.stack(
        [jnp.full((h, w, 1), (r * 3 + c) / 50.0) for r in range(2) for c in range(3)]
    )
    grid = to_uint8_grid(imgs, n_rows=2, n_cols=3)
    assert grid.shape == (2 * h, 3 * w, 1)
    for r in range(2):
        for c in range(3):
            block = grid[r * h : (r + 1) * h, c * w : (c + 1) * w, 0]
            expect = int(((r * 3 + c) / 50.0 + 1.0) * 127.5)  # astype truncates
            assert (block == expect).all(), (r, c)
