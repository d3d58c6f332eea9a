"""Train-step tests (SURVEY.md §4.4): golden determinism, sequential-update
semantics, α_P gating, finite losses, parameter movement."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.data.pipeline import BatchSampler
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state
from triplegan_tpu.train.step import make_eval_step, make_train_step


def _setup(cfg, total_steps=16):
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, total_steps)
    state = create_state(cfg, nets, opts)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    step = jax.jit(make_train_step(cfg, nets, opts, total_steps))
    return nets, opts, state, sampler, step


def test_step_runs_and_losses_finite():
    cfg = tiny_config()
    _, _, state, sampler, step = _setup(cfg)
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes)
    state2, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state2.step) == 1


def test_step_deterministic_across_runs():
    """Golden test: same seed, same batch → bitwise-identical states."""
    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = tiny_data(cfg)

    def run():
        state = create_state(cfg, nets, opts)
        sampler = BatchSampler(data, cfg.batch_size, seed=0)
        step = jax.jit(make_train_step(cfg, nets, opts, 16))
        for _ in range(2):
            state, m = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
        return state, m

    s1, m1 = run()
    s2, m2 = run()
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))


def test_all_players_update():
    cfg = tiny_config()
    _, _, state, sampler, step = _setup(cfg)
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes)
    state2, _ = step(state, batch)
    for player in ("gen", "disc", "clf"):
        before = jax.tree.leaves(state.params[player])
        after = jax.tree.leaves(state2.params[player])
        moved = any(
            float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(before, after)
        )
        assert moved, f"{player} params did not move"


def test_bn_stats_update_once_per_step():
    cfg = tiny_config()
    _, _, state, sampler, step = _setup(cfg)
    state2, _ = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    g_moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(state.bn["gen"]), jax.tree.leaves(state2.bn["gen"]))
    )
    c_moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(state.bn["clf"]), jax.tree.leaves(state2.bn["clf"]))
    )
    assert g_moved and c_moved


def test_alpha_p_warmup_gating():
    cfg = tiny_config()
    # warm-up = 1 epoch × 4 steps/epoch = 4 steps
    _, _, state, sampler, step = _setup(cfg)
    _, m0 = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    assert float(m0["alpha_p"]) == 0.0
    state = state.replace(step=jnp.asarray(8, jnp.int32))
    _, m1 = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    assert abs(float(m1["alpha_p"]) - cfg.alpha_p) < 1e-6
    assert float(m1["c_pseudo"]) > 0.0


def test_eval_step_masked_count():
    cfg = tiny_config()
    nets, opts, state, sampler, _ = _setup(cfg)
    ev = jax.jit(make_eval_step(cfg, nets))
    batches = list(sampler.test_batches(12))
    total = sum(float(ev(state, b)["count"]) for b in batches)
    assert total == len(tiny_data(cfg).x_test)


def test_fused_clf_forward_mode():
    """Throughput option: one 3B-row classifier pass — runs, finite, moves C."""
    cfg = tiny_config()
    cfg.fused_clf_forward = True
    _, _, state, sampler, step = _setup(cfg)
    state2, metrics = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite (fused clf)"
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(
            jax.tree.leaves(state.params["clf"]), jax.tree.leaves(state2.params["clf"])
        )
    )
    assert moved


def test_make_networks_types():
    from triplegan_tpu.nn.networks import Classifier, Discriminator, Generator

    cfg = tiny_config()
    gen, disc, clf = make_networks(cfg)
    assert isinstance(gen, Generator)
    assert isinstance(disc, Discriminator)
    assert isinstance(clf, Classifier)


def test_bfloat16_compute_path():
    cfg = tiny_config()
    cfg.compute_dtype = "bfloat16"
    _, _, state, sampler, step = _setup(cfg)
    state2, metrics = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite under bf16"
    # master params stay f32
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(state2.params))
