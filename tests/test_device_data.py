"""HBM-resident dataset + on-device batch sampling (the zero-transfer hot
loop): determinism, correctness, and the mesh-replicated variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.data.pipeline import upload_device_data
from triplegan_tpu.parallel import mesh as pmesh
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state
from triplegan_tpu.train.step import make_device_train_step


def _setup(cfg):
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    state = create_state(cfg, nets, opts)
    data = upload_device_data(tiny_data(cfg))
    return nets, opts, state, data


def test_device_step_runs_and_is_deterministic():
    cfg = tiny_config()
    nets, opts, state0, data = _setup(cfg)
    step = jax.jit(make_device_train_step(cfg, nets, opts, 16))

    def run():
        state = create_state(cfg, nets, opts)
        for _ in range(2):
            state, m = step(state, data)
        return state, m

    s1, m1 = run()
    s2, m2 = run()
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k, v in m1.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_device_step_advances_all_players():
    cfg = tiny_config()
    nets, opts, state, data = _setup(cfg)
    step = jax.jit(make_device_train_step(cfg, nets, opts, 16))
    state2, _ = step(state, data)
    for player in ("gen", "disc", "clf"):
        moved = any(
            float(jnp.max(jnp.abs(a - b))) > 0
            for a, b in zip(
                jax.tree.leaves(state.params[player]),
                jax.tree.leaves(state2.params[player]),
            )
        )
        assert moved, f"{player} did not move"


def test_device_step_on_mesh_replicated_output():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    cfg = tiny_config()
    cfg.batch_size = 16
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    mesh = pmesh.make_mesh(8)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.device_put(create_state(cfg, nets, opts), rep)
    data = upload_device_data(tiny_data(cfg), sharding=rep)
    step = pmesh.shard_device_train_step(
        make_device_train_step(cfg, nets, opts, 16, axis_name=pmesh.AXIS, n_shards=8),
        mesh,
    )
    state, metrics = step(state, data)
    # outputs must be replicated: every per-device shard of a param equal
    p0 = jax.tree.leaves(state.params["clf"])[0]
    shards = [np.asarray(s.data) for s in p0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_train_loop_device_mode(tmp_path):
    from triplegan_tpu.train.loop import train

    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.data_on_device = True
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == cfg.epochs * cfg.steps_per_epoch
    for k, v in result["metrics"].items():
        assert np.isfinite(v), f"{k} not finite"
