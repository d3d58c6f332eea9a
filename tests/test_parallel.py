"""Multi-chip tests without a cluster (SURVEY.md §4.6): 8 fake CPU devices,
shard_map'd step == single-device step on the same global batch."""

import jax
import numpy as np
import pytest

from tests.helpers import deterministic_config, tiny_data
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.data.pipeline import BatchSampler
from triplegan_tpu.parallel import mesh as pmesh
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state
from triplegan_tpu.train.step import make_eval_step, make_train_step


def _allclose_trees(t1, t2, rtol=5e-4, atol=5e-4):
    """Tolerances sized for one Adam step under f32 reduction-order noise:
    pmean over 8 shards reorders float sums, and bias-corrected Adam's first
    step is ≈lr·sign(g), so a near-zero gradient component whose sign flips
    under reduction noise moves the parameter by up to 2·lr (observed
    ≈1.4e-4 abs max). The formerly-looser 2e-3 masked a real bug (the
    un-pmean'd REINFORCE baseline, ≈6e-4-2e-3 deltas); gradient-level
    equivalence is asserted tightly in test_c_adv_baseline_global_mean."""
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (fake) devices")
    return jax.devices()[:8]


def test_sharded_step_equals_single_device(eight_devices):
    cfg = deterministic_config()
    cfg.batch_size = 16  # 2 per device over 8
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes)

    # deterministic pseudo-labels so no per-shard sampling divergence
    single = jax.jit(
        make_train_step(cfg, nets, opts, 16, pseudo_label_mode="argmax")
    )
    state0 = create_state(cfg, nets, opts)
    s_single, m_single = single(state0, batch)

    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_train_step(
        make_train_step(
            cfg, nets, opts, 16, axis_name=pmesh.AXIS, pseudo_label_mode="argmax"
        ),
        mesh,
    )
    state0b = create_state(cfg, nets, opts)
    s_shard, m_shard = sharded(state0b, batch)

    _allclose_trees(s_single.params, s_shard.params)
    _allclose_trees(s_single.bn, s_shard.bn)
    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=1e-5, atol=1e-5
        )


def test_c_adv_baseline_global_mean(eight_devices):
    """Regression (round-3 review): the REINFORCE baseline must center the
    advantage by the GLOBAL batch mean under data parallelism — a local-shard
    mean makes the sharded C-adv gradient diverge from the single-device one
    (observed max component diff 0.017 before the fix). Gradients are
    compared directly (no Adam step in between), so the tolerance is tight."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from triplegan_tpu.train import losses

    n, k = 16, 10
    rng = np.random.RandomState(0)
    logit_d = np.asarray(rng.normal(size=(n,)), np.float32)
    logits_c = np.asarray(rng.normal(size=(n, k)), np.float32)
    y_c = np.asarray(rng.randint(0, k, size=(n,)), np.int32)

    def loss_single(lc):
        return losses.c_adversarial_loss(jax.numpy.asarray(logit_d), lc, y_c, 0.5)

    g_single = jax.grad(loss_single)(jax.numpy.asarray(logits_c))

    mesh = pmesh.make_mesh(8)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(pmesh.AXIS), P(pmesh.AXIS), P(pmesh.AXIS)),
        out_specs=P(pmesh.AXIS),
    )
    def grad_shard(ld, lc, yc):
        def local_loss(lc_):
            # per-shard mean of per-example terms; pmean makes it the global mean
            return jax.lax.pmean(
                losses.c_adversarial_loss(ld, lc_, yc, 0.5, axis_name=pmesh.AXIS),
                pmesh.AXIS,
            )

        return jax.grad(local_loss)(lc)

    g_shard = grad_shard(logit_d, logits_c, y_c)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_single), rtol=1e-5, atol=1e-6
    )


def test_sharded_share_pseudo_forward_equals_single_device(eight_devices):
    """The share_pseudo_forward variant composes a vjp-grafted classifier
    gradient with the pmean'd REINFORCE baseline — the grafted cotangent
    contribution must survive the gradient pmean exactly (pmean is linear,
    but this pins the implementation, incl. the trimmed c-stream batch)."""
    cfg = deterministic_config()
    cfg.batch_size = 16
    cfg.share_pseudo_forward = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes, skip_c_unlabeled=True)

    single = jax.jit(
        make_train_step(cfg, nets, opts, 16, pseudo_label_mode="argmax")
    )
    s_single, m_single = single(create_state(cfg, nets, opts), batch)

    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_train_step(
        make_train_step(
            cfg, nets, opts, 16, axis_name=pmesh.AXIS, pseudo_label_mode="argmax"
        ),
        mesh,
    )
    s_shard, m_shard = sharded(create_state(cfg, nets, opts), batch)

    _allclose_trees(s_single.params, s_shard.params)
    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=1e-5, atol=1e-5
        )


def test_sharded_eval_equals_single_device(eight_devices):
    cfg = deterministic_config()
    cfg.batch_size = 16
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    state = create_state(cfg, nets, opts)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    batch = next(iter(sampler.test_batches(16)))

    single = jax.jit(make_eval_step(cfg, nets))
    out1 = single(state, batch)

    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_eval_step(make_eval_step(cfg, nets, axis_name=pmesh.AXIS), mesh)
    out8 = sharded(state, batch)

    assert float(out1["correct"]) == float(out8["correct"])
    assert float(out1["count"]) == float(out8["count"])


def test_make_mesh_raises_on_insufficient_devices(eight_devices):
    """Regression (VERDICT r1 weak #5): make_mesh(n) must refuse to silently
    build a smaller mesh when fewer than n devices exist."""
    with pytest.raises(ValueError, match="requested 64 devices"):
        pmesh.make_mesh(64)


def test_driver_dryrun_multichip_in_process(eight_devices):
    """The driver's multichip gate, in-process (conftest already forces the
    CPU platform, so dryrun_multichip takes the direct path — the subprocess
    re-exec path is exercised by running __graft_entry__ standalone)."""
    import importlib
    import pathlib
    import sys

    repo_root = str(pathlib.Path(__file__).resolve().parents[1])
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    g = importlib.import_module("__graft_entry__")
    g.dryrun_multichip(8)


def test_sharded_step_runs_with_stochastic_layers(eight_devices):
    """Full stochastic path (noise/dropout/sampled pseudo-labels) must still
    produce replicated (identical-across-devices) states and finite metrics."""
    from tests.helpers import tiny_config

    cfg = tiny_config()
    cfg.batch_size = 16
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.shard_train_step(
        make_train_step(cfg, nets, opts, 16, axis_name=pmesh.AXIS), mesh
    )
    state = create_state(cfg, nets, opts)
    for _ in range(2):
        state, metrics = sharded(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.step) == 2


def test_sharded_scan_chunk_equals_sharded_sequential(eight_devices):
    """The production multi-chip path — scan-chunked device-data step over
    the mesh — must compute the same trajectory as the same sharded step
    dispatched one-by-one."""
    from triplegan_tpu.data.pipeline import upload_device_data
    from triplegan_tpu.train.step import (
        make_device_train_step,
        make_scan_device_train_step,
    )

    cfg = deterministic_config()
    cfg.batch_size = 16
    cfg.data_on_device = True
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    mesh = pmesh.make_mesh(8)
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    data = upload_device_data(tiny_data(cfg), sharding=replicated)

    step = pmesh.shard_device_train_step(
        make_device_train_step(
            cfg, nets, opts, 16, axis_name=pmesh.AXIS, n_shards=8,
            pseudo_label_mode="argmax",
        ),
        mesh,
    )
    scan = pmesh.shard_device_train_step(
        make_scan_device_train_step(
            cfg, nets, opts, 16, 4, axis_name=pmesh.AXIS, n_shards=8,
            pseudo_label_mode="argmax",
        ),
        mesh,
    )

    s_seq = jax.device_put(create_state(cfg, nets, opts), replicated)
    for _ in range(4):
        s_seq, m_seq = step(s_seq, data)
    s_scan, m_scan = scan(jax.device_put(create_state(cfg, nets, opts), replicated), data)

    assert int(s_scan.step) == int(s_seq.step) == 4
    _allclose_trees(s_seq.params, s_scan.params)
    for k in m_seq:
        np.testing.assert_allclose(float(m_seq[k]), float(m_scan[k]), rtol=2e-3, atol=2e-3)
