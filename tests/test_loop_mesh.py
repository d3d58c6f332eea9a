"""End-to-end driver over an 8-fake-device mesh: the loop's mesh branch
(state replication, sharded batches, sharded eval) runs to completion."""

import jax
import numpy as np

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.train.loop import train
import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end drive


def test_train_loop_on_mesh(tmp_path):
    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.mesh_shape = (8,)
    cfg.batch_size = 16  # 2 per device
    cfg.epochs = 2
    cfg.steps_per_epoch = 2
    cfg.eval_every_epochs = 2
    cfg.ckpt_every_epochs = 2
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 4
    assert 0.0 <= result["test_error"] <= 1.0
    for k, v in result["metrics"].items():
        assert np.isfinite(v), f"{k} not finite on mesh"


def _topo_cfg(workdir, mesh, epochs):
    cfg = tiny_config()
    cfg.workdir = str(workdir)
    cfg.mesh_shape = mesh
    cfg.batch_size = 16  # divisible by both mesh sizes
    cfg.epochs = epochs
    cfg.steps_per_epoch = 2
    cfg.eval_every_epochs = 0
    cfg.ckpt_every_epochs = 1
    return cfg


def _leaves(state):
    return [np.asarray(x, np.float32) for x in jax.tree.leaves(state.params)]


def test_cross_topology_restore_exact(tmp_path):
    """Production topology change (no reference equivalent — single-GPU
    Saver checkpoints): a checkpoint written on ONE device restores
    BITWISE on an 8-device mesh and vice versa — the state is replicated
    under data parallelism and restore goes through the CURRENT template's
    shardings (ckpt/manager.py:57). Resuming with no epochs left isolates
    the restore itself (the loop runs zero steps)."""
    for src_mesh, dst_mesh in [((1,), (8,)), ((8,), (1,))]:
        wd = tmp_path / f"m{src_mesh[0]}to{dst_mesh[0]}"
        first = train(
            _topo_cfg(wd, src_mesh, 2), data=tiny_data(tiny_config()),
            verbose=False,
        )
        resumed = train(
            _topo_cfg(wd, dst_mesh, 2), data=tiny_data(tiny_config()),
            verbose=False,
        )
        assert resumed["steps"] == first["steps"] == 4
        for a, b in zip(_leaves(first["state"]), _leaves(resumed["state"])):
            np.testing.assert_array_equal(a, b)


def test_cross_topology_resume_continues_equivalently(tmp_path):
    """Continue the SAME checkpoint once on one device and once on the
    8-device mesh: both resumes draw the same seed+step-keyed stream over
    the same global batches, so final params agree up to reduction-order
    drift (sync-BN psum / grad pmean reassociation, amplified at most
    ~lr/step by Adam's normalization — NOT bitwise; the bitwise claims
    live in test_ckpt.py and the exact-restore test above)."""
    import shutil

    wd1 = tmp_path / "a"
    train(_topo_cfg(wd1, (1,), 2), data=tiny_data(tiny_config()), verbose=False)
    wd8 = tmp_path / "b"
    shutil.copytree(wd1, wd8)
    done1 = train(
        _topo_cfg(wd1, (1,), 4), data=tiny_data(tiny_config()), verbose=False
    )
    done8 = train(
        _topo_cfg(wd8, (8,), 4), data=tiny_data(tiny_config()), verbose=False
    )
    assert done1["steps"] == done8["steps"] == 8
    for a, b in zip(_leaves(done1["state"]), _leaves(done8["state"])):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)
