"""Multi-host (pod-scale) support: stage_global's single-/multi-process
staging contract, jax.distributed init gating, coordinator-only logging,
and the end-to-end multihost=True train path (single-process cluster)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from triplegan_tpu.parallel import mesh as pmesh
from triplegan_tpu.utils.logging import MetricsLogger


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (fake) devices")
    return jax.devices()[:8]


def test_stage_global_matches_device_put(eight_devices):
    """Single-process equivalence: stage_global must land the same values
    under the same shardings as plain device_put — for a batch-sharded
    batch pytree and a replicated state-like pytree."""
    mesh = pmesh.make_mesh(8)
    batch_sh = pmesh.batch_sharding(mesh)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    rng = np.random.RandomState(0)
    batch = {
        "x": rng.randint(0, 256, size=(16, 4, 4, 3)).astype(np.uint8),
        "y": rng.randint(0, 10, size=(16,)).astype(np.int32),
    }
    staged = pmesh.stage_global(batch, batch_sh)
    direct = jax.tree.map(lambda a: jax.device_put(a, batch_sh), batch)
    for k in batch:
        assert staged[k].sharding == direct[k].sharding
        np.testing.assert_array_equal(np.asarray(staged[k]), np.asarray(direct[k]))

    state_like = {"w": rng.normal(size=(3, 5)).astype(np.float32),
                  "nested": {"b": np.float32(2.5)}}
    staged_r = pmesh.stage_global(state_like, repl)
    assert staged_r["w"].sharding == repl
    np.testing.assert_array_equal(np.asarray(staged_r["w"]), state_like["w"])
    np.testing.assert_array_equal(
        np.asarray(staged_r["nested"]["b"]), state_like["nested"]["b"]
    )


def test_is_coordinator_single_process():
    assert pmesh.is_coordinator() is True


def test_metrics_logger_disabled_writes_nothing(tmp_path):
    wd = str(tmp_path / "nolog")
    logger = MetricsLogger(wd, enabled=False)
    logger.scalars(0, {"a": 1.0})
    logger.image(0, "img", np.zeros((4, 4), np.uint8))
    logger.close()
    assert not os.path.exists(wd)


_SUBPROCESS_INIT = """
import jax
jax.config.update("jax_platforms", "cpu")
from triplegan_tpu.parallel import mesh as pmesh
pmesh.init_distributed("localhost:{port}", 1, 0)
assert jax.process_count() == 1, jax.process_count()
assert pmesh.is_coordinator()
pmesh.init_distributed("localhost:{port}", 1, 0)  # second call: warns, no crash
print("DIST_OK")
"""


def test_init_distributed_single_process_cluster():
    """jax.distributed.initialize with explicit single-process args (the
    CPU-cluster form of the pod auto-detect path), plus idempotent re-init.
    Subprocess keeps this test's runtime out of the shared pytest process."""
    port = 12300 + (os.getpid() % 1000)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_INIT.format(port=port)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DIST_OK" in out.stdout


_SUBPROCESS_TRAIN = """
import jax
jax.config.update("jax_platforms", "cpu")
from triplegan_tpu.configs import get_config

cfg = get_config("mnist100")
cfg.dataset = "synthetic"
cfg.image_size = 16
cfg.num_labeled = 40
cfg.z_dim = 16
cfg.gen.widths = (32, 16)
cfg.disc.widths = (16, 16)
cfg.disc.strides = (1, 2)
cfg.clf.conv_blocks = ((8, 8), (16,))
cfg.clf.tail = (16, 8)
cfg.batch_size = 8
cfg.steps_per_epoch = 2
cfg.epochs = 1
cfg.zca = False
cfg.aug_translate = 0
cfg.aug_flip = False
cfg.log_every = 1
cfg.workdir = {wd!r}
cfg.multihost = True
cfg.multihost_coordinator = "localhost:{port}"
cfg.multihost_num_processes = 1
cfg.multihost_process_id = 0

from triplegan_tpu.train.loop import train
summary = train(cfg)
assert summary["steps"] == 2, summary["steps"]
print("TRAIN_OK", summary["test_error"])
"""


def test_train_multihost_single_process_cluster(tmp_path):
    """End-to-end: cfg.multihost=True initializes the distributed runtime
    before any backend touch and the run completes with coordinator-owned
    artifacts (this process IS the coordinator of a 1-process cluster)."""
    port = 13300 + (os.getpid() % 1000)
    wd = str(tmp_path / "mh")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_TRAIN.format(wd=wd, port=port)],
        capture_output=True, text=True, timeout=560, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TRAIN_OK" in out.stdout
    run_dir = os.path.join(wd, "mnist100")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        assert len(f.readlines()) >= 1
