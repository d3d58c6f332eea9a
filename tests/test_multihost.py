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


def test_resolve_zca_non_coordinator_never_touches_cache(tmp_path, monkeypatch):
    """Review regression: under multi-host only the coordinator may read or
    write the run-dir zca cache (shared storage — a non-coordinator read
    could catch a torn mid-write file; a write would race). Non-coordinators
    recompute identical stats from the data."""
    from triplegan_tpu.data.datasets import synthetic_dataset
    from triplegan_tpu.train.loop import _resolve_zca

    cfg = type("C", (), {})()  # _resolve_zca only touches attribute access
    import ml_collections

    cfg = ml_collections.ConfigDict(
        {"zca": True, "data_dir": str(tmp_path / "nodata"), "dataset": "synthetic",
         "seed": 0}
    )
    data = synthetic_dataset(image_size=8, channels=1, num_classes=10,
                             num_labeled=20, seed=0)
    wd = str(tmp_path / "run")

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    stats = _resolve_zca(cfg, data, wd)
    assert stats is not None
    assert not os.path.exists(os.path.join(wd, "zca_stats.npz"))

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    stats0 = _resolve_zca(cfg, data, wd)
    cache = os.path.join(wd, "zca_stats.npz")
    assert os.path.exists(cache)
    np.testing.assert_allclose(stats.whiten, stats0.whiten)  # identical fit
    leftovers = [f for f in os.listdir(wd) if f.endswith(".tmp.npz")]
    assert leftovers == []  # atomic publish left no tmp files


_SUBPROCESS_MESH_GUARD = """
import jax
jax.config.update("jax_platforms", "cpu")
from triplegan_tpu.configs import get_config
cfg = get_config("mnist100")
cfg.dataset = "synthetic"
cfg.batch_size = 8
cfg.workdir = {wd!r}
cfg.multihost = True
cfg.multihost_coordinator = "localhost:{port}"
cfg.multihost_num_processes = 1
cfg.multihost_process_id = 0
cfg.mesh_shape = (2,)  # != jax.device_count() (= 1 here)
from triplegan_tpu.train.loop import train
try:
    train(cfg)
    print("NO_ERROR")
except ValueError as e:
    assert "span every pod device" in str(e), e
    print("GUARD_OK")
"""


_SUBPROCESS_2PROC = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])

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
cfg.multihost_num_processes = 2
cfg.multihost_process_id = pid
cfg.mesh_shape = (2,)  # one CPU device per process -> 2 global
cfg.scan_steps = 2     # production path: scan-chunked device-data over the cluster

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
import numpy as np
# checksum of the final replicated params: must be identical on both
# processes if the cross-process collectives really synchronized them
leaves = jax.tree.leaves(summary["state"].params)
csum = float(sum(np.float64(np.sum(np.asarray(l, np.float64))) for l in leaves))
print(f"RESULT pid={{pid}} steps={{summary['steps']}} csum={{csum:.10e}}", flush=True)
"""


def test_train_two_process_cluster_end_to_end(tmp_path):
    """THE multihost test: a real 2-process jax.distributed cluster (one
    CPU device per process, gloo collectives) runs the full train driver
    against one shared workdir. Exercises cross-process mesh construction,
    stage_global over non-addressable shardings, pmean/sync-BN collectives
    across processes, coordinator-only artifacts, and orbax's
    multi-process checkpoint commit. Both processes must finish with
    IDENTICAL final parameters."""
    port = 15300 + (os.getpid() % 1000)
    wd = str(tmp_path / "mh2")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # exactly one local CPU device per process
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SUBPROCESS_2PROC.format(wd=wd, port=port)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    results = {}
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[int(parts["pid"])] = parts
    assert results[0]["steps"] == results[1]["steps"] == "2"
    assert results[0]["csum"] == results[1]["csum"], results
    # coordinator-only artifacts, written exactly once
    run_dir = os.path.join(wd, "mnist100")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))


_SUBPROCESS_2PROC_DET = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])

from triplegan_tpu.configs.base import base_config

cfg = base_config()
cfg.name = "det2p"
cfg.dataset = "synthetic"
cfg.image_size = 16
cfg.channels = 3
cfg.num_classes = 10
cfg.num_labeled = 40
cfg.zca = False
cfg.aug_translate = 0
cfg.aug_flip = False
cfg.z_dim = 16
cfg.gen.widths = (32, 16)
cfg.disc.widths = (16, 16)
cfg.disc.strides = (1, 2)
cfg.disc.input_noise = 0.0
cfg.disc.input_dropout = 0.0
cfg.disc.block_dropout = 0.0
cfg.clf.conv_blocks = ((8, 8), (16,))
cfg.clf.tail = (16, 8)
cfg.clf.input_noise = 0.0
cfg.clf.block_dropout = 0.0
cfg.pseudo_label_mode = "argmax"
cfg.batch_size = 8
cfg.data_on_device = False
cfg.epochs = 1
cfg.steps_per_epoch = 2
cfg.log_every = 0
cfg.eval_every_epochs = 0
cfg.ckpt_every_epochs = 0
cfg.workdir = {wd!r}
cfg.multihost = True
cfg.multihost_coordinator = "localhost:{port}"
cfg.multihost_num_processes = 2
cfg.multihost_process_id = pid
cfg.mesh_shape = (2,)

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
if pid == 0:
    import numpy as np
    leaves = jax.tree.leaves(summary["state"].params)
    np.savez({out!r}, **{{f"p{{i}}": np.asarray(l) for i, l in enumerate(leaves)}})
print(f"DET2P_OK pid={{pid}}", flush=True)
"""


def test_two_process_trajectory_equals_single_device(tmp_path):
    """Cross-process analogue of test_parallel's headline equivalence: a
    deterministic config trained on a real 2-process cluster (host-pipeline
    path, identically-seeded samplers → same global batches) must produce
    the SAME parameters as the same config trained single-device in this
    process. Tolerances as in test_parallel (Adam under f32 reduction-order
    noise)."""
    port = 16300 + (os.getpid() % 1000)
    wd = str(tmp_path / "det2p")
    out_npz = str(tmp_path / "det2p_params.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SUBPROCESS_2PROC_DET.format(wd=wd, port=port, out=out_npz)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "DET2P_OK" in out

    # single-device reference, in-process (same cfg minus the cluster)
    from triplegan_tpu.configs.base import base_config
    from triplegan_tpu.train.loop import train

    cfg = base_config()
    cfg.name = "det1p"
    cfg.dataset = "synthetic"
    cfg.image_size = 16
    cfg.channels = 3
    cfg.num_classes = 10
    cfg.num_labeled = 40
    cfg.zca = False
    cfg.aug_translate = 0
    cfg.aug_flip = False
    cfg.z_dim = 16
    cfg.gen.widths = (32, 16)
    cfg.disc.widths = (16, 16)
    cfg.disc.strides = (1, 2)
    cfg.disc.input_noise = 0.0
    cfg.disc.input_dropout = 0.0
    cfg.disc.block_dropout = 0.0
    cfg.clf.conv_blocks = ((8, 8), (16,))
    cfg.clf.tail = (16, 8)
    cfg.clf.input_noise = 0.0
    cfg.clf.block_dropout = 0.0
    cfg.pseudo_label_mode = "argmax"
    cfg.batch_size = 8
    cfg.data_on_device = False
    cfg.epochs = 1
    cfg.steps_per_epoch = 2
    cfg.log_every = 0
    cfg.eval_every_epochs = 0
    cfg.ckpt_every_epochs = 0
    cfg.workdir = str(tmp_path / "det1p")
    summary = train(cfg, verbose=False)
    ref_leaves = jax.tree.leaves(summary["state"].params)

    got = np.load(out_npz)
    assert len(got.files) == len(ref_leaves)
    for i, ref in enumerate(ref_leaves):
        np.testing.assert_allclose(
            got[f"p{i}"], np.asarray(ref), rtol=5e-4, atol=5e-4,
            err_msg=f"leaf {i}",
        )


_SUBPROCESS_2PROC_RESUME = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
phase = sys.argv[2]  # "first" (2 epochs) or "second" (4 epochs, resumes)

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
cfg.epochs = 2 if phase == "first" else 4
cfg.zca = False
cfg.aug_translate = 0
cfg.aug_flip = False
cfg.log_every = 0
cfg.eval_every_epochs = 0
cfg.ckpt_every_epochs = 1
cfg.workdir = {wd!r}
cfg.multihost = True
cfg.multihost_coordinator = "localhost:{port}"
cfg.multihost_num_processes = 2
cfg.multihost_process_id = pid
cfg.mesh_shape = (2,)

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
print(f"RESUME_OK pid={{pid}} phase={{phase}} steps={{summary['steps']}}", flush=True)
"""


def _run_2proc(script_args, env, repo, timeout=560):
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script_args[0], str(pid), *script_args[1:]],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    return outs


def test_two_process_checkpoint_resume(tmp_path):
    """Pod failure-recovery: a 2-process cluster trains 4 steps and exits;
    a FRESH 2-process cluster on the same run dir must restore the orbax
    multi-process checkpoint and continue to 8 — both processes agreeing
    on the restored step."""
    port = 17300 + (os.getpid() % 1000)
    wd = str(tmp_path / "resume2p")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SUBPROCESS_2PROC_RESUME.format(wd=wd, port=port)

    outs = _run_2proc([script, "first"], env, repo)
    assert all("steps=4" in out for out, _ in outs)

    port2 = port + 1  # fresh coordinator for the second cluster
    script2 = _SUBPROCESS_2PROC_RESUME.format(wd=wd, port=port2)
    outs = _run_2proc([script2, "second"], env, repo)
    assert all("steps=8" in out for out, _ in outs)


def test_train_multihost_rejects_partial_mesh(tmp_path):
    """Review regression: multihost=True with a mesh that does not span
    every pod device must fail fast instead of silently running independent
    single-host trainings against one shared checkpoint dir."""
    port = 14300 + (os.getpid() % 1000)
    wd = str(tmp_path / "guard")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # exactly one CPU device in the child
    out = subprocess.run(
        [sys.executable, "-c",
         _SUBPROCESS_MESH_GUARD.format(wd=wd, port=port)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GUARD_OK" in out.stdout


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
cfg.mesh_shape = (8,)  # the guard requires the mesh to span every device

from triplegan_tpu.train.loop import train
summary = train(cfg)
assert summary["steps"] == 2, summary["steps"]
print("TRAIN_OK", summary["test_error"])
"""


def test_train_multihost_single_process_cluster(tmp_path):
    """End-to-end: cfg.multihost=True initializes the distributed runtime
    before any backend touch, the mesh spans the (8 fake-device) pod, and
    the run completes with coordinator-owned artifacts (this process IS the
    coordinator of a 1-process cluster)."""
    port = 13300 + (os.getpid() % 1000)
    wd = str(tmp_path / "mh")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
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
