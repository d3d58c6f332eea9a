"""Multi-host (pod-scale) support: stage_global's single-/multi-process
staging contract, jax.distributed init gating, coordinator-only logging,
and the end-to-end multihost=True train paths — including REAL 2-process
jax.distributed clusters (one CPU device per process, gloo collectives)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from triplegan_tpu.parallel import mesh as pmesh
from triplegan_tpu.utils.logging import MetricsLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


# ---------------------------------------------------------------------------
# Shared cluster-test machinery
# ---------------------------------------------------------------------------

def _cluster_env(n_local_devices=1):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if n_local_devices > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local_devices}"
        )
    else:
        env.pop("XLA_FLAGS", None)  # exactly one CPU device per process
    return env


def _run_2proc(script, extra_args, tmp_dir, timeout=560):
    """Launch the 2-process cluster. Child output goes to files (no pipe
    backpressure between live peers); on ANY failure or timeout both
    processes are killed so a hung peer can't orphan and contend for the
    core (the orphaned-child failure mode CLAUDE.md warns about)."""
    env = _cluster_env()
    procs, logs = [], []
    for pid in (0, 1):
        log = open(os.path.join(tmp_dir, f"proc{pid}.log"), "w+")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(pid), *extra_args],
            stdout=log, stderr=subprocess.STDOUT, text=True, env=env, cwd=REPO,
        ))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for p, log in zip(procs, logs):
        log.seek(0)
        text = log.read()
        log.close()
        assert p.returncode == 0, text[-3000:]
        outs.append(text)
    return outs


# Tiny-net overrides shared by every cluster script AND the in-process
# single-device reference — ONE source of truth so the equivalence test's
# two sides cannot drift (dotted keys address nested sections).
TINY_NET_OVERRIDES = {
    "dataset": "synthetic",
    "image_size": 16,
    "num_labeled": 40,
    "z_dim": 16,
    "gen.widths": (32, 16),
    "disc.widths": (16, 16),
    "disc.strides": (1, 2),
    "clf.conv_blocks": ((8, 8), (16,)),
    "clf.tail": (16, 8),
    "batch_size": 8,
    "steps_per_epoch": 2,
    "zca": False,
    "aug_translate": 0,
    "aug_flip": False,
}

# Extra overrides that make the step fully deterministic (the equivalence
# test's requirement: no stochastic layers, argmax pseudo-labels).
DET_OVERRIDES = {
    **TINY_NET_OVERRIDES,
    "name": "det",
    "channels": 3,
    "num_classes": 10,
    "disc.input_noise": 0.0,
    "disc.input_dropout": 0.0,
    "disc.block_dropout": 0.0,
    "clf.input_noise": 0.0,
    "clf.block_dropout": 0.0,
    "pseudo_label_mode": "argmax",
    "data_on_device": False,
    "epochs": 1,
    "log_every": 0,
    "eval_every_epochs": 0,
    "ckpt_every_epochs": 0,
}


def apply_flat(cfg, overrides):
    """Apply {dotted.key: value} overrides to a ConfigDict."""
    for k, v in overrides.items():
        node = cfg
        *parents, leaf = k.split(".")
        for p in parents:
            node = node[p]
        node[leaf] = v
    return cfg


_CLUSTER_PRELUDE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])

from tests.test_multihost import TINY_NET_OVERRIDES, DET_OVERRIDES, apply_flat


def cluster_cfg(cfg, wd, port, overrides):
    apply_flat(cfg, overrides)
    cfg.workdir = wd
    cfg.multihost = True
    cfg.multihost_coordinator = "localhost:%d" % port
    cfg.multihost_num_processes = 2
    cfg.multihost_process_id = pid
    cfg.mesh_shape = (2,)  # one CPU device per process -> 2 global
    return cfg
"""


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
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_INIT.format(port=port)],
        capture_output=True, text=True, timeout=300, env=_cluster_env(),
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DIST_OK" in out.stdout


def test_resolve_zca_non_coordinator_never_touches_cache(tmp_path, monkeypatch):
    """Review regression: under multi-host only the coordinator may read or
    write the run-dir zca cache (shared storage — a non-coordinator read
    could catch a torn mid-write file; a write would race). Non-coordinators
    recompute identical stats from the data."""
    import ml_collections

    from triplegan_tpu.data.datasets import synthetic_dataset
    from triplegan_tpu.train.loop import _resolve_zca

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


def test_train_multihost_rejects_partial_mesh(tmp_path):
    """Review regression: multihost=True with a mesh that does not span
    every pod device must fail fast instead of silently running independent
    single-host trainings against one shared checkpoint dir."""
    port = 14300 + (os.getpid() % 1000)
    wd = str(tmp_path / "guard")
    out = subprocess.run(
        [sys.executable, "-c",
         _SUBPROCESS_MESH_GUARD.format(wd=wd, port=port)],
        capture_output=True, text=True, timeout=300, env=_cluster_env(),
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GUARD_OK" in out.stdout


_SUBPROCESS_2PROC = _CLUSTER_PRELUDE + """
from triplegan_tpu.configs import get_config

cfg = cluster_cfg(get_config("mnist100"), {wd!r}, {port}, TINY_NET_OVERRIDES)
cfg.epochs = 1
cfg.log_every = 1
cfg.scan_steps = 2  # production path: scan-chunked device-data over the cluster

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
import numpy as np
# checksum of the final replicated params: must be identical on both
# processes if the cross-process collectives really synchronized them
leaves = jax.tree.leaves(summary["state"].params)
csum = float(sum(np.float64(np.sum(np.asarray(l, np.float64))) for l in leaves))
print(f"RESULT pid={{pid}} steps={{summary['steps']}} csum={{csum:.10e}}", flush=True)
"""


@pytest.mark.slow  # multi-minute end-to-end drive
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
    outs = _run_2proc(
        _SUBPROCESS_2PROC.format(wd=wd, port=port), [], str(tmp_path)
    )
    results = {}
    for out in outs:
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


_SUBPROCESS_2PROC_DET = _CLUSTER_PRELUDE + """
from triplegan_tpu.configs.base import base_config

cfg = cluster_cfg(base_config(), {wd!r}, {port}, DET_OVERRIDES)

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
if pid == 0:
    import numpy as np
    leaves = jax.tree.leaves(summary["state"].params)
    np.savez({out!r}, **{{f"p{{i}}": np.asarray(l) for i, l in enumerate(leaves)}})
print(f"DET2P_OK pid={{pid}}", flush=True)
"""


@pytest.mark.slow  # multi-minute end-to-end drive
def test_two_process_trajectory_equals_single_device(tmp_path):
    """Cross-process analogue of test_parallel's headline equivalence: a
    deterministic config trained on a real 2-process cluster (host-pipeline
    path, identically-seeded samplers → same global batches) must produce
    the SAME parameters as the same config trained single-device in this
    process. Both sides build from the shared DET_OVERRIDES, so they cannot
    drift. Tolerances as in test_parallel (Adam under f32 reduction-order
    noise)."""
    port = 16300 + (os.getpid() % 1000)
    wd = str(tmp_path / "det2p")
    out_npz = str(tmp_path / "det2p_params.npz")
    outs = _run_2proc(
        _SUBPROCESS_2PROC_DET.format(wd=wd, port=port, out=out_npz),
        [], str(tmp_path),
    )
    for out in outs:
        assert "DET2P_OK" in out

    # single-device reference, in-process — same overrides, no cluster
    from triplegan_tpu.configs.base import base_config
    from triplegan_tpu.train.loop import train

    cfg = apply_flat(base_config(), DET_OVERRIDES)
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


_SUBPROCESS_2PROC_RESUME = _CLUSTER_PRELUDE + """
phase = sys.argv[2]  # "first" (2 epochs) or "second" (4 epochs, resumes)

from triplegan_tpu.configs import get_config

cfg = cluster_cfg(get_config("mnist100"), {wd!r}, {port}, TINY_NET_OVERRIDES)
cfg.epochs = 2 if phase == "first" else 4
cfg.log_every = 0
cfg.eval_every_epochs = 0
cfg.ckpt_every_epochs = 1

from triplegan_tpu.train.loop import train
summary = train(cfg, verbose=False)
print(f"RESUME_OK pid={{pid}} phase={{phase}} steps={{summary['steps']}}", flush=True)
"""


@pytest.mark.slow  # multi-minute end-to-end drive
def test_two_process_checkpoint_resume(tmp_path):
    """Pod failure-recovery: a 2-process cluster trains 4 steps and exits;
    a FRESH 2-process cluster on the same run dir must restore the orbax
    multi-process checkpoint and continue to 8 — both processes agreeing
    on the restored step."""
    port = 17300 + (os.getpid() % 1000)
    wd = str(tmp_path / "resume2p")

    outs = _run_2proc(
        _SUBPROCESS_2PROC_RESUME.format(wd=wd, port=port), ["first"],
        str(tmp_path),
    )
    assert all("steps=4" in out for out in outs)

    script2 = _SUBPROCESS_2PROC_RESUME.format(wd=wd, port=port + 1)
    outs = _run_2proc(script2, ["second"], str(tmp_path))
    assert all("steps=8" in out for out in outs)


_SUBPROCESS_TRAIN = """
import jax
jax.config.update("jax_platforms", "cpu")

from tests.test_multihost import TINY_NET_OVERRIDES, apply_flat
from triplegan_tpu.configs import get_config

cfg = apply_flat(get_config("mnist100"), TINY_NET_OVERRIDES)
cfg.epochs = 1
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


@pytest.mark.slow  # multi-minute end-to-end drive
def test_train_multihost_single_process_cluster(tmp_path):
    """End-to-end: cfg.multihost=True initializes the distributed runtime
    before any backend touch, the mesh spans the (8 fake-device) pod, and
    the run completes with coordinator-owned artifacts (this process IS the
    coordinator of a 1-process cluster)."""
    port = 13300 + (os.getpid() % 1000)
    wd = str(tmp_path / "mh")
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_TRAIN.format(wd=wd, port=port)],
        capture_output=True, text=True, timeout=560,
        env=_cluster_env(n_local_devices=8), cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TRAIN_OK" in out.stdout
    run_dir = os.path.join(wd, "mnist100")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        assert len(f.readlines()) >= 1


_SUBPROCESS_2PROC_PREEMPT = _CLUSTER_PRELUDE + """
from triplegan_tpu.configs import get_config

cfg = cluster_cfg(get_config("mnist100"), {wd!r}, {port}, TINY_NET_OVERRIDES)
cfg.epochs = 4
cfg.log_every = 0
cfg.eval_every_epochs = 1
cfg.ckpt_every_epochs = 0

import signal
import triplegan_tpu.train.loop as loop_mod

if pid == 0:
    # Deliver SIGTERM to THIS PROCESS ONLY, right after the epoch-1
    # collective eval — the ADVICE r3 #1 scenario: without the cross-process
    # stop sync, process 0 would enter the collective preempt save while
    # process 1 dispatches step 3, deadlocking the cluster until the
    # harness timeout kills both.
    real_eval = loop_mod.evaluate_error
    fired = []

    def eval_then_sigterm(*a, **k):
        out = real_eval(*a, **k)
        if not fired:
            fired.append(True)
            signal.raise_signal(signal.SIGTERM)
        return out

    loop_mod.evaluate_error = eval_then_sigterm

summary = loop_mod.train(cfg, verbose=False)
print(f"PREEMPT pid={{pid}} steps={{summary['steps']}} "
      f"preempted={{summary['preempted']}}", flush=True)
"""


@pytest.mark.slow  # multi-minute end-to-end drive
def test_two_process_single_signal_preemption(tmp_path):
    """VERDICT r3 next-step #8 / ADVICE r3 #1: SIGTERM delivered to ONLY
    ONE process of a 2-process cluster must stop BOTH processes together at
    the same iteration (the stop bit is all-gathered at dispatch
    boundaries) and commit one collective preempt checkpoint — not deadlock
    the un-signalled peer inside its next collective dispatch."""
    port = 18300 + (os.getpid() % 1000)
    wd = str(tmp_path / "preempt2p")
    outs = _run_2proc(
        _SUBPROCESS_2PROC_PREEMPT.format(wd=wd, port=port), [], str(tmp_path)
    )
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("PREEMPT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        assert parts["preempted"] == "True", out[-2000:]
        assert parts["steps"] == "2", out[-2000:]
    # the collective preempt checkpoint committed exactly once, at step 2
    ckpt_dir = os.path.join(wd, "mnist100", "ckpt")
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps == ["2"], steps
