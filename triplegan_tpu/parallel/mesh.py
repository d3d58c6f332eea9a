"""Mesh construction and shard_map wrappers for the three-player step.

Design (SURVEY.md §2.3, §5): the models are a few M params — they fit
per-chip many times over — so the right decomposition for a v5e-8 slice is
pure batch (data) parallelism:

  * params / optimizer / BN state: replicated (PartitionSpec()),
  * batches: sharded on axis 0 over the "data" mesh axis,
  * per-player gradients: ``lax.pmean`` over ICI before each Adam apply
    (inside ``make_train_step(axis_name="data")``),
  * batch-norm moments: ``lax.pmean`` over the same axis (sync-BN),

which makes the sharded step compute exactly the single-device global-batch
update — the property the fake-device CPU tests assert (SURVEY.md §4.6).

Multi-host (pod-scale) runs use the same decomposition: one process per
host, :func:`init_distributed` before any backend touch, and the SAME mesh
code — ``jax.devices()`` is the pod-global device list in multiprocess JAX,
so ``make_mesh(total_chips)`` spans hosts with collectives riding ICI.
Host-side data enters through :func:`stage_global` (every process holds the
same host array; each contributes only its addressable shards), host-side
outputs (logs, sample grids, config.json) are written by the coordinator
only, and orbax checkpointing is already multi-process-coordinated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "data"


def init_distributed(
    coordinator: str = "", num_processes: int = 0, process_id: int = -1
) -> None:
    """Initialize ``jax.distributed`` for a multi-host pod run.

    Must run before the first backend touch (``jax.devices()`` etc.). On
    TPU pods all three arguments auto-detect from the pod metadata — pass
    them only for CPU/GPU clusters or tests. Safe to call when already
    initialized (no-op with a warning rather than a crash, so a library
    caller that initialized earlier keeps working).
    """
    if jax.distributed.is_initialized():
        import warnings

        warnings.warn(
            "init_distributed: jax.distributed is already initialized — "
            "keeping the existing runtime",
            stacklevel=2,
        )
        return
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    """True on the process that owns host-side outputs (logs, grids,
    config.json). Always True in single-process runs."""
    return jax.process_index() == 0


def stage_global(tree, sharding: NamedSharding):
    """Host arrays → global ``jax.Array``s under ``sharding``, valid in both
    single- and multi-process runs.

    Contract: EVERY process passes the same (full, global) host array —
    true here because the host samplers are seeded identically on all
    processes — and each contributes only the shards its local devices
    own. Single-process this is equivalent to ``jax.device_put(a,
    sharding)``; multi-process ``device_put`` would reject non-addressable
    shardings, which is why this helper exists."""

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    return jax.tree.map(put, tree)


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"make_mesh: requested {n_devices} devices but only "
                    f"{len(devices)} are available — refusing to silently "
                    f"build a smaller mesh (a mesh_shape=({n_devices},) run "
                    "would otherwise train unsharded while logs claim "
                    f"{n_devices}-way data parallelism). Set "
                    "XLA_FLAGS=--xla_force_host_platform_device_count for "
                    "CPU testing, or lower cfg.mesh_shape."
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for host batches: split axis 0 across the data axis."""
    return NamedSharding(mesh, P(AXIS))


def shard_train_step(step_fn, mesh: Mesh):
    """Wrap a ``make_train_step(..., axis_name=AXIS)`` step in shard_map+jit.

    State is replicated in and out; the batch pytree is sharded on its
    leading axis. Outputs are provably replicated (grads/metrics are pmean'd,
    BN moments are synced), so out_specs=P() typechecks under shard_map's
    replication checker.
    """
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=0)


def shard_device_train_step(step_fn, mesh: Mesh):
    """shard_map wrapper for ``make_device_train_step``: the HBM-resident
    dataset is replicated (P()) — each shard draws its own sub-batch inside
    the step with a per-shard RNG fold, so no batch sharding is needed."""
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # per-shard RNG sampling is intentionally divergent
    )
    return jax.jit(mapped, donate_argnums=0)


def shard_eval_step(eval_fn, mesh: Mesh):
    mapped = jax.shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=P(),
    )
    return jax.jit(mapped)
