"""Checkpoint/resume round-trip (SURVEY.md §4.7, §3.5): full TrainState —
params ×3, Adam slots ×3, BN stats, step, RNG key — through orbax."""

import jax
import numpy as np

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.ckpt import CheckpointManager
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.data.pipeline import BatchSampler
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state
from triplegan_tpu.train.step import make_train_step


def test_state_roundtrip(tmp_path):
    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    state = create_state(cfg, nets, opts)
    data = tiny_data(cfg)
    sampler = BatchSampler(data, cfg.batch_size, seed=0)
    step = jax.jit(make_train_step(cfg, nets, opts, 16))
    for _ in range(3):
        state, _ = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))

    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mngr.save(int(state.step), state)
    mngr.wait()

    template = create_state(cfg, nets, opts)
    restored = mngr.restore(template)
    assert restored is not None
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_resume_continues_identically(tmp_path):
    """Save at step 2, keep training to 4; restore at 2 and retrain to 4 —
    states must match exactly (the reference's Saver.restore contract)."""
    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    data = tiny_data(cfg)
    step = jax.jit(make_train_step(cfg, nets, opts, 16))

    def fresh_sampler():
        return BatchSampler(data, cfg.batch_size, seed=0)

    state = create_state(cfg, nets, opts)
    sampler = fresh_sampler()
    batches = [sampler.next_triple(cfg.z_dim, cfg.num_classes) for _ in range(4)]
    for b in batches[:2]:
        state, _ = step(state, b)
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(int(state.step), state)
    mngr.wait()
    for b in batches[2:]:
        state, _ = step(state, b)

    restored = mngr.restore(create_state(cfg, nets, opts))
    for b in batches[2:]:
        restored, _ = step(restored, b)

    for a, b_ in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    mngr.close()


def test_restore_none_when_empty(tmp_path):
    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    mngr = CheckpointManager(str(tmp_path / "empty"))
    assert mngr.restore(create_state(cfg, nets, opts)) is None
    mngr.close()


def test_torn_tmp_checkpoint_cleaned_and_ignored(tmp_path):
    """A SIGKILL mid-save leaves <step>.orbax-checkpoint-tmp debris (observed
    in the on-chip kill-resume rehearsal, DESIGN.md). A fresh manager must
    ignore it for restore AND purge it from disk."""
    import os

    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    d = tmp_path / "ckpt"
    mngr = CheckpointManager(str(d))
    state = create_state(cfg, nets, opts)
    mngr.save(2, state)
    mngr.close()

    torn = d / "3.orbax-checkpoint-tmp"
    torn.mkdir()
    (torn / "partial.bin").write_bytes(b"\x00" * 8)

    mngr2 = CheckpointManager(str(d))
    assert mngr2.latest_step() == 2
    restored = mngr2.restore(create_state(cfg, nets, opts))
    assert int(restored.step) == int(state.step)
    assert not torn.exists(), "torn tmp dir should be purged on open"
    mngr2.close()
