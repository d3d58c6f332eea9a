"""Checkpoint/resume (rebuild of the reference's ``tf.train.Saver`` wiring,
SURVEY.md §2.1 #13, §3.5): the whole TrainState pytree — 3× params, 3× Adam
slots, BN stats, step, RNG key — round-trips through orbax."""

from triplegan_tpu.ckpt.manager import CheckpointManager

__all__ = ["CheckpointManager"]
