"""Learning-rate and α_P schedules + the three per-player optimizers.

Reference parity (SURVEY.md §2.1 #9, Appendix A): three Adam optimizers
(β1 = 0.5), one per player with variable lists scoped to that player; linear
lr decay over the final epochs; the pseudo-discriminative weight α_P enabled
after a warm-up number of epochs.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import optax


def linear_decay_schedule(base_lr: float, decay_start: int, total_steps: int):
    """Constant lr, then linear decay to 0 over [decay_start, total_steps]."""

    def sched(count):
        frac = jnp.clip(
            (count - decay_start) / max(total_steps - decay_start, 1), 0.0, 1.0
        )
        return base_lr * (1.0 - frac)

    return sched


def alpha_p_schedule(alpha_p: float, warmup_steps: int, ramp_steps: int = 0):
    """R_P weight: 0 until warm-up completes, then a linear 0→α_P ramp over
    ``ramp_steps`` (SURVEY.md Appendix A: "enabled/ramped after a warm-up");
    ramp_steps=0 degenerates to the hard step gate."""

    def sched(step):
        if ramp_steps <= 0:
            return jnp.where(step >= warmup_steps, alpha_p, 0.0)
        frac = jnp.clip((step - warmup_steps) / ramp_steps, 0.0, 1.0)
        return alpha_p * frac

    return sched


def anneal_every_schedule(base_sched, factor: float, every_steps: int):
    """Multiplicative anneal stacked on another schedule: lr(t) =
    base(t) · factor^⌊t / every⌋ (SURVEY.md Appendix A: C's lr annealing)."""

    def sched(count):
        return base_sched(count) * jnp.power(factor, count // every_steps)

    return sched


def make_optimizers(cfg, total_steps: int) -> Dict[str, optax.GradientTransformation]:
    decay_start = int(cfg.lr_decay_start_frac * total_steps)

    def adam(lr, anneal_factor: float = 1.0, anneal_epochs: int = 0):
        sched = linear_decay_schedule(lr, decay_start, total_steps)
        if anneal_factor != 1.0 and anneal_epochs > 0:
            steps_per_epoch = max(total_steps // max(int(cfg.epochs), 1), 1)
            sched = anneal_every_schedule(
                sched, anneal_factor, anneal_epochs * steps_per_epoch
            )
        return optax.adam(
            learning_rate=sched,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
        )

    return {
        "gen": adam(cfg.lr_g),
        "disc": adam(cfg.lr_d),
        "clf": adam(
            cfg.lr_c,
            float(cfg.get("lr_c_anneal_factor", 1.0)),
            int(cfg.get("lr_c_anneal_epochs", 0)),
        ),
    }
