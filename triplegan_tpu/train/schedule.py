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


def alpha_p_schedule(alpha_p: float, warmup_steps: int):
    """R_P weight: 0 until warm-up completes, then α_P (step gate)."""

    def sched(step):
        return jnp.where(step >= warmup_steps, alpha_p, 0.0)

    return sched


def make_optimizers(cfg, total_steps: int) -> Dict[str, optax.GradientTransformation]:
    decay_start = int(cfg.lr_decay_start_frac * total_steps)

    def adam(lr):
        return optax.adam(
            learning_rate=linear_decay_schedule(lr, decay_start, total_steps),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
        )

    return {"gen": adam(cfg.lr_g), "disc": adam(cfg.lr_d), "clf": adam(cfg.lr_c)}
