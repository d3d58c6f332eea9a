"""The three-player training state — one pytree for the whole system.

Reference parity (SURVEY.md §3.5): everything `tf.train.Saver` persisted —
the three players' variables, Adam slot variables, BN moving statistics, the
global step — lives in this single pytree, plus the explicit JAX RNG key the
TF runtime kept implicit. Checkpoint/resume round-trips the whole object
through orbax (``triplegan_tpu.ckpt``).
"""

from __future__ import annotations

from typing import Any, Dict

import chex
import jax
import jax.numpy as jnp


@chex.dataclass
class TrainState:
    params: Dict[str, Any]   # {"gen","disc","clf"} parameter pytrees
    bn: Dict[str, Any]       # {"gen","disc","clf"} batch-norm running stats
    opt: Dict[str, Any]      # {"gen","disc","clf"} optax optimizer states
    step: jax.Array          # int32 global step
    rng: jax.Array           # PRNG key for in-step stochasticity


def create_state(cfg, nets, optimizers, seed: int | None = None) -> TrainState:
    gen, disc, clf = nets

    # One jitted init: the whole state materializes as a single executable
    # instead of hundreds of small host→device ops (each of which pays full
    # dispatch latency — significant at CLI startup and on remote runtimes).
    @jax.jit
    def _init(root):
        kg, kd, kc, krun = jax.random.split(root, 4)
        pg, sg = gen.init(kg)
        pd, sd = disc.init(kd)
        pc, sc = clf.init(kc)
        params = {"gen": pg, "disc": pd, "clf": pc}
        bn = {"gen": sg, "disc": sd, "clf": sc}
        opt = {name: optimizers[name].init(params[name]) for name in params}
        return TrainState(
            params=params,
            bn=bn,
            opt=opt,
            step=jnp.zeros((), jnp.int32),
            rng=krun,
        )

    return _init(jax.random.PRNGKey(cfg.seed if seed is None else seed))


def param_count(state: TrainState) -> Dict[str, int]:
    return {
        k: sum(int(x.size) for x in jax.tree.leaves(state.params[k]))
        for k in state.params
    }
