"""NaN/Inf-checking debug mode (SURVEY.md §5 "race detection / sanitizers").

The reference had no sanitizers; the TPU-native equivalent of running under a
checker is ``jax.experimental.checkify``: wrap the compiled train step so
every float op is instrumented, and surface the first NaN/Inf with its
source location instead of silently corrupting training.

Usage:
    step = checkify_step(make_train_step(...))   # debug runs only
    (state, metrics) = step(state, batch)        # raises on NaN/Inf

This is a debugging tool — the instrumented step is slower; production runs
use the plain step.
"""

from __future__ import annotations

from typing import Callable

from jax.experimental import checkify


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a (state, batch) -> (state, metrics) step with float checks.
    The returned callable raises ``checkify.JaxRuntimeError`` naming the
    first NaN/Inf-producing operation."""
    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def run(state, batch):
        err, out = checked(state, batch)
        err.throw()
        return out

    return run
