"""Classifier test-error evaluation — the north-star parity metric
(SURVEY.md §3.4: CIFAR-10 4k-label test error within 0.3% of the reference)."""

from __future__ import annotations

from typing import Callable, Iterable


def evaluate_error(eval_step: Callable, state, test_batches: Iterable) -> float:
    """Run the (jitted, possibly shard_mapped) eval step over the test stream
    and return the error rate in [0, 1].

    Counters accumulate ON DEVICE across batches; the host fetches a single
    pair of scalars at the end — one device→host round-trip per evaluation
    instead of one per batch (host↔device syncs are the enemy on a TPU
    runtime, and catastrophically so over a tunneled dev chip).
    """
    correct = None
    count = None
    for batch in test_batches:
        out = eval_step(state, batch)
        correct = out["correct"] if correct is None else correct + out["correct"]
        count = out["count"] if count is None else count + out["count"]
    if count is None:
        return 1.0
    correct_f, count_f = float(correct), float(count)
    if count_f == 0:
        return 1.0
    return 1.0 - correct_f / count_f
