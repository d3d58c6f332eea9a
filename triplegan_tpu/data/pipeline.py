"""Host-side batch sampling + double-buffered device feeding.

Reference parity (SURVEY.md §2.1 #3): the reference's tf.data pipeline
shuffles, batches, and prefetches separate labeled / unlabeled / test
streams. TPU-native redesign: the host does *only* index sampling over
in-memory uint8 arrays (these datasets are ≤150 MB) and asynchronously
stages the next batch onto the device while the current step runs — the
"double-buffered device feeding" of the north star [B]. All math happens on
device (see ``ondevice.py``).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from triplegan_tpu.data.datasets import SemiSupervisedData


class BatchSampler:
    """Infinite sampler of {x_l, y_l, x_u} uint8 batches.

    Epoch-shuffled without replacement per stream, reshuffling independently
    when a stream is exhausted (the labeled stream is much shorter than the
    unlabeled one, so streams cycle at different rates — same semantics as
    the reference's independent shuffled repeat() datasets).
    """

    def __init__(self, data: SemiSupervisedData, batch_size: int, seed: int = 0):
        self.data = data
        self.batch_size = batch_size
        self._rng = np.random.RandomState(seed)
        self._label_order = self._reshuffle(len(data.x_label))
        self._unlabel_order = self._reshuffle(len(data.x_unlabel))
        self._label_pos = 0
        self._unlabel_pos = 0

    def _reshuffle(self, n: int) -> np.ndarray:
        return self._rng.permutation(n)

    def _take(self, order: np.ndarray, pos: int, n_total: int):
        b = self.batch_size
        if b > n_total:  # stream smaller than a batch: sample with replacement
            return self._rng.randint(0, n_total, size=b), order, pos
        if pos + b <= len(order):
            idx = order[pos : pos + b]
            return idx, order, pos + b
        # wrap: top up from a fresh shuffle
        head = order[pos:]
        order = self._reshuffle(n_total)
        need = b - len(head)
        idx = np.concatenate([head, order[:need]])
        return idx, order, need

    def next(self, with_unlabeled: bool = True) -> Dict[str, np.ndarray]:
        from triplegan_tpu.data.native import gather_rows

        idx_l, self._label_order, self._label_pos = self._take(
            self._label_order, self._label_pos, len(self.data.x_label)
        )
        # Image gathers go through the native threaded assembler
        # (csrc/batch_gather.cpp) when available; numpy otherwise.
        out = {
            "x_l": gather_rows(self.data.x_label, idx_l),
            "y_l": self.data.y_label[idx_l],
        }
        if with_unlabeled:
            idx_u, self._unlabel_order, self._unlabel_pos = self._take(
                self._unlabel_order, self._unlabel_pos, len(self.data.x_unlabel)
            )
            out["x_u"] = gather_rows(self.data.x_unlabel, idx_u)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.next()

    def next_triple(
        self, z_dim: int, num_classes: int, skip_c_unlabeled: bool = False
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """One iteration's worth of inputs for the sequential D → G → C update.

        The reference's three alternating ``sess.run``s each pull a FRESH
        batch from the tf.data iterators and re-evaluate the noise tensors
        (SURVEY.md §3.2) — so D, G, and C see independent data/noise within
        one iteration. We reproduce that with per-player sub-batches; z and
        the generator's condition labels y_g are drawn on host so they shard
        across a device mesh exactly like the data.

        ``skip_c_unlabeled``: under ``share_pseudo_forward`` the C update
        aliases D's unlabeled batch, so the C stream's x_u would be gathered
        and shipped over H2D only to be discarded — skip the draw (the
        unlabeled epoch stream then advances once per iteration, matching its
        actual consumption).
        """
        b = self.batch_size

        def noise():
            return {
                "z": self._rng.normal(0, 1, size=(b, z_dim)).astype(np.float32),
                "y_g": self._rng.randint(0, num_classes, size=(b,)).astype(np.int32),
            }

        d = self.next(); d.update(noise())
        c = self.next(with_unlabeled=not skip_c_unlabeled); c.update(noise())
        return {"d": d, "g": noise(), "c": c}

    def triple_iter(self, z_dim: int, num_classes: int, skip_c_unlabeled: bool = False):
        while True:
            yield self.next_triple(z_dim, num_classes, skip_c_unlabeled)

    def test_batches(self, batch_size: Optional[int] = None):
        """Fixed-shape test batches; the last one is padded and carries a mask."""
        b = batch_size or self.batch_size
        x, y = self.data.x_test, self.data.y_test
        n = len(x)
        for start in range(0, n, b):
            xe, ye = x[start : start + b], y[start : start + b]
            valid = len(xe)
            if valid < b:  # pad to static shape so jit does not recompile
                pad = b - valid
                xe = np.concatenate([xe, np.repeat(xe[-1:], pad, axis=0)])
                ye = np.concatenate([ye, np.repeat(ye[-1:], pad, axis=0)])
            mask = np.zeros((b,), np.float32)
            mask[:valid] = 1.0
            yield {"x": xe, "y": ye, "mask": mask}


def upload_device_data(data: SemiSupervisedData, sharding=None):
    """Stage the full training set into device HBM once (uint8 — CIFAR-10 is
    37 MB). Used with ``make_device_train_step`` for a zero-transfer hot
    loop. With a mesh sharding (replicated spec), lands on every device;
    under multi-host the staging goes through ``stage_global`` (every
    process loads the same dataset and contributes its local shards)."""
    arrays = {
        "x_l": data.x_label,
        "y_l": data.y_label,
        "x_u": data.x_unlabel,
    }
    if sharding is not None:
        if jax.process_count() > 1:
            from triplegan_tpu.parallel.mesh import stage_global

            return stage_global(arrays, sharding)
        return {k: jax.device_put(v, sharding) for k, v in arrays.items()}
    return {k: jax.device_put(v) for k, v in arrays.items()}


def device_prefetch(
    iterator: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    depth: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Stage up to `depth` batches onto the device ahead of consumption.

    ``jax.device_put`` is asynchronous, so keeping `depth` batches in flight
    overlaps host→device DMA with the running step — the double-buffering of
    the north star [B]. With a ``Sharding``, each batch lands already sharded
    across the mesh's data axis. Under multi-host every process's iterator
    yields the SAME global batch (samplers are seeded identically) and
    ``stage_global`` takes each host's addressable slice.
    """
    import collections

    buf = collections.deque()
    multihost = jax.process_count() > 1
    if multihost and sharding is not None:
        from triplegan_tpu.parallel.mesh import stage_global

    def put(batch):
        if sharding is not None:
            if multihost:
                return stage_global(batch, sharding)
            return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
