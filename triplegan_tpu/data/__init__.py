"""Data subsystem (rebuild of the reference's ``Input_Pipeline/``).

Reference parity (SURVEY.md §2.1 #2–3): dataset prep (download → labeled
split → ZCA fit → serialized shards) and the runtime pipeline (parse →
normalize → augment → shuffle → batch → prefetch, with separate labeled /
unlabeled / test streams).

TPU-native redesign: shards are plain ``.npz`` arrays; the host side only
samples uint8 batches and double-buffers them onto the device
(``pipeline.py``); every math transform — rescale, ZCA whitening (a
D×D matmul on the MXU), random translate-crop, horizontal flip, one-hot —
runs **on device inside the compiled step** (``ondevice.py``).
"""

from triplegan_tpu.data.datasets import (
    SemiSupervisedData,
    load_dataset,
    synthetic_dataset,
    semi_split,
)
from triplegan_tpu.data.zca import ZCAStats, fit_zca
from triplegan_tpu.data import ondevice
from triplegan_tpu.data.pipeline import BatchSampler, device_prefetch

__all__ = [
    "SemiSupervisedData",
    "load_dataset",
    "synthetic_dataset",
    "semi_split",
    "ZCAStats",
    "fit_zca",
    "ondevice",
    "BatchSampler",
    "device_prefetch",
]
