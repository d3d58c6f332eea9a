"""Shared test fixtures: a tiny config + synthetic data (no network, no real
datasets — SURVEY.md §4.5)."""

from __future__ import annotations

from triplegan_tpu.configs import base_config
from triplegan_tpu.data.datasets import synthetic_dataset


def tiny_config(**overrides):
    cfg = base_config()
    cfg.name = "tiny"
    cfg.dataset = "synthetic"
    cfg.image_size = 16
    cfg.channels = 3
    cfg.num_classes = 10
    cfg.num_labeled = 40
    cfg.zca = False
    cfg.aug_translate = 0
    cfg.aug_flip = False
    cfg.z_dim = 16
    cfg.gen.widths = (32, 16)
    cfg.disc.widths = (16, 16)
    cfg.disc.strides = (1, 2)
    cfg.disc.input_noise = 0.05
    cfg.clf.conv_blocks = ((8, 8), (16,))
    cfg.clf.tail = (16, 8)
    cfg.batch_size = 8
    cfg.bn_momentum = 0.8
    cfg.data_on_device = False  # host streaming by default in tests; the
                                # device-resident path has its own suite
    cfg.epochs = 4
    cfg.steps_per_epoch = 4
    cfg.alpha_p_warmup_epochs = 1
    cfg.log_every = 4
    cfg.eval_every_epochs = 2
    cfg.ckpt_every_epochs = 2
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


def deterministic_config(**overrides):
    """No stochastic layers → sharded step must equal single-device step."""
    cfg = tiny_config(**overrides)
    cfg.disc.input_noise = 0.0
    cfg.disc.input_dropout = 0.0
    cfg.disc.block_dropout = 0.0
    cfg.clf.input_noise = 0.0
    cfg.clf.block_dropout = 0.0
    return cfg


def tiny_data(cfg, n_train=64, n_test=32):
    return synthetic_dataset(
        image_size=cfg.image_size,
        channels=cfg.channels,
        num_classes=cfg.num_classes,
        n_train=n_train,
        n_test=n_test,
        num_labeled=cfg.num_labeled,
        seed=0,
    )
