"""NaN-check debug mode: clean steps pass; a poisoned batch raises with the
offending op named (SURVEY.md §5 sanitizer equivalent)."""

import numpy as np
import pytest

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.configs.base import make_networks
from triplegan_tpu.data.pipeline import BatchSampler
from triplegan_tpu.train.schedule import make_optimizers
from triplegan_tpu.train.state import create_state
from triplegan_tpu.train.step import make_train_step
from triplegan_tpu.utils.debug import checkify_step


def test_checkify_clean_step_passes():
    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    state = create_state(cfg, nets, opts)
    sampler = BatchSampler(tiny_data(cfg), cfg.batch_size, seed=0)
    step = checkify_step(make_train_step(cfg, nets, opts, 16))
    state2, metrics = step(state, sampler.next_triple(cfg.z_dim, cfg.num_classes))
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v))


def test_checkify_catches_poisoned_input():
    from jax.experimental import checkify as ck

    cfg = tiny_config()
    nets = make_networks(cfg)
    opts = make_optimizers(cfg, 16)
    state = create_state(cfg, nets, opts)
    sampler = BatchSampler(tiny_data(cfg), cfg.batch_size, seed=0)
    step = checkify_step(make_train_step(cfg, nets, opts, 16))
    batch = sampler.next_triple(cfg.z_dim, cfg.num_classes)
    batch["d"]["z"] = np.full_like(batch["d"]["z"], np.nan)
    with pytest.raises(ck.JaxRuntimeError):
        step(state, batch)
