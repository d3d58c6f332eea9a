"""End-to-end driver over an 8-fake-device mesh: the loop's mesh branch
(state replication, sharded batches, sharded eval) runs to completion."""

import numpy as np

from tests.helpers import tiny_config, tiny_data
from triplegan_tpu.train.loop import train


def test_train_loop_on_mesh(tmp_path):
    cfg = tiny_config()
    cfg.workdir = str(tmp_path)
    cfg.mesh_shape = (8,)
    cfg.batch_size = 16  # 2 per device
    cfg.epochs = 2
    cfg.steps_per_epoch = 2
    cfg.eval_every_epochs = 2
    cfg.ckpt_every_epochs = 2
    result = train(cfg, data=tiny_data(cfg), verbose=False)
    assert result["steps"] == 4
    assert 0.0 <= result["test_error"] <= 1.0
    for k, v in result["metrics"].items():
        assert np.isfinite(v), f"{k} not finite on mesh"
