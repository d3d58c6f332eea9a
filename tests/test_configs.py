"""Config system tests (SURVEY.md §2.1 #1): every registry config builds
valid networks and a training state; display() dumps; CLI overrides."""

import jax
import numpy as np
import pytest

from triplegan_tpu.cli import _apply_overrides
from triplegan_tpu.configs import REGISTRY, display, get_config, make_networks


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_config_builds_networks(name):
    cfg = get_config(name)
    gen, disc, clf = make_networks(cfg)
    # generator geometry must divide evenly down to its base size
    assert gen.base_size * (2 ** len(gen.widths)) == cfg.image_size
    assert len(disc.widths) == len(disc.strides)
    # init the (possibly large) params on CPU — shapes only, no training
    p, s = gen.init(jax.random.PRNGKey(0))
    assert "deconv_out" in p and "v" in p["deconv_out"]  # WN output layer
    p, _ = disc.init(jax.random.PRNGKey(0))
    assert all("v" in p[f"conv{i}"] for i in range(len(disc.widths)))  # WN convs
    p, _ = clf.init(jax.random.PRNGKey(0))
    assert "head" in p


def test_unknown_config_rejected():
    with pytest.raises(KeyError, match="unknown config"):
        get_config("nope")


def test_display_contains_fields():
    out = display(get_config("cifar10_4k"))
    assert "batch_size" in out and "alpha_p" in out and "gen.widths" in out


def test_override_scalar_and_nested():
    cfg = get_config("mnist100")
    _apply_overrides(cfg, ["batch_size=64", "disc.input_noise=0.3", "dataset=synthetic"])
    assert cfg.batch_size == 64
    assert cfg.disc.input_noise == 0.3
    assert cfg.dataset == "synthetic"


def test_override_tuple_value():
    cfg = get_config("mnist100")
    _apply_overrides(cfg, ["gen.widths=(64, 32)", "mesh_shape=(8,)"])
    assert tuple(cfg.gen.widths) == (64, 32)
    assert tuple(cfg.mesh_shape) == (8,)


def test_override_unknown_key_exits():
    cfg = get_config("mnist100")
    with pytest.raises(SystemExit, match="unknown config key"):
        _apply_overrides(cfg, ["bogus=1"])
    with pytest.raises(SystemExit, match="unknown config key"):
        _apply_overrides(cfg, ["disc.bogus=1"])
    with pytest.raises(SystemExit, match="no section"):
        _apply_overrides(cfg, ["nosection.x=1"])


def test_stl10_mesh_divisibility():
    cfg = get_config("stl10")
    n = int(np.prod(cfg.mesh_shape))
    assert cfg.batch_size % n == 0
