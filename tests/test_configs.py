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


def test_save_merge_roundtrip_excludes_exec_keys(tmp_path):
    """merge_saved restores model/data semantics but never the execution
    environment: a run dir trained with mesh_shape=(8,) or use_pallas=True
    must stay evaluable on a 1-chip host with default execution settings."""
    from triplegan_tpu.configs.base import merge_saved, save_config

    src = get_config("mnist100")
    src.prng_impl = "rbg"
    src.gen.widths = (64, 32)
    src.mesh_shape = (8,)
    src.use_pallas = True
    src.workdir = "/somewhere/else"
    path = str(tmp_path / "config.json")
    save_config(src, path)

    dst = merge_saved(get_config("mnist100"), path)
    assert dst.prng_impl == "rbg"
    assert tuple(dst.gen.widths) == (64, 32)
    base = get_config("mnist100")
    assert tuple(dst.mesh_shape) == tuple(base.mesh_shape)
    assert dst.use_pallas == base.use_pallas
    assert dst.workdir == base.workdir


def test_merge_saved_tolerates_unknown_and_type_drift(tmp_path):
    """Old run dirs must stay loadable: unknown keys and values whose type
    no longer fits the current field are skipped, not fatal."""
    import json

    path = str(tmp_path / "config.json")
    with open(path, "w") as f:
        json.dump(
            {
                "batch_size": 64,                # valid → merged
                "removed_in_v2": True,           # unknown → skipped
                "gen": {"widths": 7},            # tuple field, non-iterable → skipped
                "dataset": ["not", "a", "str"],  # str field, list → skipped
            },
            f,
        )
    from triplegan_tpu.configs.base import merge_saved

    cfg = merge_saved(get_config("mnist100"), path)
    base = get_config("mnist100")
    assert cfg.batch_size == 64
    assert tuple(cfg.gen.widths) == tuple(base.gen.widths)
    assert cfg.dataset == base.dataset


def test_apply_runtime_is_unconditional():
    """apply_runtime must reset the global PRNG impl, not just set it —
    one in-process rbg run must not leak into the next threefry run."""
    from triplegan_tpu.configs.base import apply_runtime

    cfg = get_config("mnist100")
    try:
        cfg.prng_impl = "rbg"
        apply_runtime(cfg)
        assert jax.random.PRNGKey(0).shape == (4,)
        cfg.prng_impl = "threefry"
        apply_runtime(cfg)
        assert jax.random.PRNGKey(0).shape == (2,)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_stl10_mesh_divisibility():
    cfg = get_config("stl10")
    n = int(np.prod(cfg.mesh_shape))
    assert cfg.batch_size % n == 0
