"""FID metric (beyond-parity extra, eval/fid.py): the eigh-based Fréchet
distance against closed forms and sampled Gaussians, the chunked stats
driver, the classifier feature hook, and the CLI surface."""

import os

import numpy as np
import pytest

from triplegan_tpu.eval.fid import activation_stats, fid_score, frechet_distance


def test_frechet_identical_gaussians_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.normal(size=5)
    a = rng.normal(size=(5, 5))
    cov = a @ a.T + np.eye(5)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)


def test_frechet_univariate_closed_form():
    # 1-D: (mu1-mu2)^2 + (sqrt(v1) - sqrt(v2))^2
    got = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                           np.array([3.0]), np.array([[9.0]]))
    assert got == pytest.approx((1 - 3) ** 2 + (2 - 3) ** 2, rel=1e-12)


def test_frechet_diagonal_closed_form():
    # Commuting (diagonal) covariances: ||dmu||^2 + sum (sqrt a_i - sqrt b_i)^2
    mu1 = np.array([0.0, 1.0, -2.0])
    mu2 = np.array([1.0, 1.0, 0.0])
    a = np.array([1.0, 4.0, 9.0])
    b = np.array([4.0, 4.0, 1.0])
    want = float(np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(a) - np.sqrt(b)) ** 2))
    got = frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    assert got == pytest.approx(want, rel=1e-10)


def test_frechet_matches_sampled_gaussians():
    """Sampled stats from two known Gaussians land near the analytic value
    (the non-commuting general case, exercising the A@C2@A sqrtm path)."""
    rng = np.random.RandomState(1)
    d, n = 4, 200_000
    m1, m2 = rng.normal(size=d), rng.normal(size=d)
    l1, l2 = rng.normal(size=(d, d)) * 0.5, rng.normal(size=(d, d)) * 0.5
    c1, c2 = l1 @ l1.T + np.eye(d), l2 @ l2.T + np.eye(d)
    want = frechet_distance(m1, c1, m2, c2)
    xa = rng.multivariate_normal(m1, c1, size=n)
    xb = rng.multivariate_normal(m2, c2, size=n)
    got = frechet_distance(xa.mean(0), np.cov(xa, rowvar=False),
                           xb.mean(0), np.cov(xb, rowvar=False))
    assert got == pytest.approx(want, rel=0.05, abs=0.05)


def test_activation_stats_chunking_invariant():
    """Chunk size must not change the stats (ragged final chunk included)."""
    rng = np.random.RandomState(2)
    imgs = rng.normal(size=(37, 6)).astype(np.float32)
    fn = lambda x: np.asarray(x) * 2.0 + 1.0
    mu_a, cov_a = activation_stats(fn, imgs, batch_size=8)
    mu_b, cov_b = activation_stats(fn, imgs, batch_size=37)
    np.testing.assert_allclose(mu_a, mu_b, rtol=1e-12)
    np.testing.assert_allclose(cov_a, cov_b, rtol=1e-12)


def test_fid_score_separates_distributions():
    """FID(identical sets) == 0; shifted distribution scores higher than a
    same-distribution resample."""
    rng = np.random.RandomState(3)
    real = rng.normal(size=(500, 8)).astype(np.float32)
    resample = rng.normal(size=(500, 8)).astype(np.float32)
    shifted = (rng.normal(size=(500, 8)) + 3.0).astype(np.float32)
    ident = lambda x: np.asarray(x)
    assert fid_score(ident, real, real, batch_size=64) == pytest.approx(0.0, abs=1e-8)
    near = fid_score(ident, resample, real, batch_size=64)
    far = fid_score(ident, shifted, real, batch_size=64)
    assert far > near > 0


def test_classifier_return_features():
    """The GAP feature hook: feats shape = tail[-1] channels, and the
    returned logits are exactly head(feats)."""
    import jax
    import jax.numpy as jnp

    from tests.helpers import tiny_config
    from triplegan_tpu.configs.base import make_networks
    from triplegan_tpu.nn import layers as L

    cfg = tiny_config()
    _, _, clf = make_networks(cfg)
    params, st = clf.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, cfg.image_size, cfg.image_size, cfg.channels))
    (logits, feats), _ = clf.apply(params, st, x, train=False, return_features=True)
    logits2, _ = clf.apply(params, st, x, train=False)
    assert feats.shape == (4, clf.tail[-1])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(L.dense_apply(params["head"], feats)), np.asarray(logits),
        rtol=1e-6,
    )


def test_cli_fid_runs(tmp_path, capsys):
    """fid command end-to-end on a tiny synthetic run: builtin classifier
    features, ragged generation chunk, real-side cap."""
    from tests.test_cli import TINY
    from triplegan_tpu.cli import main

    wd = str(tmp_path / "fidcli")
    main(["train", "--config", "mnist100", "--workdir", wd, *TINY])
    capsys.readouterr()
    main([
        "fid", "--config", "mnist100", "--workdir", wd,
        "--n-samples", "30", "--n-real", "40", *TINY,
    ])
    out = capsys.readouterr().out
    assert "FID (classifier GAP features" in out
    fid_val = float(out.strip().rsplit(":", 1)[1])
    assert np.isfinite(fid_val) and fid_val >= 0


def test_cli_fid_stablehlo_scorer_roundtrip(tmp_path, capsys):
    """Full composition at the CLI: train → export the classifier →
    score FID with the exported artifact as the feature extractor."""
    from tests.test_cli import TINY
    from triplegan_tpu.cli import main

    wd = str(tmp_path / "fidshlo")
    main(["train", "--config", "mnist100", "--workdir", wd, *TINY])
    main([
        "export", "--config", "mnist100", "--workdir", wd,
        "--what", "classifier", "--batch-size", "8", *TINY,
    ])
    capsys.readouterr()
    main([
        "fid", "--config", "mnist100", "--workdir", wd,
        "--n-samples", "20", "--n-real", "24",
        "--scorer-path", os.path.join(wd, "mnist100", "export", "classify.stablehlo"),
        *TINY,
    ])
    out = capsys.readouterr().out
    assert "FID (external features" in out
    assert np.isfinite(float(out.strip().rsplit(":", 1)[1]))


def test_cli_fid_external_npz_scorer(tmp_path, capsys):
    """--scorer-path with an .npz linear extractor: both sets go through the
    raw-[-1,1] path, no whitening, finite result."""
    from tests.test_cli import TINY
    from triplegan_tpu.cli import main

    wd = str(tmp_path / "fidext")
    main(["train", "--config", "mnist100", "--workdir", wd, *TINY])
    rng = np.random.RandomState(0)
    w = rng.normal(size=(16 * 16 * 1, 12)).astype(np.float32)
    scorer = str(tmp_path / "feat.npz")
    np.savez(scorer, w=w)
    capsys.readouterr()
    main([
        "fid", "--config", "mnist100", "--workdir", wd,
        "--n-samples", "24", "--n-real", "24",
        "--scorer-path", scorer, *TINY,
    ])
    out = capsys.readouterr().out
    assert "FID (external features" in out
    assert np.isfinite(float(out.strip().rsplit(":", 1)[1]))
