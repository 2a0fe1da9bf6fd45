"""Prior fitting (cfg/gen_priors.jl equivalent): the EM color GMM recovers a
known mixture, lognormal moment fits recover truth, and the saved npz
artifact round-trips through the priors loader schema."""

import numpy as np
import pytest

from celeste_jl_tpu.models.fit_priors import (colors_from_fluxes,
                                              fit_color_gmm, fit_lognormal,
                                              fit_prior, mag_to_nmgy,
                                              save_prior)


def _sample_gmm(rng, n, weights, means, covs):
    comps = rng.choice(len(weights), size=n, p=weights)
    return np.stack([rng.multivariate_normal(means[c], covs[c])
                     for c in comps])


def test_em_recovers_two_component_mixture():
    rng = np.random.default_rng(0)
    means = np.array([[0.0, 0.0, 0.0, 0.0], [3.0, -2.0, 1.0, 2.0]])
    covs = np.array([np.eye(4) * 0.2, np.eye(4) * 0.5])
    x = _sample_gmm(rng, 4000, [0.3, 0.7], means, covs)
    w, mu, cov = fit_color_gmm(x, K=2, iters=150, seed=1)
    order = np.argsort(mu[:, 0])
    np.testing.assert_allclose(np.sort(w), [0.3, 0.7], atol=0.03)
    np.testing.assert_allclose(mu[order], means, atol=0.1)
    np.testing.assert_allclose(cov[0, 0, order], [0.2, 0.5], atol=0.08)


def test_lognormal_moments():
    rng = np.random.default_rng(1)
    x = np.exp(rng.normal(1.3, 0.6, 20000))
    loc, var = fit_lognormal(x)
    assert abs(loc - 1.3) < 0.02
    assert abs(var - 0.36) < 0.02


def test_mag_flux_and_colors():
    np.testing.assert_allclose(mag_to_nmgy(22.5), 1.0)
    np.testing.assert_allclose(mag_to_nmgy(20.0), 10.0 ** 1.0)
    f = np.array([[1.0, 2.0, 4.0, 8.0, 16.0]])
    np.testing.assert_allclose(colors_from_fluxes(f)[0], np.log(2.0))


def test_fit_prior_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    lnr = rng.normal(1.5, 0.8, (800, 1))
    colors = rng.normal(0.6, 0.3, (800, 4))
    lnf = np.cumsum(np.concatenate(
        [np.zeros((800, 1)), colors], axis=1), axis=1) + lnr
    star_fluxes = np.exp(lnf - lnf[:, 2:3] + lnr)
    gal_fluxes = star_fluxes * 1.5
    p = fit_prior(star_fluxes, gal_fluxes,
                  gal_radius_px=np.exp(rng.normal(0.5, 0.9, 800)),
                  K=3, iters=60)
    assert p.k.shape == (3, 2)
    assert p.color_mean.shape == (4, 3, 2)
    assert p.color_cov.shape == (4, 4, 3, 2)
    np.testing.assert_allclose(p.k.sum(0), [1.0, 1.0], rtol=1e-6)
    assert abs(p.flux_mean[0] - 1.5) < 0.1
    assert abs(p.gal_radius_px_mean - 0.5) < 0.1

    # artifact matches the priors.npz schema
    path = str(tmp_path / "priors.npz")
    save_prior(path, p)
    d = np.load(path)
    np.testing.assert_allclose(d["star_prior_weights"], p.k[:, 0])
    np.testing.assert_allclose(d["gal_prior_covs"], p.color_cov[:, :, :, 1])
    assert d["star_prior_means"].shape == (4, 3)
