"""Cross-checks between the MCMC log densities and the VI ELBO
(test_log_prob.jl semantics): under a delta-like variational posterior the
expected log likelihood collapses to the Poisson log likelihood the MCMC
path scores."""

import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.mcmc.log_prob import (gal_loglike, make_source_target,
                                          star_loglike)
from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.models.patches import make_patch_for_source
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.vi.elbo import elbo_likelihood
from celeste_jl_tpu.vi.init import catalog_init_source


def _delta_vp(ce, is_star):
    """vp whose variational posterior is (nearly) a point mass at ce."""
    vp = catalog_init_source(ce)
    vp[ids.is_star] = [1.0, 0.0] if is_star else [0.0, 1.0]
    vp[ids.flux_scale] = 1e-8
    vp[ids.color_var] = 1e-8
    # E[l] must equal the catalog fluxes: loc = log(flux) - scale/2 ~ log(flux)
    return vp


def _mcmc_th(ce, tgt, is_star):
    fluxes = ce.star_fluxes if is_star else ce.gal_fluxes
    th = [np.log(fluxes), np.array([0.5, 0.5])]
    if not is_star:
        th.append(np.array([ce.gal_frac_dev, ce.gal_axis_ratio,
                            ce.gal_angle, ce.gal_radius_px]))
    return jnp.asarray(np.concatenate(th))


def test_star_loglike_matches_delta_elbo():
    images = make_blank_images(H=40, W=40, sky_nmgy=0.1,
                               nelec_per_nmgy=1000.0)
    ce = sample_star(pos=(20.0, 20.0), r_flux=25.0)
    gen_images(images, [ce], seed=2)
    patch = make_patch_for_source(images, ce.pos, radius=8, tile_size=32)
    tgt = make_source_target(patch, image=images[0], entry_pos=ce.pos)

    ll_mcmc = float(star_loglike(_mcmc_th(ce, tgt, True), tgt))
    ll_elbo = float(elbo_likelihood(jnp.asarray(_delta_vp(ce, True)), patch))
    np.testing.assert_allclose(ll_elbo, ll_mcmc, rtol=1e-6)


def test_gal_loglike_matches_delta_elbo():
    images = make_blank_images(H=40, W=40, sky_nmgy=0.1,
                               nelec_per_nmgy=1000.0)
    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=30.0, gal_radius_px=1.5)
    gen_images(images, [ce], seed=3)
    patch = make_patch_for_source(images, ce.pos, radius=10, tile_size=32)
    tgt = make_source_target(patch, image=images[0], entry_pos=ce.pos)

    ll_mcmc = float(gal_loglike(_mcmc_th(ce, tgt, False), tgt))
    ll_elbo = float(elbo_likelihood(jnp.asarray(_delta_vp(ce, False)),
                                    patch))
    np.testing.assert_allclose(ll_elbo, ll_mcmc, rtol=1e-6)


def test_loglike_decreases_away_from_truth():
    images = make_blank_images(H=40, W=40, sky_nmgy=0.1,
                               nelec_per_nmgy=1000.0)
    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=30.0, gal_radius_px=1.5)
    gen_images(images, [ce], seed=3)
    patch = make_patch_for_source(images, ce.pos, radius=10, tile_size=32)
    tgt = make_source_target(patch, image=images[0], entry_pos=ce.pos)
    th = _mcmc_th(ce, tgt, False)
    base = float(gal_loglike(th, tgt))
    assert float(gal_loglike(th.at[10].set(3.0), tgt)) < base  # radius off
    assert float(gal_loglike(th.at[0:5].add(0.5), tgt)) < base  # flux off
