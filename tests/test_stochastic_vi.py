"""StochasticVI tests: pixel-minibatch SVI approaches the Newton optimum."""

import jax
import numpy as np
import pytest

from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.models.patches import make_patch_for_source, stack_patches
from celeste_jl_tpu.synthetic import gen_images, make_blank_images, sample_star
from celeste_jl_tpu.vi.init import generic_init_source
from celeste_jl_tpu.vi.optimize import fit_sources
from celeste_jl_tpu.vi.stochastic import SVIConfig, fit_sources_svi


@pytest.fixture(scope="module")
def star_batch():
    images = make_blank_images(H=40, W=40)
    ces = [sample_star(pos=(20.0, 20.0), r_flux=30.0)]
    gen_images(images, ces, seed=3)
    patches = stack_patches([
        make_patch_for_source(images, ces[0].pos, radius=10, tile_size=32)])
    vp0s = np.stack([generic_init_source(ces[0].pos)])
    return vp0s, patches


def test_svi_recovers_flux_with_minibatch_pixels(star_batch):
    vp0s, patches = star_batch
    res = fit_sources_svi(jax.random.PRNGKey(0), vp0s, patches,
                          config=SVIConfig(steps=500, pixel_fraction=0.25))
    vp = np.asarray(res.vp[0])
    flux = np.exp(vp[ids.flux_loc[0]] + 0.5 * vp[ids.flux_scale[0]])
    assert abs(flux - 30.0) / 30.0 < 0.1, flux
    assert vp[ids.is_star[0]] > 0.7


def test_svi_full_pixels_matches_newton_elbo(star_batch):
    vp0s, patches = star_batch
    newton = fit_sources(vp0s, patches)
    svi = fit_sources_svi(jax.random.PRNGKey(1), vp0s, patches,
                          config=SVIConfig(steps=1500, pixel_fraction=1.0))
    # SVI should get within a few nats of the Newton optimum
    gap = float(newton.elbo[0] - svi.elbo[0])
    assert gap < 10.0, gap
    assert gap > -1.0  # Newton should not be (much) worse


def test_svi_trace_increases(star_batch):
    vp0s, patches = star_batch
    res = fit_sources_svi(jax.random.PRNGKey(2), vp0s, patches,
                          config=SVIConfig(steps=300, pixel_fraction=0.5))
    trace = np.asarray(res.elbo_trace[0])
    assert trace[-1] > trace[0]
    assert np.all(np.isfinite(trace))


def test_svi_first_class_through_infer_box():
    """SVI is a driver-level method: infer_box(method="svi") detects and
    fits end to end (the reference's StochasticVI.jl is an empty stub;
    here it is reachable like joint_vi/single_vi/mcmc)."""
    from celeste_jl_tpu.parallel.run import infer_box
    from celeste_jl_tpu.synthetic import sample_galaxy
    from celeste_jl_tpu.utils.config import Config

    images = make_blank_images(H=50, W=50, sky_nmgy=0.05,
                               nelec_per_nmgy=2000.0)
    truth = [sample_star(pos=(16.0, 16.0), r_flux=25.0),
             sample_galaxy(pos=(34.0, 34.0), r_flux=35.0,
                           gal_radius_px=2.0)]
    gen_images(images, truth, seed=5)
    results = infer_box(images, method="svi", config=Config(),
                        thresh=6.0, boxsize=(50, 50), match_radius_deg=1.0)
    assert len(results) == 2
    by_star = sorted(results, key=lambda r: -r.vs[ids.is_star[0]])
    assert by_star[0].vs[ids.is_star[0]] > 0.5     # the star
    assert by_star[1].vs[ids.is_star[0]] < 0.5     # the galaxy
    for r in results:
        assert np.isfinite(r.elbo)
        assert r.converged
