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
