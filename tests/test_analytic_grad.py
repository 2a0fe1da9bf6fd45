"""The analytic fg evaluator (grad_mode="analytic": closed-form gradient
via degree-<=2 pixel moments, vi/optimize._analytic_lik_value_grad) must
match jax.value_and_grad through the render to f64 roundoff, with and
without neighbor background images, and full fits under it must land the
same optimum as the AD evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.models.patches import make_patch_for_source, stack_patches
from celeste_jl_tpu.ops import bijectors
from celeste_jl_tpu.ops.newton import NewtonConfig
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.vi.elbo import elbo_likelihood, subtract_kl
from celeste_jl_tpu.vi.init import catalog_init_source, generic_init_source
from celeste_jl_tpu.vi.optimize import (_analytic_lik_value_grad,
                                        _make_bounds, maximize)


def _setup(ce, seed=11):
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=seed)
    patch = make_patch_for_source(images, ce.pos, radius=10, tile_size=32)
    return jax.tree.map(lambda x: x[0], stack_patches([patch]))


@pytest.mark.parametrize("make_ce,with_bg", [
    (lambda: sample_star(pos=(20.0, 20.0), r_flux=40.0), False),
    (lambda: sample_galaxy(pos=(20.0, 19.0), r_flux=25.0,
                           gal_radius_px=2.5), False),
    (lambda: sample_star(pos=(20.0, 20.0), r_flux=40.0), True),
])
def test_analytic_grad_matches_ad(make_ce, with_bg):
    ce = make_ce()
    patch = _setup(ce)
    bg_E = 0.3 * patch.sky if with_bg else None
    bg_V = 0.05 * patch.sky if with_bg else None

    vp0 = jnp.asarray(catalog_init_source(ce))
    bounds = _make_bounds(vp0[0:2])
    free0 = bijectors.to_free(bijectors.enforce(vp0, bounds), bounds)

    def lik_ad(free):
        return elbo_likelihood(bijectors.to_bound(free, bounds), patch,
                               bg_E_G=bg_E, bg_var_G=bg_V)

    fg_ad = jax.jit(jax.value_and_grad(lik_ad))
    fg_an = jax.jit(lambda fr: _analytic_lik_value_grad(
        fr, bounds, patch, bg_E, bg_V))

    rng = np.random.default_rng(3)
    for trial in range(3):
        x = free0 + jnp.asarray(rng.normal(0, 0.3, free0.shape))
        f1, g1 = fg_ad(x)
        f2, g2 = fg_an(x)
        np.testing.assert_allclose(f1, f2, rtol=1e-12)
        scale = np.maximum(np.abs(np.asarray(g1)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g2) / scale,
                                   np.asarray(g1) / scale,
                                   rtol=1e-9, atol=1e-11)


def test_fit_under_analytic_grad_matches_ad_optimum():
    ce = sample_star(pos=(20.0, 20.0), r_flux=40.0)
    patch = _setup(ce)
    vp0 = jnp.asarray(generic_init_source(np.asarray(ce.pos)))
    res_ad = maximize(vp0, patch, config=NewtonConfig())
    res_an = maximize(vp0, patch, config=NewtonConfig(grad_mode="analytic"))
    # Same basin, same optimum to optimizer tolerance (the trajectories
    # diverge chaotically at f64 roundoff, so compare optima, not paths).
    np.testing.assert_allclose(float(res_an.elbo), float(res_ad.elbo),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_an.vp), np.asarray(res_ad.vp),
                               rtol=1e-2, atol=1e-3)
