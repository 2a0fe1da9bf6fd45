"""The fast ELBO Hessians must equal the generic jax.hessian to f64
roundoff: both the analytic mode (closed-form Gaussian-derivative pixel
moments, models/mixture_derivs.py) and the structured AD mode (shape rows
through the render + brightness block through the 20-dim coefficient
bottleneck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.models.patches import make_patch_for_source, stack_patches
from celeste_jl_tpu.ops import bijectors
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.vi.elbo import elbo_likelihood, subtract_kl
from celeste_jl_tpu.vi.init import catalog_init_source, generic_init_source
from celeste_jl_tpu.vi.optimize import _make_bounds


def _setup(ce, seed=11):
    """One source's SkyPatch without a batch axis (as maximize sees it)."""
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=seed)
    patch = make_patch_for_source(images, ce.pos, radius=10, tile_size=32)
    return jax.tree.map(lambda x: x[0], stack_patches([patch]))


def _fgh_pair(vp0, patch, include_kl=True, hessian_mode="analytic"):
    """(fast fgh, generic fgh) closures at the same bounds."""
    from celeste_jl_tpu.ops.newton import NewtonConfig
    from celeste_jl_tpu.vi import optimize

    captured = {}
    orig = optimize.minimize_newton_tr

    def capture(fgh, x0, config, fg=None, **_resume_kwargs):
        captured["fgh"] = fgh
        captured["fg"] = fg
        captured["x0"] = x0
        return orig(fgh, x0, NewtonConfig(max_iters=1, hess_every=1))

    optimize.minimize_newton_tr = capture
    try:
        optimize.maximize(vp0, patch, include_kl=include_kl,
                          hessian_mode=hessian_mode)
    finally:
        optimize.minimize_newton_tr = orig

    bounds = _make_bounds(vp0[0:2])

    def neg_elbo(free):
        vp = bijectors.to_bound(free, bounds)
        out = elbo_likelihood(vp, patch)
        if include_kl:
            out = out + subtract_kl(vp)
        return -out

    def generic_fgh(free):
        f, g = jax.value_and_grad(neg_elbo)(free)
        return f, g, jax.hessian(neg_elbo)(free)

    return captured["fgh"], generic_fgh, captured["x0"]


@pytest.mark.parametrize("mode", ["analytic", "structured"])
@pytest.mark.parametrize("make_ce,include_kl", [
    (lambda: sample_star(pos=(20.0, 20.0), r_flux=40.0), True),
    (lambda: sample_galaxy(pos=(20.0, 19.0), r_flux=25.0,
                           gal_radius_px=2.5), True),
    (lambda: sample_star(pos=(20.0, 20.0), r_flux=40.0), False),
])
def test_fast_hessian_matches_generic(make_ce, include_kl, mode):
    ce = make_ce()
    patch = _setup(ce)
    rng = np.random.default_rng(0)
    for init in (catalog_init_source(ce), generic_init_source(ce.pos)):
        vp0 = jnp.asarray(init)
        fgh_s, fgh_g, free0 = _fgh_pair(vp0, patch, include_kl, mode)
        for trial in range(3):
            x = free0 + jnp.asarray(rng.normal(0, 0.3, free0.shape))
            f1, g1, H1 = jax.jit(fgh_s)(x)
            f2, g2, H2 = jax.jit(fgh_g)(x)
            np.testing.assert_allclose(f1, f2, rtol=1e-12)
            np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-9)
            scale = np.maximum(np.abs(np.asarray(H2)).max(), 1.0)
            np.testing.assert_allclose(np.asarray(H1) / scale,
                                       np.asarray(H2) / scale,
                                       rtol=1e-8, atol=1e-10)
