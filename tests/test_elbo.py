"""ELBO correctness: gradient/Hessian vs finite differences, semantics.

Mirrors the reference's derivative-parity strategy (test_elbo.jl:231-296),
with jax.grad/jax.hessian in place of SensitiveFloats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.models.params import ids, NUM_CANONICAL_PARAMS
from celeste_jl_tpu.models.patches import make_patch_for_source
from celeste_jl_tpu.ops import bijectors
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_star, sample_galaxy)
from celeste_jl_tpu.vi.elbo import elbo, elbo_likelihood, subtract_kl
from celeste_jl_tpu.vi.init import catalog_init_source


@pytest.fixture(scope="module")
def star_setup():
    images = make_blank_images(H=40, W=40)
    ce = sample_star(pos=(20.0, 20.0), r_flux=20.0)
    gen_images(images, [ce], seed=7)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp = catalog_init_source(ce)
    # perturb off the truth so gradients are nonzero (SampleData.jl:127-141)
    vp = np.asarray(vp)
    vp[ids.pos] += 5e-5
    return vp, patch, ce


def test_elbo_finite(star_setup):
    vp, patch, _ = star_setup
    val = elbo(jnp.asarray(vp), patch)
    assert np.isfinite(float(val))


def test_elbo_gradient_matches_finite_diff(star_setup):
    vp, patch, _ = star_setup
    bounds = bijectors.default_box_bounds(vp[ids.pos])
    vp_c = np.asarray(bijectors.enforce(jnp.asarray(vp), bounds))
    free0 = np.asarray(bijectors.to_free(jnp.asarray(vp_c), bounds))

    f = jax.jit(lambda fr: elbo(bijectors.to_bound(fr, bounds), patch))
    g = jax.jit(jax.grad(f))(jnp.asarray(free0))

    eps = 1e-5
    for i in range(0, 41, 5):
        fp = free0.copy(); fp[i] += eps
        fm = free0.copy(); fm[i] -= eps
        fd = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert np.isclose(float(g[i]), fd, rtol=2e-4, atol=2e-3), \
            f"param {i}: grad {float(g[i])} vs fd {fd}"


def test_elbo_hessian_matches_finite_diff_of_grad(star_setup):
    vp, patch, _ = star_setup
    bounds = bijectors.default_box_bounds(vp[ids.pos])
    vp_c = np.asarray(bijectors.enforce(jnp.asarray(vp), bounds))
    free0 = np.asarray(bijectors.to_free(jnp.asarray(vp_c), bounds))

    f = jax.jit(lambda fr: elbo(bijectors.to_bound(fr, bounds), patch))
    gfn = jax.jit(jax.grad(f))
    H = jax.jit(jax.hessian(f))(jnp.asarray(free0))
    assert np.allclose(np.asarray(H), np.asarray(H).T, atol=1e-8)

    eps = 1e-5
    for i in [2, 8, 27, 40]:
        fp = free0.copy(); fp[i] += eps
        fm = free0.copy(); fm[i] -= eps
        fd_row = (np.asarray(gfn(jnp.asarray(fp)))
                  - np.asarray(gfn(jnp.asarray(fm)))) / (2 * eps)
        assert np.allclose(np.asarray(H[i]), fd_row, rtol=1e-3, atol=2e-2), \
            f"hessian row {i}"


def test_active_source_elbo_changes_with_params(star_setup):
    vp, patch, _ = star_setup
    v0 = float(elbo_likelihood(jnp.asarray(vp), patch))
    vp2 = vp.copy()
    vp2[ids.flux_loc] += 0.1
    v1 = float(elbo_likelihood(jnp.asarray(vp2), patch))
    assert v0 != v1


def test_truth_beats_perturbed_for_star(star_setup):
    """The ELBO at (near-)truth should beat a clearly wrong configuration."""
    vp, patch, ce = star_setup
    good = vp.copy()
    bad = vp.copy()
    bad[ids.flux_loc[0]] = np.log(0.5)   # wrong flux
    assert (float(elbo_likelihood(jnp.asarray(good), patch))
            > float(elbo_likelihood(jnp.asarray(bad), patch)))


def test_galaxy_elbo_finite_and_grad():
    images = make_blank_images(H=40, W=40)
    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=30.0)
    gen_images(images, [ce], seed=11)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp = jnp.asarray(catalog_init_source(ce))
    g = jax.jit(jax.grad(lambda v: elbo(v, patch)))(vp)
    assert np.all(np.isfinite(np.asarray(g)))


def test_kl_value_finite_and_grad():
    vp = jnp.asarray(catalog_init_source(sample_star()))
    val = subtract_kl(vp)
    g = jax.grad(subtract_kl)(vp)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
