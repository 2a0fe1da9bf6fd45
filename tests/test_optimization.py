"""End-to-end optimizer tests: fit synthetic sources, recover truth.

Mirrors test_optimization.jl:10-50 (verify_sample_star/galaxy semantics).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.models.patches import make_patch_for_source, stack_patches
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.vi.init import catalog_init_source, generic_init_source
from celeste_jl_tpu.vi.optimize import fit_sources, maximize


def _fit_single(ce, seed=3, radius=12, tile=32, H=40):
    images = make_blank_images(H=H, W=H)
    gen_images(images, [ce], seed=seed)
    patch = make_patch_for_source(images, ce.pos, radius=radius, tile_size=tile)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    res = fit_sources(vp0[None], stack_patches([patch]))
    return np.asarray(res.vp[0]), res


def test_fit_star_recovers_flux_and_type():
    ce = sample_star(pos=(20.0, 20.0), r_flux=40.0)
    vp, res = _fit_single(ce)
    assert bool(res.converged[0])
    # star probability should be high
    assert vp[ids.is_star[0]] > 0.7
    # r-band flux (lognormal mean) close to truth
    flux = np.exp(vp[ids.flux_loc[0]] + 0.5 * vp[ids.flux_scale[0]])
    assert abs(flux - 40.0) / 40.0 < 0.12, flux
    # colors near zero (truth)
    assert np.all(np.abs(vp[ids.color_mean[:, 0]]) < 0.25)


def test_fit_galaxy_recovers_shape():
    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=80.0, gal_axis_ratio=0.6,
                       gal_angle=0.9, gal_radius_px=2.5, gal_frac_dev=0.4)
    vp, res = _fit_single(ce, seed=5)
    assert vp[ids.is_star[1]] > 0.6
    flux = np.exp(vp[ids.flux_loc[1]] + 0.5 * vp[ids.flux_scale[1]])
    assert abs(flux - 80.0) / 80.0 < 0.15, flux
    assert abs(vp[ids.gal_axis_ratio] - 0.6) < 0.15
    assert abs(vp[ids.gal_radius_px] - 2.5) < 0.6
    # angle is mod pi
    ang_err = abs((vp[ids.gal_angle] - 0.9 + np.pi / 2) % np.pi - np.pi / 2)
    assert ang_err < 0.3


def test_fit_improves_elbo():
    ce = sample_star(pos=(20.0, 20.0), r_flux=40.0)
    images = make_blank_images()
    gen_images(images, [ce], seed=3)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    from celeste_jl_tpu.vi.elbo import elbo
    e0 = float(elbo(vp0, patch))
    res = maximize(vp0, patch)
    assert float(res.elbo) > e0


def test_fit_star_with_steihaug_cg_solver():
    """The matvec-only Steihaug-CG trust-region option (NewtonConfig
    tr_solver="cg") converges and recovers the flux. It does NOT reliably
    recover the star/galaxy type — truncated CG stops at the boundary on the
    first negative-curvature direction instead of following it out of the
    basin like the exact eigenbasis solver, which is exactly why "eig" is
    the default (ops/newton.py NewtonConfig.tr_solver)."""
    from celeste_jl_tpu.ops.newton import NewtonConfig

    ce = sample_star(pos=(20.0, 20.0), r_flux=40.0)
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=3)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    res = fit_sources(vp0[None], stack_patches([patch]),
                      config=NewtonConfig(tr_solver="cg"))
    vp = np.asarray(res.vp[0])
    assert np.all(np.isfinite(vp))
    star = vp[ids.is_star[0]] > 0.5
    j = 0 if star else 1
    flux = np.exp(vp[ids.flux_loc[j]] + 0.5 * vp[ids.flux_scale[j]])
    assert abs(flux - 40.0) / 40.0 < 0.15, flux


def test_structured_hessian_mode_fits_match_analytic():
    """hessian_mode="structured" (the AD cross-check path) and the default
    analytic path must land on the same optimum."""
    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=60.0, gal_radius_px=2.0)
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=7)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    pstack = stack_patches([patch])
    res_a = fit_sources(vp0[None], pstack, hessian_mode="analytic")
    res_s = fit_sources(vp0[None], pstack, hessian_mode="structured")
    assert abs(float(res_a.elbo[0]) - float(res_s.elbo[0])) < 1.0
    np.testing.assert_allclose(np.asarray(res_a.vp[0]),
                               np.asarray(res_s.vp[0]), atol=2e-3)


def test_compacted_fits_match_plain():
    """fit_sources_compacted (stage-1 full batch + gathered stage-2 finish
    of unconverged lanes) is per-lane equivalent to the single-call path:
    same iteration counts, same optima to bijector-roundtrip roundoff."""
    from celeste_jl_tpu.vi.optimize import fit_sources_compacted

    entries = [sample_star(pos=(20.0, 20.0), r_flux=40.0),
               sample_galaxy(pos=(20.0, 20.0), r_flux=60.0,
                             gal_radius_px=2.0),
               sample_star(pos=(19.0, 21.0), r_flux=15.0),
               sample_galaxy(pos=(21.0, 19.0), r_flux=25.0,
                             gal_radius_px=1.5)]
    vps, patches = [], []
    for i, ce in enumerate(entries):
        images = make_blank_images(H=40, W=40)
        gen_images(images, [ce], seed=10 + i)
        patches.append(make_patch_for_source(images, ce.pos, radius=12,
                                             tile_size=32))
        vps.append(generic_init_source(ce.pos))
    vp0s = jnp.asarray(np.stack(vps))
    pstack = stack_patches(patches)

    plain = fit_sources(vp0s, pstack)
    comp = fit_sources_compacted(vp0s, pstack, stage1_refreshes=2,
                                 min_bucket=2)
    np.testing.assert_array_equal(np.asarray(plain.iters),
                                  np.asarray(comp.iters))
    np.testing.assert_allclose(np.asarray(plain.vp), np.asarray(comp.vp),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain.elbo), np.asarray(comp.elbo),
                               rtol=1e-9)
    assert np.asarray(comp.converged).all()


def test_resume_freezes_converged_lanes():
    """minimize_newton_tr(converged0=True) must leave a lane untouched:
    the staged-compaction in-place path re-submits converged lanes and
    they must not burn extra refresh cycles or drift."""
    import jax

    from celeste_jl_tpu.ops.newton import NewtonConfig, minimize_newton_tr

    def fgh(x):
        f = jnp.sum((x - 2.0) ** 2)
        return f, 2.0 * (x - 2.0), 2.0 * jnp.eye(x.shape[0])

    x0 = jnp.asarray(np.array([5.0, -3.0, 0.5]))
    frozen = minimize_newton_tr(fgh, x0, NewtonConfig(max_iters=10),
                                converged0=jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(frozen.x), np.asarray(x0))
    assert int(frozen.iters) == 0
    live = minimize_newton_tr(fgh, x0, NewtonConfig(max_iters=10),
                              converged0=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(live.x), 2.0, atol=1e-6)
