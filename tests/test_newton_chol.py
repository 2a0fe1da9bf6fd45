"""More-Sorensen-with-Cholesky trust-region solver (ops/newton.py
tr_solver="chol"): subproblem parity with the exact eigenbasis solver, and
end-to-end fit behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from celeste_jl_tpu.ops.newton import (NewtonConfig, _solve_tr_chol,
                                       solve_tr_subproblem)


def _rand_sym(rng, D, shift=0.0):
    A = rng.normal(size=(D, D))
    H = (A + A.T) / 2.0
    return H + shift * np.eye(D)


def test_chol_matches_eig_positive_definite():
    rng = np.random.default_rng(0)
    for trial in range(20):
        D = 41
        H = jnp.asarray(_rand_sym(rng, D, shift=8.0))   # PD
        g = jnp.asarray(rng.normal(size=D))
        for delta in (0.05, 1.0, 100.0):
            p_e, pred_e = solve_tr_subproblem(g, H, jnp.asarray(delta))
            p_c, pred_c, _ = _solve_tr_chol(g, H, jnp.asarray(delta),
                                            ms_iters=12)
            np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_e),
                                       rtol=2e-4, atol=1e-6)
            np.testing.assert_allclose(float(pred_c), float(pred_e),
                                       rtol=1e-4, atol=1e-9)


def test_chol_matches_eig_indefinite():
    """Indefinite Hessians: the boundary solution (lam > -lam_min) must
    match the eigenbasis solver's, i.e. the solver follows negative
    curvature to the boundary (the property Steihaug-CG lacks)."""
    rng = np.random.default_rng(1)
    for trial in range(20):
        D = 41
        H = jnp.asarray(_rand_sym(rng, D, shift=-2.0))  # indefinite
        g = jnp.asarray(rng.normal(size=D))
        delta = jnp.asarray(float(rng.uniform(0.1, 5.0)))
        p_e, pred_e = solve_tr_subproblem(g, H, delta)
        p_c, pred_c, _ = _solve_tr_chol(g, H, delta, ms_iters=16)
        # near-boundary solution (the lam iteration may stop within a few
        # percent of the exact boundary — the TR driver's rho test absorbs
        # that), feasible, and nearly as good as exact in predicted
        # reduction (what the TR driver actually consumes).
        nrm = float(jnp.linalg.norm(p_c))
        assert nrm <= float(delta) * (1 + 1e-5)
        assert nrm >= float(delta) * 0.9
        assert float(pred_c) >= 0.9 * float(pred_e)
        assert float(pred_c) <= float(pred_e) * (1 + 1e-6)


def test_chol_interior_is_exact_newton_step():
    """PD H with a huge radius: the solver must return the exact interior
    Newton step (lam = 0), not a boundary point."""
    rng = np.random.default_rng(2)
    H = jnp.asarray(_rand_sym(rng, 10, shift=6.0))
    g = jnp.asarray(rng.normal(size=10))
    p, _, _ = _solve_tr_chol(g, H, jnp.asarray(1e6), ms_iters=8)
    p_newton = -jnp.linalg.solve(H, g)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_newton),
                               rtol=1e-6, atol=1e-9)


def test_chol_hard_case_returns_feasible_descent():
    """Exact hard case (g orthogonal to the bottom eigenvector): the chol
    solver cannot add the eigenvector correction, but must still return a
    feasible step with nonnegative predicted reduction."""
    rng = np.random.default_rng(3)
    D = 8
    Q, _ = np.linalg.qr(rng.normal(size=(D, D)))
    w = np.array([-3.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    H = jnp.asarray(Q @ np.diag(w) @ Q.T)
    g_full = rng.normal(size=D)
    g_full -= (g_full @ Q[:, 0]) * Q[:, 0]    # remove bottom-eigvec part
    g = jnp.asarray(g_full)
    delta = jnp.asarray(2.0)
    p, pred, _ = _solve_tr_chol(g, H, delta, ms_iters=16)
    assert float(jnp.linalg.norm(p)) <= float(delta) * (1 + 1e-5)
    assert float(pred) >= 0.0
    assert np.all(np.isfinite(np.asarray(p)))


def test_fit_star_with_chol_solver():
    """End-to-end: tr_solver="chol" recovers the star's type and flux (the
    boundary solutions follow negative curvature, unlike "cg")."""
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.models.patches import (make_patch_for_source,
                                               stack_patches)
    from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                          sample_star)
    from celeste_jl_tpu.vi.init import generic_init_source
    from celeste_jl_tpu.vi.optimize import fit_sources

    ce = sample_star(pos=(20.0, 20.0), r_flux=40.0)
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=3)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    res = fit_sources(vp0[None], stack_patches([patch]),
                      config=NewtonConfig(tr_solver="chol"))
    vp = np.asarray(res.vp[0])
    assert np.all(np.isfinite(vp))
    assert vp[ids.is_star[0]] > 0.7
    flux = np.exp(vp[ids.flux_loc[0]] + 0.5 * vp[ids.flux_scale[0]])
    assert abs(flux - 40.0) / 40.0 < 0.12, flux
