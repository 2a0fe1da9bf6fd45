"""Systolic Jacobi eigensolver (ops/jacobi.py): parity with eigh, warm-start
behavior, and the tr_solver="jacobi" Newton path recovering sources."""

import jax
import jax.numpy as jnp
import numpy as np

from celeste_jl_tpu.ops.jacobi import jacobi_eigh, pad_to_even


def _rand_sym(s, d, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(s, d, d)).astype(dtype)
    return (a + a.transpose(0, 2, 1)) / 2


def test_jacobi_matches_eigh():
    H = _rand_sym(6, 41, seed=1)
    Hp, _ = pad_to_even(jnp.asarray(H))
    w, Q, sweeps = jacobi_eigh(Hp)
    w = np.asarray(w)
    Q = np.asarray(Q)
    wref = np.linalg.eigvalsh(H)
    # padded eigenvalue is the Gershgorin bound — largest, so sorting and
    # dropping the last recovers the original spectrum
    np.testing.assert_allclose(np.sort(w, axis=1)[:, :41], wref,
                               rtol=1e-8, atol=1e-8)
    # orthogonality and reconstruction
    np.testing.assert_allclose(np.einsum("sij,sik->sjk", Q, Q),
                               np.broadcast_to(np.eye(42), (6, 42, 42)),
                               atol=1e-10)
    # reconstruction carries the residual off-diagonal mass the relative
    # sweep tolerance (1e-6 x ||H||_F) leaves behind
    rec = np.einsum("sij,sj,skj->sik", Q, w, Q)
    np.testing.assert_allclose(rec[:, :41, :41], H, atol=5e-5)
    assert int(sweeps) <= 10


def test_jacobi_warm_start_needs_fewer_sweeps():
    H = _rand_sym(4, 41, seed=2)
    Hp, _ = pad_to_even(jnp.asarray(H))
    w, Q, cold_sweeps = jacobi_eigh(Hp)
    # perturb mildly (one trust-region cycle's worth of Hessian drift)
    H2 = H + 0.01 * _rand_sym(4, 41, seed=3)
    Hp2, _ = pad_to_even(jnp.asarray(H2))
    w2, Q2, warm_sweeps = jacobi_eigh(Hp2, Q)
    assert int(warm_sweeps) < int(cold_sweeps)
    wref = np.linalg.eigvalsh(H2)
    np.testing.assert_allclose(np.sort(np.asarray(w2), axis=1)[:, :41],
                               wref, rtol=1e-8, atol=1e-8)


def test_pad_to_even_decoupled():
    H = _rand_sym(3, 5, seed=4)
    g = np.random.default_rng(5).normal(size=(3, 5))
    Hp, gp = pad_to_even(jnp.asarray(H), jnp.asarray(g))
    assert Hp.shape[-1] == 6 and gp.shape[-1] == 6
    # pad eigenvalue dominates (never the bottom one) and is decoupled
    w = np.linalg.eigvalsh(np.asarray(Hp))
    wref = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(w[:, :5], wref, atol=1e-10)
    assert np.all(w[:, 5] > np.abs(wref).max(axis=1))
    np.testing.assert_array_equal(np.asarray(gp[:, 5]), 0.0)


def test_newton_jacobi_solver_recovers_star():
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.models.patches import (make_patch_for_source,
                                               stack_patches)
    from celeste_jl_tpu.ops.newton import NewtonConfig
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
                      config=NewtonConfig(tr_solver="jacobi"))
    vp = np.asarray(res.vp[0])
    assert bool(res.converged[0])
    assert vp[ids.is_star[0]] > 0.7
    flux = np.exp(vp[ids.flux_loc[0]] + 0.5 * vp[ids.flux_scale[0]])
    assert abs(flux - 40.0) / 40.0 < 0.12, flux


# --- tridiagonal eigensolver (ops/tridiag.py) ---

def test_tridiag_matches_eigh():
    from celeste_jl_tpu.ops.tridiag import tridiag_eigh

    H = _rand_sym(6, 41, seed=7)
    w, Q = jax.jit(jax.vmap(tridiag_eigh))(jnp.asarray(H))
    w = np.asarray(w)
    Q = np.asarray(Q)
    wref = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(np.sort(w, axis=1), wref, rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(np.einsum("sij,sik->sjk", Q, Q),
                               np.broadcast_to(np.eye(41), (6, 41, 41)),
                               atol=1e-10)
    rec = np.einsum("sij,sj,skj->sik", Q, w, Q)
    np.testing.assert_allclose(rec, H, atol=1e-8)


def test_tridiag_clustered_spectrum():
    """Block inverse iteration with interleaved MGS must handle clustered
    eigenvalues (a rank-5 + noise matrix: 36 near-zero eigenvalues) — the
    case where plain inverse iteration collapses."""
    from celeste_jl_tpu.ops.tridiag import tridiag_eigh

    rng = np.random.default_rng(8)
    a = rng.normal(size=(3, 41, 5))
    H = a @ a.transpose(0, 2, 1) + 1e-4 * _rand_sym(3, 41, seed=9)
    w, Q = jax.jit(jax.vmap(tridiag_eigh))(jnp.asarray(H))
    w = np.asarray(w)
    Q = np.asarray(Q)
    wref = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(np.sort(w, axis=1), wref,
                               rtol=1e-7, atol=1e-7)
    rec = np.einsum("sij,sj,skj->sik", Q, w, Q)
    np.testing.assert_allclose(rec, H, atol=1e-6)


def test_newton_tridiag_solver_matches_eig_fit():
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.models.patches import (make_patch_for_source,
                                               stack_patches)
    from celeste_jl_tpu.ops.newton import NewtonConfig
    from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                          sample_galaxy)
    from celeste_jl_tpu.vi.init import generic_init_source
    from celeste_jl_tpu.vi.optimize import fit_sources

    ce = sample_galaxy(pos=(20.0, 20.0), r_flux=60.0, gal_radius_px=2.0)
    images = make_blank_images(H=40, W=40)
    gen_images(images, [ce], seed=7)
    patch = make_patch_for_source(images, ce.pos, radius=12, tile_size=32)
    vp0 = jnp.asarray(generic_init_source(ce.pos))
    pstack = stack_patches([patch])
    r_eig = fit_sources(vp0[None], pstack)
    r_td = fit_sources(vp0[None], pstack,
                       config=NewtonConfig(tr_solver="tridiag"))
    assert bool(r_td.converged[0])
    assert abs(float(r_eig.elbo[0]) - float(r_td.elbo[0])) < 0.5
    assert abs(float(r_td.vp[0][ids.gal_radius_px]) - 2.0) < 0.5
