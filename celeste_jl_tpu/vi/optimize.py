"""Per-source ELBO maximization (ElboMaximize.jl rebuilt for TPU).

One source fit = Newton trust-region over the 41 free parameters, with the
ELBO value/gradient/Hessian obtained by jax.value_and_grad / jax.hessian
through the bijector. `fit_sources` vmaps the whole fit across a batch of
sources — the TPU replacement for the reference's per-source thread kernel
(ParallelRun.jl:372-397).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

import numpy as np

from ..models import mixture_derivs as md
from ..models.params import ids
from ..models.patches import pixel_coord_grids
from ..ops import bijectors
from ..ops.newton import NewtonConfig, minimize_newton_tr
from .elbo import (brightness_coeffs, moment_grids_from_fs,
                   pixel_log_likelihood, source_fs_grids, subtract_kl)

# free[0:6] = pos(2), gal_frac_dev, gal_axis_ratio, gal_angle, gal_radius_px:
# the only free params the likelihood depends on through the pixel render
# (bijectors free layout). Everything else reaches the likelihood through
# the 20 brightness coefficients (elbo.brightness_coeffs) or only the KL.
N_SHAPE = 6


class FitResult(NamedTuple):
    vp: jnp.ndarray          # (44,) optimized canonical params
    elbo: jnp.ndarray        # final ELBO value
    iters: jnp.ndarray
    f_calls: jnp.ndarray
    converged: jnp.ndarray
    # warm-resume state for staged compaction: final trust-region radius and
    # final FREE vector (resuming from vp would need to_free(vp), which is
    # catastrophically ill-conditioned in f32 — the position box spans
    # ~2e-4 at coordinates ~1e1-1e2, so (pos - lower)/width cancels to
    # exactly 0/1 on bound-hugging lanes and to_free returns ±inf)
    delta: jnp.ndarray
    free: jnp.ndarray


def _make_bounds(pos, loc_width=1e-4, loc_scale=1.0):
    """Traced version of default_box_bounds (pos enters as a traced value)."""
    import numpy as np
    static = bijectors.default_box_bounds(np.zeros(2), loc_width, loc_scale)
    lower = static.lower.at[0:2].set(pos - loc_width)
    upper = static.upper.at[0:2].set(pos + loc_width)
    return bijectors.BoxBounds(lower, upper, static.scale)


def _band_flat_fields(theta6, psf_b, jac_b, wc_b, pc_b, off_b, pixels_b,
                      mask_b, sky_b, iota_b, bg_E_b, bg_var_b, P):
    """Flatten one band's tile fields to (P*P,) vectors and render the flat
    unit-flux densities fs0/fs1 via the mixture engine.

    The flat layout is the TPU-native one: a (..., P, P) tile puts P in the
    128-wide lane dim (P=32 wastes 4x, P=16 8x), while (..., P*P) packs
    lanes densely. Shared head of the analytic-Hessian blocks AND the
    value/grad trial evaluator so both see bit-identical fields.
    """
    dtype = pixels_b.dtype
    x1g, x2g = pixel_coord_grids(off_b, P, dtype=dtype)
    x1 = x1g.reshape(-1)
    x2 = x2g.reshape(-1)
    msk = mask_b.reshape(-1).astype(dtype)
    x = jnp.where(msk > 0, pixels_b.reshape(-1), 0.0)
    iota = jnp.where(msk > 0, iota_b.reshape(-1), 1.0)
    a0 = sky_b.reshape(-1) + bg_E_b.reshape(-1)
    b0 = bg_var_b.reshape(-1)

    sm = md.star_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    gm = md.galaxy_mixture(theta6, psf_b, jac_b, wc_b, pc_b)

    fs0 = md.mixture_values(x1, x2, *sm)
    fs1 = md.mixture_values(x1, x2, *gm)
    return x1, x2, msk, x, iota, a0, b0, sm, gm, fs0, fs1


def _band_poisson_bound(clb, cllb, msk, x, iota, a0, b0, fs0, fs1):
    """Masked Poisson-lower-bound terms of one band on flat fields.
    Returns (lik, s1, s2, E, V) — the derivative blocks reuse the
    intermediates (elbo_objective.jl:274-392)."""
    s1 = clb[0] * fs0 + clb[1] * fs1
    s2 = cllb[0] * fs0 ** 2 + cllb[1] * fs1 ** 2
    E = jnp.where(msk > 0, a0 + s1, 1.0)
    V = jnp.where(msk > 0, b0 + s2 - s1 ** 2, 0.0)
    from jax.scipy.special import gammaln
    phi = (x * (jnp.log(iota) + jnp.log(E) - V / (2.0 * E ** 2))
           - iota * E - gammaln(x + 1.0))
    return jnp.sum(msk * phi), s1, s2, E, V


def _band_lik_terms(theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b,
                    pixels_b, mask_b, sky_b, iota_b, bg_E_b, bg_var_b, P):
    """One band's analytic likelihood derivative blocks in (theta6, Cb)
    space, Cb = (cl0, cl1, cll0, cll1) the band's brightness coefficients.

    Per pixel the likelihood is phi(E, V) with E = sky + bg + s1,
    V = bg_var + s2 - s1^2, s1 = cl.f, s2 = cll.f^2 linear in Cb given the
    densities f = (fs0, fs1) — so every Hessian block is a weighted pixel
    contraction of (f, J) fields with closed-form phi derivatives
    (elbo_objective.jl:274-392 semantics, derivatives reorganized for MXU).

    Returns (lik, g_theta (6,), g_C (4,), H_tt (6,6), H_tC (6,4),
    H_CC (4,4)).
    """
    dtype = pixels_b.dtype
    (x1, x2, msk, x, iota, a0, b0, sm, gm,
     fs0, fs1) = _band_flat_fields(
        theta6, psf_b, jac_b, wc_b, pc_b, off_b, pixels_b, mask_b, sky_b,
        iota_b, bg_E_b, bg_var_b, P)

    cl0, cl1 = clb[0], clb[1]
    cll0, cll1 = cllb[0], cllb[1]
    lik, s1, s2, E, V = _band_poisson_bound(
        clb, cllb, msk, x, iota, a0, b0, fs0, fs1)

    E2 = E * E
    E3 = E2 * E
    phi_E = x / E + x * V / E3 - iota
    phi_V = -x / (2.0 * E2)
    phi_EE = -x / E2 - 3.0 * x * V / (E2 * E2)
    phi_EV = x / E3

    g1 = msk * (phi_E - 2.0 * s1 * phi_V)
    g2 = msk * phi_V
    h11 = msk * (phi_EE - 4.0 * s1 * phi_EV) - 2.0 * g2
    h12 = msk * phi_EV

    u0 = 2.0 * cll0 * fs0
    u1 = 2.0 * cll1 * fs1
    W0 = g1 * cl0 + g2 * u0
    W1 = g1 * cl1 + g2 * u1

    _, J0, Hc0 = md.mixture_value_jac_hess(x1, x2, *sm, W0)
    _, J1, Hc1 = md.mixture_value_jac_hess(x1, x2, *gm, W1)

    f00 = h11 * cl0 * cl0 + 2.0 * h12 * cl0 * u0 + 2.0 * g2 * cll0
    f01 = h11 * cl0 * cl1 + h12 * (cl0 * u1 + u0 * cl1)
    f11 = h11 * cl1 * cl1 + 2.0 * h12 * cl1 * u1 + 2.0 * g2 * cll1
    H_tt = (Hc0 + Hc1
            + jnp.einsum("in,n,jn->ij", J0, f00, J0)
            + jnp.einsum("in,n,jn->ij", J0, f01, J1)
            + jnp.einsum("in,n,jn->ij", J1, f01, J0)
            + jnp.einsum("in,n,jn->ij", J1, f11, J1))

    g_theta = J0 @ W0 + J1 @ W1
    g_C = jnp.stack([jnp.sum(g1 * fs0), jnp.sum(g1 * fs1),
                     jnp.sum(g2 * fs0 ** 2), jnp.sum(g2 * fs1 ** 2)])

    # H_tC columns: d2 lik / d theta d{cl0, cl1, cll0, cll1}.
    cols = []
    for j, fsj in ((0, fs0), (1, fs1)):
        A0 = h11 * fsj * cl0 + h12 * fsj * u0 + (g1 if j == 0 else 0.0)
        A1 = h11 * fsj * cl1 + h12 * fsj * u1 + (g1 if j == 1 else 0.0)
        cols.append(J0 @ A0 + J1 @ A1)
    for j, fsj in ((0, fs0), (1, fs1)):
        A0 = h12 * fsj ** 2 * cl0 + (2.0 * g2 * fs0 if j == 0 else 0.0)
        A1 = h12 * fsj ** 2 * cl1 + (2.0 * g2 * fs1 if j == 1 else 0.0)
        cols.append(J0 @ A0 + J1 @ A1)
    H_tC = jnp.stack(cols, axis=1)                    # (6, 4)

    hcl = jnp.stack([jnp.stack([jnp.sum(h11 * fs0 * fs0),
                                jnp.sum(h11 * fs0 * fs1)]),
                     jnp.stack([jnp.sum(h11 * fs0 * fs1),
                                jnp.sum(h11 * fs1 * fs1)])])
    hx = jnp.stack([jnp.stack([jnp.sum(h12 * fs0 * fs0 ** 2),
                               jnp.sum(h12 * fs0 * fs1 ** 2)]),
                    jnp.stack([jnp.sum(h12 * fs1 * fs0 ** 2),
                               jnp.sum(h12 * fs1 * fs1 ** 2)])])
    H_CC = jnp.block([[hcl, hx], [hx.T, jnp.zeros((2, 2), dtype)]])
    return lik, g_theta, g_C, H_tt, H_tC, H_CC


def _band_lik_grad(theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b,
                   pixels_b, mask_b, sky_b, iota_b, bg_E_b, bg_var_b, P):
    """One band's likelihood VALUE + GRADIENT in (theta6, Cb) space — the
    degree-<=2 moment subset of _band_lik_terms (no Hessian blocks), for
    the analytic fg evaluator. Returns (lik, g_theta (6,), g_C (4,))."""
    (x1, x2, msk, x, iota, a0, b0, sm, gm,
     fs0, fs1) = _band_flat_fields(
        theta6, psf_b, jac_b, wc_b, pc_b, off_b, pixels_b, mask_b, sky_b,
        iota_b, bg_E_b, bg_var_b, P)

    cl0, cl1 = clb[0], clb[1]
    cll0, cll1 = cllb[0], cllb[1]
    lik, s1, s2, E, V = _band_poisson_bound(
        clb, cllb, msk, x, iota, a0, b0, fs0, fs1)

    E2 = E * E
    phi_E = x / E + x * V / (E2 * E) - iota
    phi_V = -x / (2.0 * E2)
    g1 = msk * (phi_E - 2.0 * s1 * phi_V)
    g2 = msk * phi_V
    W0 = g1 * cl0 + g2 * (2.0 * cll0 * fs0)
    W1 = g1 * cl1 + g2 * (2.0 * cll1 * fs1)

    g_theta = (md.mixture_grad_contract(x1, x2, *sm, W0)
               + md.mixture_grad_contract(x1, x2, *gm, W1))
    g_C = jnp.stack([jnp.sum(g1 * fs0), jnp.sum(g1 * fs1),
                     jnp.sum(g2 * fs0 ** 2), jnp.sum(g2 * fs1 ** 2)])
    return lik, g_theta, g_C


def _analytic_lik_value_grad(free, bounds, patch, bg_E_G, bg_var_G):
    """Likelihood value + exact gradient wrt the 41 free parameters, via
    analytic per-band (theta6, C20) gradients chained through the
    pixel-free free -> (theta, C) map with AD — the fg twin of
    _analytic_lik_hessian. Reverse-mode AD pays ~2-3x the forward render
    per gradient; this pays one render + 12 degree-<=2 weighted pixel
    moments (MXU-shaped reductions). Returns (lik, g_free (41,))."""
    dtype = free.dtype
    vp = bijectors.to_bound(free, bounds)
    theta6 = vp[0:6]
    C20 = brightness_coeffs(vp)
    cl = C20[:10].reshape(5, 2)
    cll = C20[10:].reshape(5, 2)
    P = tuple(patch.pixels.shape[-2:])
    bg_E = bg_E_G if bg_E_G is not None else jnp.zeros_like(patch.sky)
    bg_V = bg_var_G if bg_var_G is not None else jnp.zeros_like(patch.sky)

    out = jax.vmap(
        lambda clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b, px, mk, sk, io,
        bE, bV: _band_lik_grad(
            theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b,
            px, mk, sk, io, bE, bV, P)
    )(cl, cll, patch.psf, patch.wcs_jacobian, patch.world_center,
      patch.pixel_center, patch.offset, patch.pixels, patch.mask,
      patch.sky, patch.iota, bg_E, bg_V)
    lik_b, g_t_b, g_C_b = out

    g_ord = jnp.concatenate([jnp.sum(g_t_b, axis=0), g_C_b.reshape(-1)])
    g26 = jnp.asarray(_PERM26, dtype) @ g_ord

    def h26(fr):
        v = bijectors.to_bound(fr, bounds)
        return jnp.concatenate([v[0:6], brightness_coeffs(v)])

    # vjp of the pixel-free map: one reverse pass over a tiny scalar graph
    # (cheaper than materializing the (26, 41) jacobian).
    _, pull = jax.vjp(h26, free)
    return jnp.sum(lik_b), pull(g26)[0]


def _flat_likelihood(vp, patch, bg_E_G, bg_var_G):
    """Expected log likelihood of one source over FLAT (P*P,) pixel
    vectors — the trial-evaluator twin of vi/elbo.elbo_likelihood.

    Same masked Poisson lower bound (elbo_objective.jl:274-392), but the
    tile fields are flattened before any arithmetic so the minor dim packs
    the TPU's 128 lanes densely ((B, P, P) tiles waste 4x at P=32, 8x at
    P=16), and the densities come from the same mixture engine as the
    analytic Hessian blocks — f, g, and H see bit-identical fields. The 2D
    tile version in vi/elbo.py stays the public/reference form.
    """
    theta6 = vp[0:6]
    C20 = brightness_coeffs(vp)
    cl = C20[:10].reshape(5, 2)
    cll = C20[10:].reshape(5, 2)
    P = tuple(patch.pixels.shape[-2:])
    bg_E = bg_E_G if bg_E_G is not None else jnp.zeros_like(patch.sky)
    bg_V = bg_var_G if bg_var_G is not None else jnp.zeros_like(patch.sky)

    def one_band(clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b, px, mk, sk,
                 io, bE, bV):
        _, _, msk, x, iota, a0, b0, _, _, fs0, fs1 = _band_flat_fields(
            theta6, psf_b, jac_b, wc_b, pc_b, off_b, px, mk, sk, io,
            bE, bV, P)
        lik, *_ = _band_poisson_bound(clb, cllb, msk, x, iota, a0, b0,
                                      fs0, fs1)
        return lik

    lik_b = jax.vmap(one_band)(
        cl, cll, patch.psf, patch.wcs_jacobian, patch.world_center,
        patch.pixel_center, patch.offset, patch.pixels, patch.mask,
        patch.sky, patch.iota, bg_E, bg_V)
    return jnp.sum(lik_b)


# C20 column indices per band: (cl0, cl1, cll0, cll1) -> flat C layout.
_C_COLS = np.array([[2 * b, 2 * b + 1, 10 + 2 * b, 10 + 2 * b + 1]
                    for b in range(5)])

# Constant permutation [theta6, band-major (cl0,cl1,cll0,cll1) blocks] ->
# [theta6, C20 layout]; applied as a matmul so the assembly has no scatters.
_PERM26 = np.zeros((26, 26), np.float64)
for _t in range(6):
    _PERM26[_t, _t] = 1.0
for _b in range(5):
    for _j, _c in enumerate(_C_COLS[_b]):
        _PERM26[6 + _c, 6 + 4 * _b + _j] = 1.0


def _analytic_lik_fgh(free, bounds, patch, bg_E_G, bg_var_G,
                      refresh_kernel="xla"):
    """Exact likelihood (value, gradient, Hessian) wrt the free parameters
    in ONE pass over the pixel fields: analytic per-band blocks in
    (theta6, C20) space (models/mixture_derivs.py) chained through the
    (pixel-free) free -> (theta, C) map with AD. ~20x cheaper than AD
    through the render for the Hessian; the value/gradient ride along for
    free (_band_lik_terms computes them anyway) — the grad_mode="analytic"
    refresh evaluator, which therefore renders the fields once per refresh
    instead of once for fg plus once for H.

    refresh_kernel: "xla" (the band evaluator above) or "pallas" — the
    fused VMEM-resident render->moment kernel (ops/pallas_refresh.py),
    which emits the same per-band blocks without materializing the
    per-component/pixel intermediates in HBM (the fit's measured DMA
    bottleneck, benchmark/profile_results.md)."""
    dtype = free.dtype
    vp = bijectors.to_bound(free, bounds)
    theta6 = vp[0:6]
    C20 = brightness_coeffs(vp)
    cl = C20[:10].reshape(5, 2)
    cll = C20[10:].reshape(5, 2)
    P = tuple(patch.pixels.shape[-2:])

    bg_E = bg_E_G if bg_E_G is not None else jnp.zeros_like(patch.sky)
    bg_V = bg_var_G if bg_var_G is not None else jnp.zeros_like(patch.sky)

    band_terms = _band_lik_terms
    if refresh_kernel == "pallas":
        from ..ops.pallas_refresh import band_lik_terms_fused as band_terms

    out = jax.vmap(
        lambda clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b, px, mk, sk, io,
        bE, bV: band_terms(
            theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b,
            px, mk, sk, io, bE, bV, P)
    )(cl, cll, patch.psf, patch.wcs_jacobian, patch.world_center,
      patch.pixel_center, patch.offset, patch.pixels, patch.mask,
      patch.sky, patch.iota, bg_E, bg_V)
    lik_b, g_t_b, g_C_b, H_tt_b, H_tC_b, H_CC_b = out

    # Band-ordered assembly (theta, then 4 coefficients per band), then one
    # constant-permutation matmul into the C20 layout — no scatters.
    g_ord = jnp.concatenate([jnp.sum(g_t_b, axis=0), g_C_b.reshape(-1)])
    H_tC_ord = jnp.concatenate(list(H_tC_b), axis=1)            # (6, 20)
    HCC_ord = jax.scipy.linalg.block_diag(*H_CC_b)              # (20, 20)
    H_ord = jnp.block([[jnp.sum(H_tt_b, axis=0), H_tC_ord],
                       [H_tC_ord.T, HCC_ord]])
    perm = jnp.asarray(_PERM26, dtype)
    g26 = perm @ g_ord
    H26 = perm @ H_ord @ perm.T

    def h26(fr):
        v = bijectors.to_bound(fr, bounds)
        return jnp.concatenate([v[0:6], brightness_coeffs(v)])

    J_h = jax.jacfwd(h26)(free)                        # (26, 41)
    T_h = jax.jacfwd(jax.jacfwd(h26))(free)            # (26, 41, 41)
    g_free = J_h.T @ g26
    H_free = J_h.T @ (H26 @ J_h) + jnp.einsum("a,aij->ij", g26, T_h)
    return jnp.sum(lik_b), g_free, H_free


def _analytic_lik_hessian(free, bounds, patch, bg_E_G, bg_var_G,
                          refresh_kernel="xla"):
    """Exact likelihood Hessian wrt the free parameters (the H-only view
    of _analytic_lik_fgh, kept for the grad_mode="ad" refresh path whose
    f, g come from AD)."""
    return _analytic_lik_fgh(free, bounds, patch, bg_E_G, bg_var_G,
                             refresh_kernel)[2]


def maximize(vp0, patch, bg_E_G=None, bg_var_G=None, include_kl=True,
             config: NewtonConfig = NewtonConfig(), loc_width=1e-4,
             loc_scale=1.0, pixel_axis=None, hessian_mode="analytic",
             delta0=None, bounds_pos=None, free0=None, converged0=None):
    """Fit one source. vp0: (44,). Returns FitResult.

    delta0 / bounds_pos / free0 / converged0: warm-resume state for staged
    compaction (fit_sources_compacted) — the previous stage's final
    trust-region radius, the ORIGINAL position-box center (so resuming does
    not re-center the position bounds on the partially-optimized position),
    the previous stage's final free vector (bypassing the f32-hostile
    to_free roundtrip; when free0 is given, vp0 is ignored), and the
    previous stage's converged flag (already-converged lanes stay frozen).

    bg_E_G / bg_var_G: fixed neighbor brightness images (B, P, P); gradients
    are stopped through them.

    pixel_axis: optional mesh-axis name. When the patch tiles are sharded
    across devices along their pixel rows (the "context parallel" analog —
    ELBO is a sum over pixels, so pixel-sharding + psum of the likelihood is
    exact, SURVEY.md §5), the local likelihood is psum'ed over this axis and
    each shard runs the identical Newton iteration.

    hessian_mode: "analytic" (closed-form likelihood Hessian via batched
    pixel-moment matmuls, models/mixture_derivs.py — the fast path) or
    "structured" (AD through the render with the 6+20 bottleneck split;
    retained as the independently-derived cross-check, and exercised
    against "analytic" in tests/test_structured_hessian.py).
    """
    if bg_E_G is not None:
        bg_E_G = jax.lax.stop_gradient(bg_E_G)
    if bg_var_G is not None:
        bg_var_G = jax.lax.stop_gradient(bg_var_G)

    bounds = _make_bounds(vp0[ids.pos] if bounds_pos is None else bounds_pos,
                          loc_width, loc_scale)
    if free0 is None:
        vp_c = bijectors.enforce(vp0, bounds)
        free0 = bijectors.to_free(vp_c, bounds)

    def lik_of(free):
        # 2D (B, P, P) tile evaluator (vi/elbo.py), NOT _flat_likelihood:
        # TPU A/B on the 1024-lane headline bench measured the flat (P*P,)
        # trial path 11% SLOWER (493.6 vs 552.1 fits/s, identical mean
        # iters) — XLA:TPU tiles the 2D grids' moment contractions better
        # than the pre-flattened form. _flat_likelihood stays for the
        # layout A/B (benchmark/bench_elbo.py fg_flat_evals_per_sec).
        vp = bijectors.to_bound(free, bounds)
        fs0m, fs1m = source_fs_grids(vp, patch)
        E_G_s, var_G_s = moment_grids_from_fs(
            brightness_coeffs(vp), fs0m, fs1m)
        return pixel_log_likelihood(E_G_s, var_G_s, patch, bg_E_G, bg_var_G)

    def kl_of(free):
        kl = subtract_kl(bijectors.to_bound(free, bounds))
        if pixel_axis is not None:
            # Each pixel shard carries an equal share of the KL so the psums
            # below reconstruct likelihood + KL exactly once.
            kl = kl / jax.lax.axis_size(pixel_axis)
        return kl

    def neg_elbo(free):
        ll = lik_of(free)
        if include_kl:
            ll = ll + kl_of(free)
        return -ll

    def fg_raw(free):
        """(f, g) BEFORE any pixel-axis psum — shared by fg and
        fgh_analytic so trust-region rho comparisons stay bit-consistent
        between the cheap and refresh evaluators whichever grad_mode is
        active."""
        if config.grad_mode == "analytic":
            lik, g_lik = _analytic_lik_value_grad(free, bounds, patch,
                                                  bg_E_G, bg_var_G)
            if include_kl:
                kl, g_kl = jax.value_and_grad(kl_of)(free)
                return -(lik + kl), -(g_lik + g_kl)
            return -lik, -g_lik
        return jax.value_and_grad(neg_elbo)(free)

    def fg(free):
        f, g = fg_raw(free)
        if pixel_axis is not None:
            # psum the derivatives rather than the objective: psum inside
            # the differentiated function does not accumulate cotangents
            # across shards under shard_map(check_vma=False).
            f, g = jax.lax.psum((f, g), pixel_axis)
        return f, g

    def fgh_analytic(free):
        """f, g from the same evaluator family as fg; H analytic. In
        analytic grad mode the value/gradient/Hessian come out of ONE
        field pass (_analytic_lik_fgh): the VALUE is the same expression
        as fg_raw's (_band_poisson_bound on _band_flat_fields), keeping
        the trust-region rho's f comparisons consistent; the gradient
        differs from fg_raw's only in contraction order (equal to
        roundoff), which rho never compares across evaluators."""
        if config.grad_mode == "analytic":
            lik, g_lik, H_lik = _analytic_lik_fgh(
                free, bounds, patch, bg_E_G, bg_var_G,
                config.refresh_kernel)
            f, g, H = -lik, -g_lik, -H_lik
            if include_kl:
                kl, g_kl = jax.value_and_grad(kl_of)(free)
                f, g = f - kl, g - g_kl
                H = H - jax.hessian(kl_of)(free)
        else:
            f, g = fg_raw(free)
            H = -_analytic_lik_hessian(free, bounds, patch, bg_E_G,
                                       bg_var_G, config.refresh_kernel)
            if include_kl:
                H = H - jax.hessian(kl_of)(free)
        if pixel_axis is not None:
            f, g, H = jax.lax.psum((f, g, H), pixel_axis)
        return f, g, H

    def fgh(free):
        """Structured ELBO Hessian.

        A generic jax.hessian pushes 41 forward tangents through the pixel
        render (~90x the gradient cost). But the likelihood touches the
        pixel grids only through free[0:6] (the density grids) and the 20
        brightness coefficients C — per pixel the moments are LINEAR in C.
        So: exact rows for the 6 shape dims (6 tangents through the render),
        the 26x26 brightness block via the C bottleneck (20 tangents of
        pixel math that never re-renders), and the KL Hessian on the side
        (scalar graph, no pixels). ~5x cheaper at f64-exact parity
        (tests/test_structured_hessian.py).
        """
        f, g = jax.value_and_grad(neg_elbo)(free)

        # (41, 6) rows of the likelihood Hessian for the shape dims.
        def grad_lik(s6):
            return jax.grad(lik_of)(free.at[:N_SHAPE].set(s6))
        H_s = jax.jacfwd(grad_lik)(free[:N_SHAPE])

        # Brightness block through C: likelihood(C) with frozen grids.
        vp = bijectors.to_bound(free, bounds)
        fs0m, fs1m = jax.lax.stop_gradient(source_fs_grids(vp, patch))

        def lik_of_C(C):
            E_G_s, var_G_s = moment_grids_from_fs(C, fs0m, fs1m)
            return pixel_log_likelihood(E_G_s, var_G_s, patch,
                                        bg_E_G, bg_var_G)

        def C_of(free):
            return brightness_coeffs(bijectors.to_bound(free, bounds))

        C0 = C_of(free)
        gC = jax.grad(lik_of_C)(C0)                       # (20,)
        H_CC = jax.hessian(lik_of_C)(C0)                  # (20, 20)
        J_C = jax.jacfwd(C_of)(free)                      # (20, 41)
        T_C = jax.hessian(C_of)(free)                     # (20, 41, 41)
        # J_C/T_C vanish on the shape and k dims, so H_bb only fills the
        # brightness block; chain rule: J'HJ + sum_k gC_k * Hess(C_k).
        H_bb = J_C.T @ (H_CC @ J_C) + jnp.tensordot(gC, T_C, axes=1)

        H_lik = H_bb.at[:, :N_SHAPE].set(H_s).at[:N_SHAPE, :].set(H_s.T)
        H = -H_lik
        if include_kl:
            H = H - jax.hessian(kl_of)(free)
        if pixel_axis is not None:
            f, g, H = jax.lax.psum((f, g, H), pixel_axis)
        return f, g, H

    state = minimize_newton_tr(
        fgh_analytic if hessian_mode == "analytic" else fgh,
        free0, config, fg=fg, delta0=delta0, converged0=converged0)
    vp_opt = bijectors.to_bound(state.x, bounds)
    return FitResult(vp=vp_opt, elbo=-state.f, iters=state.iters,
                     f_calls=state.f_calls, converged=state.converged,
                     delta=state.delta, free=state.x)


@partial(jax.jit, static_argnames=("include_kl", "config", "hessian_mode"))
def fit_sources(vp0s, patches, bg_E_G=None, bg_var_G=None, include_kl=True,
                config: NewtonConfig = NewtonConfig(),
                hessian_mode="analytic", delta0=None, bounds_pos=None,
                free0=None, converged0=None):
    """Batched fits: vp0s (S, 44), patches SkyPatch with leading S axis,
    optional bg images (S, B, P, P). Returns FitResult with leading S axis.

    delta0 (S,) / bounds_pos (S, 2) / free0 (S, 41) / converged0 (S,):
    warm-resume state, see maximize."""
    fit = partial(maximize, include_kl=include_kl, config=config,
                  hessian_mode=hessian_mode)
    if (delta0 is None and bounds_pos is None and free0 is None
            and converged0 is None):
        if bg_E_G is None:
            return jax.vmap(lambda v, p: fit(v, p))(vp0s, patches)
        return jax.vmap(fit)(vp0s, patches, bg_E_G, bg_var_G)
    if bg_E_G is None:
        return jax.vmap(lambda v, p, d, bp, fr, cv: fit(
            v, p, delta0=d, bounds_pos=bp, free0=fr, converged0=cv))(
            vp0s, patches, delta0, bounds_pos, free0, converged0)
    return jax.vmap(lambda v, p, bE, bV, d, bp, fr, cv: fit(
        v, p, bE, bV, delta0=d, bounds_pos=bp, free0=fr, converged0=cv))(
        vp0s, patches, bg_E_G, bg_var_G, delta0, bounds_pos, free0,
        converged0)


def fit_sources_compacted(vp0s, patches, bg_E_G=None, bg_var_G=None, *,
                          include_kl=True, config: NewtonConfig = NewtonConfig(),
                          hessian_mode="analytic", stage1_refreshes=10,
                          min_bucket=64, stage2_hess_every=None):
    """Batched fits with convergence compaction (host-driven, two stages).

    A vmapped while_loop runs the whole batch until its SLOWEST lane
    converges; with the measured per-source spread (p50 ~55 vs max ~90 TR
    steps per fit) the late refresh cycles — each costing a batched eigh +
    full-batch renders — run mostly for already-converged lanes. So: run
    `stage1_refreshes` Hessian-refresh cycles on the full batch, then gather
    the unconverged lanes into a power-of-two bucket (padded by repeating
    unconverged lanes, which finish exactly when their originals do) and
    finish only those, warm-resuming each lane's trust-region radius and
    keeping the ORIGINAL position-box centers. The stage-2 launch reuses the
    same compiled program family at a smaller batch size.

    Exact per-lane semantics: identical to fit_sources (the refresh boundary
    at which stage 2 resumes is a boundary the single-call loop also hits) —
    unless stage2_hess_every is set, which stretches the Hessian-refresh
    period for the stage-2 tail only. Measured at stage2_hess_every=9 on
    the headline bench: +9% throughput (520 -> 567 fits/s), median ELBO
    delta exactly 0, but 2/512 star-galaxy type flips (one a -4.2 nat
    regression) — the stage-2 stragglers are precisely the hard multimodal
    lanes, so basin selection is NOT always finished by stage 1. Off by
    default: classification accuracy is the science output.
    """
    S = vp0s.shape[0]
    stage1 = min(stage1_refreshes, config.max_iters)
    cfg1 = config._replace(max_iters=stage1)
    res1 = fit_sources(vp0s, patches, bg_E_G, bg_var_G,
                       include_kl=include_kl, config=cfg1,
                       hessian_mode=hessian_mode)
    conv = np.asarray(res1.converged)
    rem = config.max_iters - stage1
    if rem <= 0 or conv.all():
        return res1

    idx = np.nonzero(~conv)[0]
    n = idx.size
    bucket = max(min_bucket, 1 << int(n - 1).bit_length())
    if bucket >= S:
        # nothing to gain — finish the full batch in place
        idx = np.arange(S)
        n, bucket = S, S
    pad = idx[np.arange(bucket - n) % n] if bucket > n else idx[:0]
    idx_p = np.concatenate([idx, pad])

    sub = lambda a: None if a is None else jax.tree.map(
        lambda x: x[idx_p], a)
    cfg2 = config._replace(max_iters=rem)
    if stage2_hess_every is not None:
        cfg2 = cfg2._replace(hess_every=stage2_hess_every)
    # converged0 matters only for the bucket >= S in-place path, where
    # already-converged lanes are re-submitted: without it they would
    # restart with converged=False and burn at least one more full refresh
    # cycle (and drift from the single-call semantics).
    res2 = fit_sources(sub(res1.vp), sub(patches), sub(bg_E_G),
                       sub(bg_var_G), include_kl=include_kl, config=cfg2,
                       hessian_mode=hessian_mode,
                       delta0=res1.delta[idx_p],
                       bounds_pos=vp0s[idx_p][:, ids.pos],
                       free0=res1.free[idx_p],
                       converged0=res1.converged[idx_p])

    # On-device scatters: a host-side merge would cost one blocking
    # device->host round trip per field, and over a tunneled TPU those RTTs
    # erase the compaction win. The only host sync in this driver is the
    # stage-1 convergence mask above.
    jidx = jnp.asarray(idx)

    def merge(a1, a2, accumulate=False):
        a2 = a2[:n]
        return a1.at[jidx].add(a2) if accumulate else a1.at[jidx].set(a2)

    return FitResult(
        vp=merge(res1.vp, res2.vp),
        elbo=merge(res1.elbo, res2.elbo),
        iters=merge(res1.iters, res2.iters, accumulate=True),
        f_calls=merge(res1.f_calls, res2.f_calls, accumulate=True),
        converged=merge(res1.converged, res2.converged),
        delta=merge(res1.delta, res2.delta),
        free=merge(res1.free, res2.free),
    )
