"""Analytic first/second derivatives of Gaussian-mixture pixel renders.

TPU-native counterpart of the reference's hand-derived bivariate-normal
derivative engine (BivariateNormals.jl:208-404 `eval_bvn_pdf!` /
`get_bvn_derivs!` / `GalaxySigmaDerivs`, and model/fsm_util.jl:255-346
`accum_galaxy_pos!`). The reference accumulates per-pixel scalar derivative
structs in nested loops; here the same math is reorganized so the whole
Hessian contraction becomes one batched (C, 6, N) x (C, N, 6) moment matmul
per mixture — MXU work instead of 40+ AD tangent passes through the render
(which is what `jax.hessian` costs and what dominated fit wall time).

Math. A component's density is g = w * N(x; mu, Sigma). With l = Lam (x-mu),
Lam = Sigma^-1, every derivative of log g with respect to the internal
parameters eta = (mu_1, mu_2, s_11, s_12, s_22, log w) is a polynomial of
degree <= 2 in (l_1, l_2):

    dlog g/dmu        = l
    dlog g/ds_ab      = vech[ (l l' - Lam) ] (off-diagonal counted once)
    d2log g/dmu dmu   = -Lam
    d2log g/dmu ds_e  = G_e l,             G_e = -Lam E_e
    d2log g/ds ds_e   = vech[ (G_e ll' + ll' G_e' + Lam E_e Lam) / 2 ]
                        (E_e the symmetric basis matrix of s_e)

so dg/deta = g * Dlog and d2g/deta2 = g (Dlog Dlog' + D2log) have entries
g * poly(l) of degree <= 4, and any weight-field-contracted Hessian
    Hc = sum_px W(px) d2 fs/dtheta2,    fs = sum_c g_c
reduces to pixel moments M_c = sum_px W g_c b b' of the degree-2 basis
b = [1, l1, l2, l1^2, l1 l2, l2^2] — a single batched matmul — composed with
constant per-component chain matrices d eta/d theta (theta = the 6 scene
parameters pos(2), gal_frac_dev, gal_axis_ratio, gal_angle, gal_radius_px).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .bvn import get_bvn_cov
from .params import GAL_ETA, GAL_NU, GAL_IS_DEV

TWO_PI = 6.283185307179586

# eta indexing
MU1, MU2, S11, S12, S22, LOGW = range(6)
# theta indexing (bound vp[0:6])
POS1, POS2, FDEV, AXIS, ANGLE, RADIUS = range(6)


def vech_cov_chain(axis_ratio, angle, radius):
    """A = d vech(XiXi)/d(axis_ratio, angle, radius) (3, 3) and the second
    derivative T (3, 3, 3): pixel-free, so plain AD is the cheap and safe
    way to get them (replaces GalaxySigmaDerivs' hand-coded tensor,
    BivariateNormals.jl:331-404)."""

    def vech(qtr):
        c = get_bvn_cov(qtr[0], qtr[1], qtr[2])
        return jnp.stack([c[0, 0], c[0, 1], c[1, 1]])

    qtr = jnp.stack([axis_ratio, angle, radius])
    A = jax.jacfwd(vech)(qtr)
    T = jax.jacfwd(jax.jacfwd(vech))(qtr)
    return A, T


def eta_basis_rows(L00, L01, L11):
    """R: eta-derivative coefficients in the degree-2 basis
    b = [1, l1, l2, l1^2, l1*l2, l2^2], per component — (C, 6eta, 6b).
    Built with stacks, not .at[] scatters — under the (S, B) vmaps each
    scatter lowers to a slow dynamic-update-slice per instance."""
    zc = jnp.zeros_like(L00)
    oc = jnp.ones_like(L00)
    half = 0.5 * oc
    return jnp.stack([
        jnp.stack([zc, oc, zc, zc, zc, zc], -1),            # d/dmu1
        jnp.stack([zc, zc, oc, zc, zc, zc], -1),            # d/dmu2
        jnp.stack([-0.5 * L00, zc, zc, half, zc, zc], -1),  # d/ds11
        jnp.stack([-L01, zc, zc, zc, oc, zc], -1),          # d/ds12
        jnp.stack([-0.5 * L11, zc, zc, zc, zc, half], -1),  # d/ds22
        jnp.stack([oc, zc, zc, zc, zc, zc], -1),            # d/dlogw
    ], axis=1)                                              # (C, 6, 6)


# Flat order of the 15 distinct degree-<=4 pixel moments
# m_ab = sum_px w g l1^a l2^b:
#   [m00, m10, m01, m20, m11, m02, m30, m21, m12, m03,
#    m40, m31, m22, m13, m04]
# and the (6, 6) basis-moment matrix M[i, j] = sum w g b_i b_j as indices
# into that flat vector (b the degree-2 basis above).
MOMENT_IDX = np.asarray([
    [0, 1, 2, 3, 4, 5],
    [1, 3, 4, 6, 7, 8],
    [2, 4, 5, 7, 8, 9],
    [3, 6, 7, 10, 11, 12],
    [4, 7, 8, 11, 12, 13],
    [5, 8, 9, 12, 13, 14],
])


def moment_matrix(m15):
    """(..., C, 15) flat moments -> (..., C, 6, 6) symmetric basis-moment
    matrices (see MOMENT_IDX). Built with static slices + stacks, not
    m15[..., MOMENT_IDX] — a fancy-index lowers to an XLA gather, which
    is slow on TPU for these shapes."""
    cols = [m15[..., k] for k in range(15)]
    return jnp.stack([jnp.stack([cols[i] for i in row], axis=-1)
                      for row in MOMENT_IDX], axis=-2)


def hess_from_moments(M, L00, L01, L11, P, chain, chain2):
    """Weight-contracted shape-Hessian of one mixture from its per-component
    basis-moment matrices — the assembly tail of mixture_value_jac_hess,
    shared with the fused Pallas refresh kernel (ops/pallas_refresh.py),
    whose kernel emits the moments and leaves this tiny per-component
    contraction to XLA.

    M: (C, 6, 6) W-weighted basis moments; L00/L01/L11: (C,) precision
    entries; P: (C, 6theta, 6b) chain-composed basis coefficients;
    chain: (C, 6eta, 6theta); chain2: (C, 6eta, 6theta, 6theta).
    Returns Hc (6, 6) = sum_px W d2 fs/dtheta2.
    """
    dtype = M.dtype
    C = M.shape[0]

    # Term 1: sum wh g Dtheta Dtheta' = P M P'.
    H = jnp.einsum("ctb,cbd,cud->tu", P, M, P)

    # Term 2: chain' D2M chain with D2M = sum wh g D2log (eta-space).
    Lam = jnp.stack([jnp.stack([L00, L01], -1),
                     jnp.stack([L01, L11], -1)], -2)               # (C,2,2)
    m0 = M[:, 0, 0]                                                # (C,)
    m1 = M[:, 0, 1:3]                                              # (C,2)
    M2 = jnp.stack([jnp.stack([M[:, 1, 1], M[:, 1, 2]], -1),
                    jnp.stack([M[:, 1, 2], M[:, 2, 2]], -1)], -2)  # (C,2,2)

    E = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]],
                     [[0.0, 1.0], [1.0, 0.0]],
                     [[0.0, 0.0], [0.0, 1.0]]], dtype)             # (3,2,2)
    G = -jnp.einsum("cax,exy->ceay", Lam, E)                       # (C,3,2,2)
    LEL = jnp.einsum("cax,exy,cyb->ceab", Lam, E, Lam)             # (C,3,2,2)

    mu_s = jnp.einsum("ceay,cy->cae", G, m1)                       # (C,2,3)
    GM2 = jnp.einsum("ceay,cyb->ceab", G, M2)
    Vs = 0.5 * (GM2 + jnp.swapaxes(GM2, -1, -2)
                + m0[:, None, None, None] * LEL)                   # (C,3,2,2)

    ss = jnp.stack([Vs[:, :, 0, 0], 2.0 * Vs[:, :, 0, 1], Vs[:, :, 1, 1]],
                   1)                                              # (C,3row,3col)
    z21 = jnp.zeros((C, 2, 1), dtype)
    z31 = jnp.zeros((C, 3, 1), dtype)
    z16 = jnp.zeros((C, 1, 6), dtype)
    D2M = jnp.concatenate([
        jnp.concatenate([-Lam * m0[:, None, None], mu_s, z21], -1),
        jnp.concatenate([jnp.swapaxes(mu_s, -1, -2), ss, z31], -1),
        z16,
    ], axis=1)                                                     # (C, 6, 6)
    H = H + jnp.einsum("cat,cab,cbu->tu", chain, D2M, chain)

    # Term 3: sum wh g Dlog_a (d2 eta_a/dtheta2).
    DlogM = jnp.stack([
        m1[:, 0], m1[:, 1],
        0.5 * (M2[:, 0, 0] - L00 * m0),
        M2[:, 0, 1] - L01 * m0,
        0.5 * (M2[:, 1, 1] - L11 * m0),
        m0], 1)                                                    # (C,6eta)
    return H + jnp.einsum("ca,catu->tu", DlogM, chain2)


def mixture_values(x1, x2, means, covs, weights, *_unused):
    """Value-only mixture render on flat pixel coords: (N,)."""
    c00, c01, c11 = covs[:, 0, 0], covs[:, 0, 1], covs[:, 1, 1]
    det = c00 * c11 - c01 * c01
    inv_det = 1.0 / det
    L00, L01, L11 = c11 * inv_det, -c01 * inv_det, c00 * inv_det
    z = weights / (TWO_PI * jnp.sqrt(det))
    d1 = x1[None, :] - means[:, 0, None]
    d2 = x2[None, :] - means[:, 1, None]
    l1 = L00[:, None] * d1 + L01[:, None] * d2
    l2 = L01[:, None] * d1 + L11[:, None] * d2
    return jnp.sum(z[:, None] * jnp.exp(-0.5 * (d1 * l1 + d2 * l2)), axis=0)


def mixture_value_jac_hess(x1, x2, means, covs, weights, chain, chain2, wh):
    """Value, shape-jacobian, and weight-contracted shape-Hessian of a
    Gaussian-mixture render.

    x1, x2: (N,) pixel coordinates.
    means: (C, 2); covs: (C, 2, 2); weights: (C,) mixture weights w (the
        1/(2 pi sqrt det) normalizer is applied internally).
    chain: (C, 6, 6) d eta_a / d theta_t per component.
    chain2: (C, 6, 6, 6) d2 eta_a / d theta d theta' (zeros where linear).
    wh: (N,) weight field for the Hessian contraction.

    Returns (fs (N,), J (6, N), Hc (6, 6)) with
        fs = sum_c g_c,   J = d fs/d theta,   Hc = sum_px wh d2 fs/d theta2.
    """
    dtype = x1.dtype
    c00, c01, c11 = covs[:, 0, 0], covs[:, 0, 1], covs[:, 1, 1]
    det = c00 * c11 - c01 * c01
    inv_det = 1.0 / det
    L00 = c11 * inv_det
    L01 = -c01 * inv_det
    L11 = c00 * inv_det
    z = weights / (TWO_PI * jnp.sqrt(det))

    d1 = x1[None, :] - means[:, 0, None]            # (C, N)
    d2 = x2[None, :] - means[:, 1, None]
    l1 = L00[:, None] * d1 + L01[:, None] * d2
    l2 = L01[:, None] * d1 + L11[:, None] * d2
    quad = d1 * l1 + d2 * l2
    g = z[:, None] * jnp.exp(-0.5 * quad)           # (C, N)
    fs = jnp.sum(g, axis=0)

    p20, p11, p02 = l1 * l1, l1 * l2, l2 * l2

    R = eta_basis_rows(L00, L01, L11)                       # (C, 6eta, 6b)

    # P: theta-derivative coefficients in the b basis, (C, 6theta, 6b).
    P = jnp.einsum("cat,cab->ctb", chain, R)

    one = jnp.ones_like(l1)
    bpoly = jnp.stack([one, l1, l2, p20, p11, p02], 1)   # (C, 6b, N)
    J = jnp.einsum("ctb,cbn->tn", P, g[:, None, :] * bpoly)

    # Degree-4 pixel moments m_ab = sum_n wh g l1^a l2^b as 15 fused
    # reductions — cheaper than a (C, 6, N) x (C, N, 6) moment matmul,
    # whose operands would be materialized to HBM (~30x the traffic).
    wg = wh[None, :] * g
    def msum(t):
        return jnp.sum(wg * t, axis=-1)
    m00 = jnp.sum(wg, axis=-1)
    m10, m01 = msum(l1), msum(l2)
    m20, m11, m02 = msum(p20), msum(p11), msum(p02)
    m30, m21 = msum(p20 * l1), msum(p20 * l2)
    m12, m03 = msum(l1 * p02), msum(p02 * l2)
    m40, m31 = msum(p20 * p20), msum(p20 * p11)
    m22, m13, m04 = msum(p20 * p02), msum(p11 * p02), msum(p02 * p02)
    M = jnp.stack([
        jnp.stack([m00, m10, m01, m20, m11, m02], -1),
        jnp.stack([m10, m20, m11, m30, m21, m12], -1),
        jnp.stack([m01, m11, m02, m21, m12, m03], -1),
        jnp.stack([m20, m30, m21, m40, m31, m22], -1),
        jnp.stack([m11, m21, m12, m31, m22, m13], -1),
        jnp.stack([m02, m12, m03, m22, m13, m04], -1),
    ], axis=1)                                      # (C, 6b, 6b)

    H = hess_from_moments(M, L00, L01, L11, P, chain, chain2)
    return fs, J, H


def mixture_grad_contract(x1, x2, means, covs, weights, chain, _chain2, w):
    """Weight-contracted shape-gradient of a mixture render:
    g_theta = sum_px w(px) d fs/d theta, via the degree-<=2 moment subset
    of mixture_value_jac_hess (6 weighted pixel reductions per component
    instead of the Hessian's 15 — the analytic fg evaluator's engine).

    Same math as contracting J from mixture_value_jac_hess with w:
    J @ w = P . (sum_n w g b), b the degree-2 basis. Returns (6,).
    """
    c00, c01, c11 = covs[:, 0, 0], covs[:, 0, 1], covs[:, 1, 1]
    det = c00 * c11 - c01 * c01
    inv_det = 1.0 / det
    L00, L01, L11 = c11 * inv_det, -c01 * inv_det, c00 * inv_det
    z = weights / (TWO_PI * jnp.sqrt(det))
    d1 = x1[None, :] - means[:, 0, None]
    d2 = x2[None, :] - means[:, 1, None]
    l1 = L00[:, None] * d1 + L01[:, None] * d2
    l2 = L01[:, None] * d1 + L11[:, None] * d2
    g = z[:, None] * jnp.exp(-0.5 * (d1 * l1 + d2 * l2))

    wg = w[None, :] * g
    m00 = jnp.sum(wg, axis=-1)
    m10 = jnp.sum(wg * l1, axis=-1)
    m01 = jnp.sum(wg * l2, axis=-1)
    m20 = jnp.sum(wg * l1 * l1, axis=-1)
    m11 = jnp.sum(wg * l1 * l2, axis=-1)
    m02 = jnp.sum(wg * l2 * l2, axis=-1)
    m = jnp.stack([m00, m10, m01, m20, m11, m02], -1)       # (C, 6b)

    P = jnp.einsum("cat,cab->ctb", chain, eta_basis_rows(L00, L01, L11))
    return jnp.einsum("ctb,cb->t", P, m)


def star_mixture(theta6, psf_b, wcs_jacobian, world_center, pixel_center):
    """Star = PSF mixture at the source position. Returns (means (K,2),
    covs (K,2,2), weights (K,), chain (K,6,6), chain2 (K,6,6,6))."""
    from .fsm import linear_world_to_pix
    from .psf import psf_alphas, psf_covs, psf_mus

    dtype = psf_b.dtype
    m_pos = linear_world_to_pix(wcs_jacobian, world_center, pixel_center,
                                theta6[0:2])
    means = psf_mus(psf_b) + m_pos[None, :]
    covs = psf_covs(psf_b)
    weights = psf_alphas(psf_b)
    K = means.shape[0]
    mu_rows = jnp.concatenate([wcs_jacobian, jnp.zeros((2, 4), dtype)], -1)
    chain = jnp.broadcast_to(
        jnp.concatenate([mu_rows, jnp.zeros((4, 6), dtype)], 0),
        (K, 6, 6))
    chain2 = jnp.zeros((K, 6, 6, 6), dtype)
    return means, covs, weights, chain, chain2


def galaxy_mixture(theta6, psf_b, wcs_jacobian, world_center, pixel_center):
    """Galaxy = PSF x (8 de Vaucouleurs + 6 exponential) profile mixture
    (model/fsm_util.jl:111-169). Returns (means, covs, weights, chain,
    chain2) with C = K * 14 components."""
    from .fsm import linear_world_to_pix
    from .psf import psf_alphas, psf_covs, psf_mus

    dtype = psf_b.dtype
    frac_dev = theta6[FDEV]
    m_pos = linear_world_to_pix(wcs_jacobian, world_center, pixel_center,
                                theta6[0:2])

    eta = jnp.asarray(GAL_ETA, dtype)          # (14,)
    nu = jnp.asarray(GAL_NU, dtype)            # (14,)
    is_dev = jnp.asarray(GAL_IS_DEV, dtype)    # (14,)
    frac = is_dev * frac_dev + (1.0 - is_dev) * (1.0 - frac_dev)
    dlogw_dfd = (2.0 * is_dev - 1.0) / frac    # d log f_c / d frac_dev

    a = psf_alphas(psf_b)                      # (K,)
    mu = psf_mus(psf_b)                        # (K,2)
    cv = psf_covs(psf_b)                       # (K,2,2)
    K, n_gal = mu.shape[0], eta.shape[0]

    XiXi = get_bvn_cov(theta6[AXIS], theta6[ANGLE], theta6[RADIUS])
    A, T = vech_cov_chain(theta6[AXIS], theta6[ANGLE], theta6[RADIUS])

    weights = (a[:, None] * (eta * frac)[None, :]).reshape(-1)
    covs = (cv[:, None] + nu[None, :, None, None] * XiXi[None, None]
            ).reshape(-1, 2, 2)
    means = jnp.broadcast_to((mu + m_pos[None, :])[:, None, :],
                             (K, n_gal, 2)).reshape(-1, 2)

    C = K * n_gal
    nu_flat = jnp.broadcast_to(nu[None, :], (K, n_gal)).reshape(-1)
    dlw = jnp.broadcast_to(dlogw_dfd[None, :], (K, n_gal)).reshape(-1)

    # chain rows (scatter-free): mu rows const, s rows = [0(3,3) | nu A],
    # logw row = dlw at the frac_dev column.
    mu_rows = jnp.broadcast_to(
        jnp.concatenate([wcs_jacobian, jnp.zeros((2, 4), dtype)], -1),
        (C, 2, 6))
    s_rows = jnp.concatenate([
        jnp.zeros((C, 3, 3), dtype),
        nu_flat[:, None, None] * A[None, :, :]], -1)
    zc = jnp.zeros_like(dlw)
    w_row = jnp.stack([zc, zc, dlw, zc, zc, zc], -1)[:, None, :]
    chain = jnp.concatenate([mu_rows, s_rows, w_row], axis=1)

    # chain2: s rows get nu T in the (axis, angle, radius) block; logw row
    # gets -dlw^2 at (frac_dev, frac_dev); mu rows are linear (zero).
    s2 = jnp.pad(nu_flat[:, None, None, None] * T[None, :, :, :],
                 ((0, 0), (0, 0), (3, 0), (3, 0)))          # (C, 3, 6, 6)
    w2 = jnp.pad((-dlw * dlw)[:, None, None, None],
                 ((0, 0), (0, 0), (FDEV, 6 - FDEV - 1),
                  (FDEV, 6 - FDEV - 1)))                    # (C, 1, 6, 6)
    chain2 = jnp.concatenate([jnp.zeros((C, 2, 6, 6), dtype), s2, w2],
                             axis=1)
    return means, covs, weights, chain, chain2


def band_shape_derivs(theta6, psf_b, wcs_jacobian, world_center, pixel_center,
                      x1, x2, w0, w1):
    """One band's star/galaxy values, jacobians and weight-contracted shape
    Hessians. x1, x2: (N,) pixel coords; w0, w1: (N,) Hessian weight fields
    (d lik / d fs0 resp. fs1 per pixel, mask included).

    Returns (fs0 (N,), fs1 (N,), J0 (6,N), J1 (6,N), Hc0 (6,6), Hc1 (6,6)).
    """
    sm = star_mixture(theta6, psf_b, wcs_jacobian, world_center, pixel_center)
    gm = galaxy_mixture(theta6, psf_b, wcs_jacobian, world_center,
                        pixel_center)
    fs0, J0, Hc0 = mixture_value_jac_hess(x1, x2, *sm, w0)
    fs1, J1, Hc1 = mixture_value_jac_hess(x1, x2, *gm, w1)
    return fs0, fs1, J0, J1, Hc0, Hc1
