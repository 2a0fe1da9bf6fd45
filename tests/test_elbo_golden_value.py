"""Hand-derived golden ELBO value on a one-active-pixel patch.

The last parity-evidence gap that needs no Julia runtime: the Poisson
lower bound and every closed-form KL are computed INDEPENDENTLY here in
plain numpy/scipy, written directly from the reference's formulas —

  * per-pixel bound  x*(log iota + log E[G] - Var G/(2 E[G]^2)) - iota*E[G]
    - lgamma(x+1)                       (elbo_objective.jl:274-392)
  * star density     = PSF Gaussian mixture at the source position
                                        (fsm_util.jl:225-248)
  * galaxy density   = PSF (x) profile-GMM convolution: covariances
    psf_cov + nu_j * XiXi, weights alpha_k*eta_j*frac_j
                                        (fsm_util.jl:29-169)
  * brightness moments: lognormal r-band flux chained multiplicatively
    through the colors                  (source_brightness.jl:18-193)
  * KLs: categorical, gaussian, diag-MVN-vs-MVN, mixed over k, plus the
    gal-radius point-mass log prior     (elbo_kl.jl:25-154)

— and asserted against vi/elbo to 1e-12 in f64. Only CONSTANT TABLES are
imported from the package (galaxy profile GMM, priors); every formula below
is its own numpy implementation, no jax.
"""

import numpy as np
from scipy.special import gammaln

from celeste_jl_tpu.models.params import GAL_ETA, GAL_IS_DEV, GAL_NU, ids
from celeste_jl_tpu.models.patches import SkyPatch
from celeste_jl_tpu.models.priors import prior

B, P, K = 5, 4, 2
ACTIVE_BAND, AI, AJ = 2, 1, 2        # one active pixel: band r, row 1, col 2
X_COUNT, IOTA, SKY = 17.0, 3.0, 0.2
PIX_CENTER = np.array([2.4, 2.7])    # 1-based; active pixel coords = (2, 3)


def _vp():
    vp = np.zeros(44)
    vp[ids.pos] = [2.6, 2.9]
    vp[ids.gal_frac_dev] = 0.4
    vp[ids.gal_axis_ratio] = 0.7
    vp[ids.gal_angle] = 0.618
    vp[ids.gal_radius_px] = 1.8
    vp[ids.flux_loc] = [1.3, 0.9]
    vp[ids.flux_scale] = [0.2, 0.3]
    vp[ids.color_mean] = np.array([[0.3, -0.2], [0.1, 0.4],
                                   [-0.15, 0.25], [0.05, -0.1]])
    vp[ids.color_var] = np.array([[0.11, 0.21], [0.12, 0.22],
                                  [0.13, 0.23], [0.14, 0.24]])
    vp[ids.is_star] = [0.3, 0.7]
    k = np.arange(1.0, 17.0).reshape(8, 2)
    vp[ids.k] = k / k.sum(axis=0)
    return vp


def _psf():
    """(B, K, 6) packed [alpha, mu1, mu2, s11, s12, s22]; band-dependent."""
    psf = np.zeros((B, K, 6))
    for b in range(B):
        psf[b, 0] = [0.6, 0.0, 0.0, 1.2 + 0.01 * b, 0.1, 0.9]
        psf[b, 1] = [0.4, 0.1, -0.2, 2.0, -0.2, 2.5 + 0.02 * b]
    return psf


def _patch():
    pixels = np.zeros((B, P, P))
    pixels[ACTIVE_BAND, AI, AJ] = X_COUNT
    mask = np.zeros((B, P, P), bool)
    mask[ACTIVE_BAND, AI, AJ] = True
    return SkyPatch(
        pixels=pixels, mask=mask, sky=np.full((B, P, P), SKY),
        iota=np.full((B, P, P), IOTA),
        offset=np.zeros((B, 2), np.int32),
        wcs_jacobian=np.broadcast_to(np.eye(2), (B, 2, 2)).copy(),
        world_center=np.broadcast_to(_vp()[ids.pos], (B, 2)).copy(),
        pixel_center=np.broadcast_to(PIX_CENTER, (B, 2)).copy(),
        psf=_psf())


# --- independent numpy derivation -----------------------------------------

def _bvn(dx, cov, w):
    """w / (2 pi sqrt|cov|) * exp(-dx' cov^-1 dx / 2)."""
    det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
    inv = np.array([[cov[1, 1], -cov[0, 1]],
                    [-cov[0, 1], cov[0, 0]]]) / det
    return w / (2.0 * np.pi * np.sqrt(det)) * np.exp(
        -0.5 * dx @ inv @ dx)


def _hand_densities(vp):
    """(fs0, fs1) at the active pixel of the active band."""
    psf = _psf()[ACTIVE_BAND]
    # identity jacobian, world_center == pos => mixture center = PIX_CENTER
    x = np.array([AI + 1.0, AJ + 1.0])          # 1-based pixel coords
    fs0 = sum(_bvn(x - (psf[k, 1:3] + PIX_CENTER),
                   np.array([[psf[k, 3], psf[k, 4]],
                             [psf[k, 4], psf[k, 5]]]), psf[k, 0])
              for k in range(K))

    # galaxy shape covariance (BivariateNormals.jl:29-43)
    q, phi, s = (vp[ids.gal_axis_ratio], vp[ids.gal_angle],
                 vp[ids.gal_radius_px])
    cp, sp = np.cos(phi), np.sin(phi)
    ab = q ** 2 - 1.0
    XiXi = s ** 2 * np.array([[1.0 + ab * sp ** 2, -cp * sp * ab],
                              [-cp * sp * ab, 1.0 + ab * cp ** 2]])
    fd = vp[ids.gal_frac_dev]
    fs1 = 0.0
    for k in range(K):
        pc = np.array([[psf[k, 3], psf[k, 4]], [psf[k, 4], psf[k, 5]]])
        for j in range(len(GAL_ETA)):
            frac = fd if GAL_IS_DEV[j] else (1.0 - fd)
            fs1 += _bvn(x - (psf[k, 1:3] + PIX_CENTER),
                        pc + GAL_NU[j] * XiXi,
                        psf[k, 0] * GAL_ETA[j] * frac)
    return fs0, fs1


def _hand_brightness(vp):
    """E[l_b|i], E[l_b^2|i] (5, 2) from the lognormal color chain."""
    loc, sc = vp[ids.flux_loc], vp[ids.flux_scale]
    cm, cv = vp[ids.color_mean], vp[ids.color_var]
    E = np.zeros((5, 2))
    E2 = np.zeros((5, 2))
    E[2] = np.exp(loc + 0.5 * sc)
    E[3] = E[2] * np.exp(cm[2] + 0.5 * cv[2])
    E[4] = E[3] * np.exp(cm[3] + 0.5 * cv[3])
    E[1] = E[2] * np.exp(-cm[1] + 0.5 * cv[1])
    E[0] = E[1] * np.exp(-cm[0] + 0.5 * cv[0])
    E2[2] = np.exp(2 * loc + 2 * sc)
    E2[3] = E2[2] * np.exp(2 * cm[2] + 2 * cv[2])
    E2[4] = E2[3] * np.exp(2 * cm[3] + 2 * cv[3])
    E2[1] = E2[2] * np.exp(-2 * cm[1] + 2 * cv[1])
    E2[0] = E2[1] * np.exp(-2 * cm[0] + 2 * cv[0])
    return E, E2


def _hand_likelihood(vp):
    fs0, fs1 = _hand_densities(vp)
    E_l, E_ll = _hand_brightness(vp)
    a = vp[ids.is_star]
    b = ACTIVE_BAND
    E_G_s = a[0] * E_l[b, 0] * fs0 + a[1] * E_l[b, 1] * fs1
    E_G2_s = a[0] * E_ll[b, 0] * fs0 ** 2 + a[1] * E_ll[b, 1] * fs1 ** 2
    var_G = E_G2_s - E_G_s ** 2
    E_G = SKY + E_G_s
    return (X_COUNT * (np.log(IOTA) + np.log(E_G)
                       - var_G / (2.0 * E_G ** 2))
            - IOTA * E_G - gammaln(X_COUNT + 1.0))


def _hand_kl(vp):
    a = vp[ids.is_star]
    kl = float(np.sum(a * (np.log(a) - np.log(prior.is_star))))
    for i in range(2):
        m1, v1 = vp[ids.flux_loc][i], vp[ids.flux_scale][i]
        m2, v2 = prior.flux_mean[i], prior.flux_var[i]
        kl += a[i] * 0.5 * (np.log(v2) - np.log(v1)
                            + (v1 + (m1 - m2) ** 2) / v2 - 1.0)
        k = vp[ids.k][:, i]
        kl += a[i] * float(np.sum(k * (np.log(k)
                                       - np.log(prior.k[:, i]))))
        mu1 = vp[ids.color_mean][:, i]
        var1 = vp[ids.color_var][:, i]
        for d in range(8):
            mu2 = prior.color_mean[:, d, i]
            cov2 = prior.color_cov[:, :, d, i]
            inv2 = np.linalg.inv(cov2)
            dmu = mu2 - mu1
            kl_d = 0.5 * (np.trace(inv2 @ np.diag(var1)) - 4.0
                          + dmu @ inv2 @ dmu
                          + np.linalg.slogdet(cov2)[1]
                          - np.sum(np.log(var1)))
            kl += a[i] * k[d] * kl_d
    r = vp[ids.gal_radius_px]
    e_log_prob = -0.5 * (np.log(2.0 * np.pi)
                         + np.log(prior.gal_radius_px_var)
                         + (r - prior.gal_radius_px_mean) ** 2
                         / prior.gal_radius_px_var)
    return -kl + e_log_prob


def test_elbo_likelihood_matches_hand_derivation():
    from celeste_jl_tpu.vi.elbo import elbo_likelihood
    got = float(elbo_likelihood(_vp(), _patch()))
    want = _hand_likelihood(_vp())
    assert abs(got - want) <= 1e-12 * max(1.0, abs(want)), (got, want)


def test_kl_matches_hand_derivation():
    from celeste_jl_tpu.vi.elbo import subtract_kl
    got = float(subtract_kl(_vp()))
    want = _hand_kl(_vp())
    assert abs(got - want) <= 1e-12 * max(1.0, abs(want)), (got, want)


def test_full_elbo_is_likelihood_plus_kl():
    from celeste_jl_tpu.vi.elbo import elbo
    got = float(elbo(_vp(), _patch()))
    want = _hand_likelihood(_vp()) + _hand_kl(_vp())
    assert abs(got - want) <= 1e-12 * max(1.0, abs(want)), (got, want)
