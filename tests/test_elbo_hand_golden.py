"""Hand-derived ELBO golden value — the last parity-evidence gap that
needs no Julia runtime (VERDICT round-2 item #10).

A one-active-pixel, one-PSF-component scenario in which every term of the
single-source ELBO is computed IN THIS FILE with explicit numpy/math
formulas transcribed from the reference's equations:

  * Poisson lower bound per pixel
    x*(log iota + log E[G] - Var G / (2 E[G]^2)) - iota*E[G] - lgamma(x+1)
    (deterministic_vi/elbo_objective.jl:274-392)
  * brightness moments E[l_b|a], E[l_b^2|a] from the lognormal flux +
    color chain (deterministic_vi/source_brightness.jl:27-202)
  * star density = PSF Gaussian at the pixel; galaxy density = the
    14-component profile GMM convolved with the PSF
    (model/fsm_util.jl:111-219, BivariateNormals.jl:29-43)
  * closed-form KLs: categorical, gaussian, diag-MVN vs MVN, mixed by the
    color responsibilities k (deterministic_vi/elbo_kl.jl:25-154)

No celeste_jl_tpu.vi / models.fsm / models.bvn / models.brightness function
is used on the expected side — only the pinned prior artifact and the
galaxy profile tables (parity constants, themselves golden-tested in
tests/test_golden_reference_values.py). The assertion is 1e-12 relative in
f64, closing BASELINE.md's ELBO value-parity target on a case computable
by hand.
"""

import math

import numpy as np

import jax.numpy as jnp

from celeste_jl_tpu.models.params import GAL_ETA, GAL_NU, GAL_IS_DEV, ids
from celeste_jl_tpu.models.patches import SkyPatch
from celeste_jl_tpu.vi.elbo import PRIOR, elbo

B, P = 5, 1
SIG2 = 2.25          # PSF component variance (sigma = 1.5 px, isotropic)
X_COUNT = 17.0       # observed electron count in the active pixel
SKY = 0.05           # sky background, nMgy
IOTA = 800.0         # nelec per nMgy
ACTIVE_BAND = 2      # the reference band (r)


def _make_patch():
    """One 1x1 tile per band; only band 2's single pixel is active.

    offset = (0,0) so the (1-based) pixel coordinate is (1,1); the source
    sits at world (0,0) with identity WCS and pixel_center (0.7, 1.2), so
    the pixel-center offset is dx = (0.3, -0.2) — exercising the Gaussian
    quadratic form, not just the normalizer.
    """
    pixels = np.full((B, P, P), np.nan)
    pixels[ACTIVE_BAND] = X_COUNT
    mask = np.zeros((B, P, P), dtype=bool)
    mask[ACTIVE_BAND] = True
    sky = np.full((B, P, P), SKY)
    iota = np.full((B, P, P), IOTA)
    offset = np.zeros((B, 2), dtype=np.int32)
    jac = np.tile(np.eye(2), (B, 1, 1))
    world_center = np.zeros((B, 2))
    pixel_center = np.tile(np.array([0.7, 1.2]), (B, 1))
    # K=1 PSF: [alpha, mu1, mu2, s11, s12, s22]
    psf = np.tile(np.array([[1.0, 0.0, 0.0, SIG2, 0.0, SIG2]]), (B, 1, 1))
    return SkyPatch(
        pixels=jnp.asarray(pixels), mask=jnp.asarray(mask),
        sky=jnp.asarray(sky), iota=jnp.asarray(iota),
        offset=jnp.asarray(offset), wcs_jacobian=jnp.asarray(jac),
        world_center=jnp.asarray(world_center),
        pixel_center=jnp.asarray(pixel_center), psf=jnp.asarray(psf))


def _make_vp():
    vp = np.zeros(44)
    vp[0:2] = 0.0                      # world position
    vp[ids.gal_frac_dev] = 0.4
    vp[ids.gal_axis_ratio] = 0.6
    vp[ids.gal_angle] = 0.7
    vp[ids.gal_radius_px] = 1.8
    vp[ids.flux_loc] = [1.2, 1.0]
    vp[ids.flux_scale] = [0.3, 0.2]
    cm = np.array([[0.3, -0.2], [0.1, 0.4], [-0.3, 0.2], [0.25, -0.1]])
    cv = np.array([[0.04, 0.05], [0.03, 0.06], [0.05, 0.02], [0.02, 0.03]])
    vp[ids.color_mean.ravel()] = cm.T.ravel()   # ids.color_mean is (4, 2)
    vp[ids.color_var.ravel()] = cv.T.ravel()
    vp[ids.is_star] = [0.8, 0.2]
    vp[ids.k.ravel()] = 0.125
    return vp


def _hand_elbo(vp):
    a = vp[ids.is_star]
    flux_loc, flux_scale = vp[ids.flux_loc], vp[ids.flux_scale]
    color_mean = vp[ids.color_mean]   # (4, 2)
    color_var = vp[ids.color_var]     # (4, 2)
    k = vp[ids.k]                     # (8, 2)

    # --- brightness moments in the reference band (r, index 2):
    # E[l_r] = exp(mu + s/2), E[l_r^2] = exp(2 mu + 2 s)
    # (source_brightness.jl:27-202; band 3 in 1-based Julia = index 2 here)
    E_l = np.exp(flux_loc + 0.5 * flux_scale)          # (2,)
    E_ll = np.exp(2.0 * flux_loc + 2.0 * flux_scale)   # (2,)

    # --- star density: m_pos = pixel_center + J (pos - world_center)
    # = (0.7, 1.2); pixel coordinate (1, 1) -> dx = (0.3, -0.2)
    dx = np.array([1.0 - 0.7, 1.0 - 1.2])
    r2 = dx @ dx
    fs0m = math.exp(-0.5 * r2 / SIG2) / (2.0 * math.pi * SIG2)

    # --- galaxy density: sum_j eta_j * frac_j * N(dx; 0, SIG2*I + nu_j*XiXi)
    # with XiXi = R(angle) diag(r^2, (r q)^2) R(angle)^T
    # (BivariateNormals.jl:29-43; fsm_util.jl:111-169)
    q, phi, r_px = (vp[ids.gal_axis_ratio], vp[ids.gal_angle],
                    vp[ids.gal_radius_px])
    R = np.array([[math.cos(phi), -math.sin(phi)],
                  [math.sin(phi), math.cos(phi)]])
    XiXi = R @ np.diag([r_px ** 2, (r_px * q) ** 2]) @ R.T
    fs1m = 0.0
    for eta_j, nu_j, is_dev in zip(GAL_ETA, GAL_NU, GAL_IS_DEV):
        frac = vp[ids.gal_frac_dev] if is_dev else 1.0 - vp[ids.gal_frac_dev]
        cov = SIG2 * np.eye(2) + nu_j * XiXi
        quad = dx @ np.linalg.solve(cov, dx)
        dens = math.exp(-0.5 * quad) / (
            2.0 * math.pi * math.sqrt(np.linalg.det(cov)))
        fs1m += eta_j * frac * dens

    # --- Poisson lower bound on the single active pixel
    # (elbo_objective.jl:274-392)
    E_G_s = a[0] * E_l[0] * fs0m + a[1] * E_l[1] * fs1m
    E_G2_s = a[0] * E_ll[0] * fs0m ** 2 + a[1] * E_ll[1] * fs1m ** 2
    var_G = E_G2_s - E_G_s ** 2
    E_G = SKY + E_G_s
    log_term = math.log(E_G) - var_G / (2.0 * E_G ** 2)
    lik = (X_COUNT * (math.log(IOTA) + log_term) - IOTA * E_G
           - math.lgamma(X_COUNT + 1.0))

    # --- KLs (elbo_kl.jl:25-154)
    p_star = np.asarray(PRIOR.is_star)
    kl = float(np.sum(a * (np.log(a) - np.log(p_star))))
    flux_mean = np.asarray(PRIOR.flux_mean)
    flux_var = np.asarray(PRIOR.flux_var)
    prior_k = np.asarray(PRIOR.k)                 # (8, 2)
    prior_cm = np.asarray(PRIOR.color_mean)       # (4, 8, 2)
    prior_cinv = np.asarray(PRIOR.color_cov_inv)  # (4, 4, 8, 2)
    prior_clogdet = np.asarray(PRIOR.color_cov_logdet)
    for i in range(2):
        # KL(N(mu1, v1) || N(mu2, v2))
        kl += a[i] * 0.5 * (math.log(flux_var[i]) - math.log(flux_scale[i])
                            + (flux_scale[i]
                               + (flux_loc[i] - flux_mean[i]) ** 2)
                            / flux_var[i] - 1.0)
        kl += a[i] * float(np.sum(k[:, i] * (np.log(k[:, i])
                                             - np.log(prior_k[:, i]))))
        for d in range(8):
            # KL(diag-N || N): 0.5 [tr(S2^-1 V1) - 4 + dmu' S2^-1 dmu
            #                       + logdet S2 - sum log v1]
            dmu = prior_cm[:, d, i] - color_mean[:, i]
            inv2 = prior_cinv[:, :, d, i]
            term = (float(np.sum(np.diagonal(inv2) * color_var[:, i])) - 4.0
                    + float(dmu @ inv2 @ dmu) + prior_clogdet[d, i]
                    - float(np.sum(np.log(color_var[:, i]))))
            kl += a[i] * k[d, i] * 0.5 * term

    # point-mass log prior on gal_radius_px
    x = vp[ids.gal_radius_px]
    e_log_prob = -0.5 * (math.log(2.0 * math.pi)
                         + math.log(PRIOR.gal_radius_px_var)
                         + (x - PRIOR.gal_radius_px_mean) ** 2
                         / PRIOR.gal_radius_px_var)
    return lik, -kl + e_log_prob


def test_elbo_matches_hand_derivation():
    vp = _make_vp()
    patch = _make_patch()
    got = float(elbo(jnp.asarray(vp), patch))
    lik, kl_part = _hand_elbo(vp)
    want = lik + kl_part
    assert math.isfinite(want)
    assert abs(got - want) <= 1e-12 * abs(want), (got, want)


def test_elbo_likelihood_only_matches_hand_derivation():
    """The likelihood piece alone (include_kl=False) must match too, pinning
    the likelihood/KL split and not just their sum."""
    vp = _make_vp()
    patch = _make_patch()
    got = float(elbo(jnp.asarray(vp), patch, include_kl=False))
    lik, _ = _hand_elbo(vp)
    assert abs(got - lik) <= 1e-12 * abs(lik), (got, lik)
