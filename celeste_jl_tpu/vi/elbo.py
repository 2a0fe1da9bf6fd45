"""The variational ELBO on fixed-shape patch tiles.

Replaces deterministic_vi/elbo_objective.jl + elbo_kl.jl. The per-pixel loop
becomes a masked tile computation; SensitiveFloats/ReverseDiff tapes become
jax.grad / jax.hessian over the whole function.

Per pixel (band b, count x, calibration iota, sky eps, per-source densities):
    E[G]   = eps + sum_s a_s0 E[l_b|star] fs0m_s + a_s1 E[l_b|gal] fs1m_s
    E[G^2]_s and Var[G]_s from the second moments
    elbo  += x * (log iota + log E[G] - Var G / (2 E[G]^2)) - iota * E[G]
             - lgamma(x + 1)
(elbo_objective.jl:274-392.) Neighbor sources enter as precomputed
(stop-gradient) background brightness images — exactly the reference's
inactive-source path (elbo_objective.jl:33-41, 250-258).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..models.brightness import brightness_moments
from ..models.fsm import source_densities_all_bands
from ..models.params import ids
from ..models import priors as priors_mod


def source_fs_grids(vp, patch):
    """fs0m/fs1m PSF-convolved density grids for one source, (B, P, P)."""
    return source_densities_all_bands(
        vp[0:2], vp[2], vp[3], vp[4], vp[5], patch)


def brightness_coeffs(vp):
    """The 20 scalars through which the 21 brightness free params (and
    is_star) enter the likelihood: C = [a_i E[l_b|i], a_i E[l_b^2|i]]
    flattened, (20,). The per-pixel moments are then LINEAR in C given the
    density grids — the bottleneck the structured Hessian exploits
    (ops/newton + vi/optimize)."""
    E_l, E_ll = brightness_moments(vp)   # (5, 2)
    a = vp[ids.is_star]                  # (2,)
    return jnp.concatenate([(a * E_l).ravel(), (a * E_ll).ravel()])


def moment_grids_from_fs(C, fs0m, fs1m):
    """(E[G]_s, Var[G]_s) grids from the brightness coefficients C (20,)
    and the density grids (B, P, P)."""
    cl = C[:10].reshape(5, 2)
    cll = C[10:].reshape(5, 2)
    E_G_s = cl[:, 0, None, None] * fs0m + cl[:, 1, None, None] * fs1m
    E_G2_s = (cll[:, 0, None, None] * fs0m ** 2
              + cll[:, 1, None, None] * fs1m ** 2)
    return E_G_s, E_G2_s - E_G_s ** 2


def source_moment_grids(vp, patch):
    """E[G]_s and Var[G]_s images for one source on its patch tiles.

    vp: (44,). Returns (E_G_s, var_G_s), each (B, P, P). Bands are vmapped,
    not unrolled (see source_densities_all_bands).
    """
    fs0m, fs1m = source_fs_grids(vp, patch)
    return moment_grids_from_fs(brightness_coeffs(vp), fs0m, fs1m)


def pixel_log_likelihood(E_G_s, var_G_s, patch, bg_E_G=None, bg_var_G=None):
    """Masked Poisson-lower-bound log likelihood over the patch tiles, given
    the source's own moment grids (elbo_objective.jl:274-392)."""
    E_G = patch.sky + E_G_s
    var_G = var_G_s
    if bg_E_G is not None:
        E_G = E_G + bg_E_G
    if bg_var_G is not None:
        var_G = var_G + bg_var_G

    mask = patch.mask
    # Sanitize masked lanes so no NaN/inf reaches the masked-out branch
    # (jnp.where alone does not stop NaN poison in reverse-mode).
    x = jnp.where(mask, patch.pixels, 0.0)
    iota = jnp.where(mask, patch.iota, 1.0)
    E_G = jnp.where(mask, E_G, 1.0)
    var_G = jnp.where(mask, var_G, 0.0)

    log_term = jnp.log(E_G) - var_G / (2.0 * E_G ** 2)
    pix_elbo = x * (jnp.log(iota) + log_term) - iota * E_G - gammaln(x + 1.0)
    return jnp.sum(jnp.where(mask, pix_elbo, 0.0))


def elbo_likelihood(vp, patch, bg_E_G=None, bg_var_G=None):
    """Expected log likelihood of one source's active pixels.

    vp: (44,) canonical params of the active source.
    patch: per-source SkyPatch with (B, P, P) tiles.
    bg_E_G, bg_var_G: optional (B, P, P) brightness of fixed neighbor
        sources (values only — pass through jax.lax.stop_gradient upstream).
    """
    E_G_s, var_G_s = source_moment_grids(vp, patch)
    return pixel_log_likelihood(E_G_s, var_G_s, patch, bg_E_G, bg_var_G)


# ---------------------------------------------------------------------------
# KL divergences (closed forms, elbo_kl.jl:25-154)
# ---------------------------------------------------------------------------

class PriorConstants:
    """Prior values packed as JAX constants (with precomputed inverses and
    log-dets for the color GMM covariances)."""

    def __init__(self, prior=None):
        import numpy as np
        p = prior or priors_mod.prior
        self.is_star = jnp.asarray(p.is_star)
        self.flux_mean = jnp.asarray(p.flux_mean)
        self.flux_var = jnp.asarray(p.flux_var)
        self.k = jnp.asarray(p.k)                    # (8, 2)
        self.color_mean = jnp.asarray(p.color_mean)  # (4, 8, 2)
        cov = np.asarray(p.color_cov)                # (4, 4, 8, 2)
        inv = np.zeros_like(cov)
        logdet = np.zeros((8, 2))
        for d in range(8):
            for i in range(2):
                inv[:, :, d, i] = np.linalg.inv(cov[:, :, d, i])
                logdet[d, i] = np.linalg.slogdet(cov[:, :, d, i])[1]
        self.color_cov_inv = jnp.asarray(inv)
        self.color_cov_logdet = jnp.asarray(logdet)
        self.gal_radius_px_mean = p.gal_radius_px_mean
        self.gal_radius_px_var = p.gal_radius_px_var


PRIOR = PriorConstants()


def categorical_kl(p, q):
    return jnp.sum(p * (jnp.log(p) - jnp.log(q)))


def gaussian_kl(mu1, var1, mu2, var2):
    return 0.5 * (jnp.log(var2) - jnp.log(var1)
                  + (var1 + (mu1 - mu2) ** 2) / var2 - 1.0)


def diagmvn_mvn_kl(mu1, var1, mu2, inv_cov2, logdet_cov2):
    """KL(diag-MVN || MVN) with precomputed inverse/logdet of the second."""
    dmu = mu2 - mu1
    kl = jnp.sum(jnp.diagonal(inv_cov2) * var1) - mu1.shape[0]
    kl += dmu @ (inv_cov2 @ dmu)
    kl += logdet_cov2 - jnp.sum(jnp.log(var1))
    return 0.5 * kl


def subtract_kl(vp, prior: PriorConstants = PRIOR):
    """Negative KL(q || prior) for one source plus the point-mass log prior
    on gal_radius_px (elbo_kl.jl:143-154). Added to the likelihood."""
    a = vp[ids.is_star]
    flux_loc = vp[ids.flux_loc]
    flux_scale = vp[ids.flux_scale]
    color_mean = vp[ids.color_mean]  # (4, 2)
    color_var = vp[ids.color_var]    # (4, 2)
    k = vp[ids.k]                    # (8, 2)

    kl = categorical_kl(a, prior.is_star)
    for i in range(2):
        kl += a[i] * gaussian_kl(flux_loc[i], flux_scale[i],
                                 prior.flux_mean[i], prior.flux_var[i])
        kl += a[i] * categorical_kl(k[:, i], prior.k[:, i])
        per_comp = jax.vmap(
            lambda d, i=i: diagmvn_mvn_kl(
                color_mean[:, i], color_var[:, i], prior.color_mean[:, d, i],
                prior.color_cov_inv[:, :, d, i],
                prior.color_cov_logdet[d, i]))(jnp.arange(8))
        kl += a[i] * jnp.sum(k[:, i] * per_comp)

    x = vp[ids.gal_radius_px]
    e_log_prob = -0.5 * (jnp.log(2.0 * jnp.pi)
                         + jnp.log(prior.gal_radius_px_var)
                         + (x - prior.gal_radius_px_mean) ** 2
                         / prior.gal_radius_px_var)
    return -kl + e_log_prob


def elbo(vp, patch, bg_E_G=None, bg_var_G=None, include_kl=True,
         prior: PriorConstants = PRIOR):
    """Full single-source ELBO (elbo_objective.jl:482-492)."""
    out = elbo_likelihood(vp, patch, bg_E_G, bg_var_G)
    if include_kl:
        out = out + subtract_kl(vp, prior)
    return out
