"""MCMC-facing log densities on patch tiles.

Rebuilds model/log_prob.jl + mcmc/mcmc_functions.jl TPU-first: instead of
per-pixel Julia loops over whole images, the source is rendered at unit flux
on its (B, P, P) SkyPatch tile in one broadcast and scored under the Poisson
likelihood; neighbors enter as a fixed background nMgy image.

Parameter vectors (flat, unconstrained-ish; slice sampling needs no
bijectors):
  star   th (7,)  = [lnfluxes(5), u(2)]
  galaxy th (11,) = [lnfluxes(5), u(2), gal_frac_dev, gal_axis_ratio,
                     gal_angle, gal_radius_px]
u in [0,1]^2 maps linearly to a world-coordinate box of ±pos_delta/2 pixels
around the catalog position (mcmc_functions.jl:324-369).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, logsumexp

from ..models.fsm import (galaxy_density_grid, linear_world_to_pix,
                          star_density_grid)
from ..vi.elbo import PRIOR, PriorConstants

LN2PI = float(np.log(2.0 * np.pi))
NUM_STAR_PARAMS = 7
NUM_GAL_PARAMS = 11


class SourceTarget(NamedTuple):
    """Device-side data for one source's MCMC: its patch tiles, fixed
    background (sky + rendered neighbors, nMgy), and the world box the
    position prior is uniform over."""
    pixels: jnp.ndarray     # (B, P, P)
    mask: jnp.ndarray       # (B, P, P) bool
    iota: jnp.ndarray       # (B, P, P)
    bg_nmgy: jnp.ndarray    # (B, P, P) sky + neighbors
    psf: jnp.ndarray        # (B, K, 6)
    wcs_jacobian: jnp.ndarray  # (B, 2, 2)
    world_center: jnp.ndarray  # (B, 2)
    pixel_center: jnp.ndarray  # (B, 2)
    offset: jnp.ndarray        # (B, 2)
    world_lo: jnp.ndarray   # (2,) position box lower corner (world)
    world_hi: jnp.ndarray   # (2,)


def make_source_target(patch, bg_nmgy=None, pos_delta=(2.0, 2.0), image=None,
                       entry_pos=None):
    """Build a SourceTarget from a single-source SkyPatch. The position box
    is ±pos_delta/2 *pixels* around the patch world center, mapped to world
    coordinates via the image WCS (or the patch Jacobian)."""
    pos0 = np.asarray(entry_pos if entry_pos is not None
                      else patch.world_center[0])
    delta = np.asarray(pos_delta, dtype=np.float64)
    if image is not None:
        pc = np.asarray(image.world_to_pix(pos0))
        lo = np.asarray(image.pix_to_world(pc - 0.5 * delta))
        hi = np.asarray(image.pix_to_world(pc + 0.5 * delta))
    else:
        jac_inv = np.linalg.inv(np.asarray(patch.wcs_jacobian[0]))
        lo = pos0 - np.abs(jac_inv) @ (0.5 * delta)
        hi = pos0 + np.abs(jac_inv) @ (0.5 * delta)
    lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
    if bg_nmgy is None:
        bg_nmgy = patch.sky
    return SourceTarget(
        pixels=patch.pixels, mask=patch.mask, iota=patch.iota,
        bg_nmgy=bg_nmgy, psf=patch.psf, wcs_jacobian=patch.wcs_jacobian,
        world_center=patch.world_center, pixel_center=patch.pixel_center,
        offset=patch.offset, world_lo=jnp.asarray(lo), world_hi=jnp.asarray(hi))


def uniform_to_world(u, tgt: SourceTarget):
    return tgt.world_lo + (tgt.world_hi - tgt.world_lo) * u


def world_to_uniform(pos, tgt: SourceTarget):
    return (pos - tgt.world_lo) / (tgt.world_hi - tgt.world_lo)


def _poisson_ll(tgt: SourceTarget, source_nmgy):
    rate = jnp.maximum(tgt.iota * (source_nmgy + tgt.bg_nmgy), 1e-30)
    x = jnp.where(tgt.mask, tgt.pixels, 0.0)
    ll = x * jnp.log(rate) - rate - gammaln(x + 1.0)
    return jnp.sum(jnp.where(tgt.mask, ll, 0.0))


def _render(tgt: SourceTarget, pos_world, fluxes, shape=None):
    """(B, P, P) expected source nMgy: unit-flux density x per-band flux.
    Bands are vmapped (smaller jaxpr, faster XLA compiles)."""
    P = tuple(tgt.pixels.shape[-2:])

    def one_band(psf_b, jac_b, wc_b, pc_b, off_b, flux_b):
        args = (psf_b, jac_b, wc_b, pc_b, off_b, P)
        if shape is None:
            dens = star_density_grid(pos_world, *args)
        else:
            dens = galaxy_density_grid(pos_world, shape[0], shape[1],
                                       shape[2], shape[3], *args)
        return flux_b * dens

    return jax.vmap(one_band)(tgt.psf, tgt.wcs_jacobian, tgt.world_center,
                              tgt.pixel_center, tgt.offset, fluxes)


def _pack_source_comps(tgt: SourceTarget, pos_world, shape=None):
    """Per-band packed mixture rows for the fused kernel: (B, C, 6).
    C = psf_K for a star, psf_K * 14 for a galaxy (PSF x profile GMM,
    fsm_util.jl:111-169 semantics)."""
    from ..models.bvn import get_bvn_cov
    from ..models.params import GAL_ETA, GAL_IS_DEV, GAL_NU
    from ..models.psf import psf_alphas, psf_covs, psf_mus
    from ..ops.pallas_render import pack_mixture

    if shape is not None:
        XiXi = get_bvn_cov(shape[1], shape[2], shape[3])
        eta = jnp.asarray(GAL_ETA, XiXi.dtype)
        nu = jnp.asarray(GAL_NU, XiXi.dtype)
        is_dev = jnp.asarray(GAL_IS_DEV, XiXi.dtype)
        frac = is_dev * shape[0] + (1.0 - is_dev) * (1.0 - shape[0])

    def one_band(psf_b, jac_b, wc_b, pc_b):
        m_pos = linear_world_to_pix(jac_b, wc_b, pc_b, pos_world)
        a, mu, cv = psf_alphas(psf_b), psf_mus(psf_b), psf_covs(psf_b)
        if shape is None:
            return pack_mixture(mu + m_pos[None, :], cv, a)
        K = mu.shape[0]
        w = (a[:, None] * (eta * frac)[None, :]).reshape(-1)
        covs = (cv[:, None] + nu[None, :, None, None] * XiXi[None, None]
                ).reshape(-1, 2, 2)
        means = jnp.broadcast_to((mu + m_pos[None, :])[:, None, :],
                                 (K, eta.shape[0], 2)).reshape(-1, 2)
        return pack_mixture(means, covs, w)

    return jax.vmap(one_band)(tgt.psf, tgt.wcs_jacobian, tgt.world_center,
                              tgt.pixel_center)


def _fused_loglike(tgt: SourceTarget, pos_world, fluxes, shape=None):
    """Fused mixture render + Poisson score via the Pallas kernel on TPU
    (ops/pallas_render); numerically equivalent XLA path elsewhere."""
    from ..ops.pallas_render import mixture_poisson_ll

    comps = _pack_source_comps(tgt, pos_world, shape)
    zeros = jnp.zeros_like(fluxes)
    # pixel_coord_grids is 1-based: kernel row/col indices are 0-based
    meta = jnp.stack([tgt.offset[:, 0] + 1.0, tgt.offset[:, 1] + 1.0,
                      fluxes, zeros], axis=-1)
    maskf = tgt.mask.astype(tgt.pixels.dtype)
    x = jnp.where(tgt.mask, tgt.pixels, 0.0)
    bg = jnp.broadcast_to(tgt.bg_nmgy, tgt.pixels.shape)
    ll = mixture_poisson_ll(x, maskf, tgt.iota, bg, comps, meta)
    lgam = jnp.sum(jnp.where(tgt.mask, gammaln(x + 1.0), 0.0))
    return jnp.sum(ll) - lgam


def _use_fused():
    import os
    flag = os.environ.get("CELESTE_FUSED_MCMC", "auto")
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return flag not in ("", "0", "false")


def star_loglike(th, tgt: SourceTarget):
    """(mcmc_functions.jl:109-185 semantics on a patch tile)."""
    fluxes = jnp.exp(jnp.minimum(th[:5], 80.0))
    pos = uniform_to_world(th[5:7], tgt)
    if _use_fused():
        return _fused_loglike(tgt, pos, fluxes)
    return _poisson_ll(tgt, _render(tgt, pos, fluxes))


def gal_loglike(th, tgt: SourceTarget):
    fluxes = jnp.exp(jnp.minimum(th[:5], 80.0))
    pos = uniform_to_world(th[5:7], tgt)
    if _use_fused():
        return _fused_loglike(tgt, pos, fluxes, shape=th[7:11])
    return _poisson_ll(tgt, _render(tgt, pos, fluxes, shape=th[7:11]))


# ---------------------------------------------------------------------------
# Priors (mcmc_functions.jl:324-420, 576-599; model/log_prob.jl:225-268)
# ---------------------------------------------------------------------------

def lnfluxes_to_colors(lnfluxes):
    """lnr (ref band) and 4 adjacent-band log ratios
    (mcmc_functions.jl:601-609)."""
    lnr = lnfluxes[2]
    colors = lnfluxes[1:] - lnfluxes[:-1]
    return lnr, colors


def colors_to_lnfluxes(lnr, colors):
    return jnp.stack([lnr - colors[1] - colors[0], lnr - colors[1], lnr,
                      lnr + colors[2], lnr + colors[2] + colors[3]])


def logflux_logprior(lnfluxes, is_star: bool, prior: PriorConstants = PRIOR):
    """Normal on lnr + color GMM marginal (mcmc_functions.jl:576-596)."""
    i = 0 if is_star else 1
    lnr, colors = lnfluxes_to_colors(lnfluxes)
    llr = -0.5 * (LN2PI + jnp.log(prior.flux_var[i])
                  + (lnr - prior.flux_mean[i]) ** 2 / prior.flux_var[i])

    def comp_ll(d):
        dmu = colors - prior.color_mean[:, d, i]
        maha = dmu @ (prior.color_cov_inv[:, :, d, i] @ dmu)
        return -0.5 * (4.0 * LN2PI + prior.color_cov_logdet[d, i] + maha)

    llk = jax.vmap(comp_ll)(jnp.arange(8))
    llc = logsumexp(llk + jnp.log(prior.k[:, i]))
    return llr + llc


def _in01(u):
    return jnp.all((u >= 0.0) & (u <= 1.0))


def star_logprior(th, tgt: SourceTarget, prior: PriorConstants = PRIOR):
    ll = logflux_logprior(th[:5], True, prior)
    area = jnp.prod(tgt.world_hi - tgt.world_lo)
    return jnp.where(_in01(th[5:7]), ll - jnp.log(area), -jnp.inf)


def gal_logprior(th, tgt: SourceTarget, prior: PriorConstants = PRIOR):
    ll = logflux_logprior(th[:5], False, prior)
    area = jnp.prod(tgt.world_hi - tgt.world_lo)
    frac_dev, axis_ratio, angle, radius = th[7], th[8], th[9], th[10]
    ok = (_in01(th[5:7]) & (frac_dev >= 0.0) & (frac_dev <= 1.0)
          & (axis_ratio >= 0.0) & (axis_ratio <= 1.0)
          & (angle >= 0.0) & (angle <= jnp.pi) & (radius > 1e-5))
    # uniform frac_dev/axis_ratio (Beta(1,1)), uniform angle, lognormal radius
    r = jnp.maximum(radius, 1e-5)
    ll_radius = (-jnp.log(r) - 0.5 * (LN2PI + jnp.log(PRIOR_GAL_RADIUS_VAR))
                 - (jnp.log(r) - PRIOR_GAL_RADIUS_MEAN) ** 2
                 / (2.0 * PRIOR_GAL_RADIUS_VAR))
    ll = ll - jnp.log(area) - jnp.log(jnp.pi) + ll_radius
    return jnp.where(ok, ll, -jnp.inf)


PRIOR_GAL_RADIUS_MEAN = float(PRIOR.gal_radius_px_mean)
PRIOR_GAL_RADIUS_VAR = float(PRIOR.gal_radius_px_var)


def star_logpost(th, tgt: SourceTarget):
    lp = star_logprior(th, tgt)
    return jnp.where(jnp.isfinite(lp), star_loglike(th, tgt) + lp, -jnp.inf)


def gal_logpost(th, tgt: SourceTarget):
    lp = gal_logprior(th, tgt)
    return jnp.where(jnp.isfinite(lp), gal_loglike(th, tgt) + lp, -jnp.inf)


# ---------------------------------------------------------------------------
# Prior sampling (mcmc_functions.jl:615-645, 413-420)
# ---------------------------------------------------------------------------

def sample_lnfluxes(key, is_star: bool, prior: PriorConstants = PRIOR):
    i = 0 if is_star else 1
    k1, k2, k3 = jax.random.split(key, 3)
    lnr = (prior.flux_mean[i]
           + jnp.sqrt(prior.flux_var[i]) * jax.random.normal(k1))
    d = jax.random.categorical(k2, jnp.log(prior.k[:, i]))
    cov = jnp.linalg.inv(prior.color_cov_inv[:, :, d, i])
    chol = jnp.linalg.cholesky(cov)
    colors = prior.color_mean[:, d, i] + chol @ jax.random.normal(k3, (4,))
    return colors_to_lnfluxes(lnr, colors)


def sample_star_prior(key):
    k1, k2 = jax.random.split(key)
    return jnp.concatenate([sample_lnfluxes(k1, True),
                            jax.random.uniform(k2, (2,))])


def sample_gal_prior(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape_u = jax.random.uniform(k3, (3,))
    radius = jnp.exp(PRIOR_GAL_RADIUS_MEAN
                     + jnp.sqrt(PRIOR_GAL_RADIUS_VAR)
                     * jax.random.normal(k4))
    shape = jnp.stack([shape_u[0], shape_u[1], shape_u[2] * jnp.pi, radius])
    return jnp.concatenate([sample_lnfluxes(k1, False),
                            jax.random.uniform(k2, (2,)), shape])


def star_params_from_catalog(ce, tgt: SourceTarget):
    u = np.asarray(world_to_uniform(jnp.asarray(np.asarray(ce.pos)), tgt))
    return np.concatenate([np.log(np.maximum(ce.star_fluxes, 1e-6)), u])


def gal_params_from_catalog(ce, tgt: SourceTarget):
    u = np.asarray(world_to_uniform(jnp.asarray(np.asarray(ce.pos)), tgt))
    shape = np.array([ce.gal_frac_dev, ce.gal_axis_ratio,
                      np.mod(ce.gal_angle, np.pi),
                      max(ce.gal_radius_px, 1e-3)])
    return np.concatenate([np.log(np.maximum(ce.gal_fluxes, 1e-6)), u, shape])
