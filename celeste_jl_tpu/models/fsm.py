"""Per-pixel light densities fs0m (star) and fs1m (galaxy) on patch tiles.

TPU-first counterpart of model/fsm_util.jl: instead of per-pixel scalar loops
with hand-coded derivatives, the unit-flux density of a source is rendered on
a whole (P, P) tile by broadcasting the PSF x profile Gaussian mixture.
Derivatives come from jax.grad through these functions.

The star density uses the fitted GMM PSF (not the reference's interpolated
raw-PSF spline, fsm_util.jl:225-248) so that everything is smooth and
differentiable — the substitution recommended by SURVEY.md §7.
"""

import jax.numpy as jnp

from .bvn import get_bvn_cov, eval_bvn_mixture_grid
from .params import GAL_ETA, GAL_NU, GAL_IS_DEV
from .patches import pixel_coord_grids
from .psf import psf_alphas, psf_mus, psf_covs


def linear_world_to_pix(wcs_jacobian, world_center, pixel_center, world_pos):
    """First-order WCS: pixel = pixel_center + J @ (world - world_center).
    (model/wcs_utils.jl:14-18)"""
    return pixel_center + wcs_jacobian @ (world_pos - world_center)


def star_density_grid(pos_world, patch_band_psf, wcs_jacobian, world_center,
                      pixel_center, offset, P):
    """Unit-flux star density fs0m on a (P, P) tile: the PSF mixture centered
    at the source position."""
    dtype = patch_band_psf.dtype
    m_pos = linear_world_to_pix(wcs_jacobian, world_center, pixel_center,
                                pos_world)
    x1, x2 = pixel_coord_grids(offset, P, dtype=dtype)
    means = psf_mus(patch_band_psf) + m_pos[None, :]
    return eval_bvn_mixture_grid(x1, x2, means, psf_covs(patch_band_psf),
                                 psf_alphas(patch_band_psf))


def galaxy_density_grid(pos_world, gal_frac_dev, gal_axis_ratio, gal_angle,
                        gal_radius_px, patch_band_psf, wcs_jacobian,
                        world_center, pixel_center, offset, P):
    """Unit-flux galaxy density fs1m on a (P, P) tile.

    The galaxy profile is a 14-component GMM (8 de Vaucouleurs + 6
    exponential), each convolved with each PSF component: a (14*K)-component
    mixture with covariances psf_cov + nu * XiXi and weights
    alpha * eta * {frac_dev | 1 - frac_dev}.
    """
    dtype = patch_band_psf.dtype
    m_pos = linear_world_to_pix(wcs_jacobian, world_center, pixel_center,
                                pos_world)
    x1, x2 = pixel_coord_grids(offset, P, dtype=dtype)

    XiXi = get_bvn_cov(gal_axis_ratio, gal_angle, gal_radius_px)  # (2,2)
    eta = jnp.asarray(GAL_ETA, dtype)
    nu = jnp.asarray(GAL_NU, dtype)
    is_dev = jnp.asarray(GAL_IS_DEV, dtype)
    frac = is_dev * gal_frac_dev + (1.0 - is_dev) * (1.0 - gal_frac_dev)

    a = psf_alphas(patch_band_psf)   # (K,)
    mu = psf_mus(patch_band_psf)     # (K,2)
    cv = psf_covs(patch_band_psf)    # (K,2,2)

    # (K, 14) -> flat (K*14,)
    weights = (a[:, None] * (eta * frac)[None, :]).reshape(-1)
    covs = (cv[:, None, :, :] + nu[None, :, None, None] * XiXi[None, None]
            ).reshape(-1, 2, 2)
    means = jnp.broadcast_to((mu + m_pos[None, :])[:, None, :],
                             (mu.shape[0], eta.shape[0], 2)).reshape(-1, 2)
    return eval_bvn_mixture_grid(x1, x2, means, covs, weights)


def source_densities_grid(pos_world, gal_frac_dev, gal_axis_ratio, gal_angle,
                          gal_radius_px, patch, band):
    """fs0m and fs1m for one band of a per-source SkyPatch."""
    P = tuple(patch.pixels.shape[-2:])  # (rows, cols); rows may be sharded
    args = (patch.psf[band], patch.wcs_jacobian[band],
            patch.world_center[band], patch.pixel_center[band],
            patch.offset[band], P)
    fs0m = star_density_grid(pos_world, *args)
    fs1m = galaxy_density_grid(pos_world, gal_frac_dev, gal_axis_ratio,
                               gal_angle, gal_radius_px, *args)
    return fs0m, fs1m


def source_densities_all_bands(pos_world, gal_frac_dev, gal_axis_ratio,
                               gal_angle, gal_radius_px, patch):
    """fs0m and fs1m for every band at once, (B, P, P) each.

    vmapped over the band axis rather than a Python loop — one traced band
    in the jaxpr instead of B copies, which cuts XLA compile time of the
    ELBO (and its Hessian) roughly B-fold.
    """
    import jax

    P = tuple(patch.pixels.shape[-2:])

    def one_band(psf_b, jac_b, wc_b, pc_b, off_b):
        args = (psf_b, jac_b, wc_b, pc_b, off_b, P)
        fs0m = star_density_grid(pos_world, *args)
        fs1m = galaxy_density_grid(pos_world, gal_frac_dev, gal_axis_ratio,
                                   gal_angle, gal_radius_px, *args)
        return fs0m, fs1m

    return jax.vmap(one_band)(patch.psf, patch.wcs_jacobian,
                              patch.world_center, patch.pixel_center,
                              patch.offset)
