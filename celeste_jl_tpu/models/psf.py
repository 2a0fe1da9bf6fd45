"""Point-spread-function model: a K-component Gaussian mixture.

Packed representation: a (K, 6) array with columns
    [alpha, mu1, mu2, sigma11, sigma12, sigma22]
(weight, mean offset from the source center in pixels, covariance).
This replaces the reference's PsfComponent struct (model/psf_model.jl:17-29)
and — deliberately — also replaces its per-patch interpolated raw-PSF lookup
for the star density (model/fsm_util.jl:225-248): the fitted GMM is used for
*both* star and galaxy densities so the model is differentiable everywhere
(see SURVEY.md §7 "Hard parts").
"""

import jax.numpy as jnp
import numpy as np

from .bvn import eval_bvn_mixture_grid

PSF_NPARAM = 6


def make_psf(alphas, mus, covs):
    """Pack a PSF mixture. alphas (K,), mus (K,2), covs (K,2,2) -> (K,6)."""
    alphas = np.asarray(alphas, dtype=np.float64)
    mus = np.asarray(mus, dtype=np.float64)
    covs = np.asarray(covs, dtype=np.float64)
    return np.concatenate(
        [alphas[:, None], mus,
         covs[:, 0, 0, None], covs[:, 0, 1, None], covs[:, 1, 1, None]],
        axis=1)


def psf_alphas(psf):
    return psf[..., 0]


def psf_mus(psf):
    return psf[..., 1:3]


def psf_covs(psf):
    s11, s12, s22 = psf[..., 3], psf[..., 4], psf[..., 5]
    return jnp.stack([jnp.stack([s11, s12], -1), jnp.stack([s12, s22], -1)], -2)


def gaussian_psf(sigma=1.5, K=2):
    """A simple isotropic test PSF: K concentric Gaussians."""
    if K == 1:
        alphas, scales = [1.0], [1.0]
    else:
        alphas = [0.8] + [0.2 / (K - 1)] * (K - 1)
        scales = [1.0] + [2.0] * (K - 1)
    mus = np.zeros((K, 2))
    covs = np.stack([np.eye(2) * (sigma * s) ** 2 for s in scales])
    return make_psf(alphas, mus, covs)


def get_psf_width(psf, width_scale=1.0):
    """Effective PSF width heuristic (model/psf_model.jl:32-52): the
    alpha-weighted mean of component major standard deviations, ignoring
    negligible components, scaled by width_scale."""
    alphas = np.asarray(psf[:, 0])
    covs = np.asarray(psf[:, 3:6])
    w = 0.0
    total = 0.0
    for k in range(psf.shape[0]):
        if alphas[k] > 0.05:
            major_sd = np.sqrt(max(covs[k, 0], covs[k, 2]))
            w += alphas[k] * major_sd
            total += alphas[k]
    return width_scale * w / total


def render_psf(psf, size=51):
    """Rasterize a PSF mixture onto a size x size grid centered on the
    stamp center (model/psf_model.jl:61-75 equivalent)."""
    c = (size + 1) / 2.0
    i = jnp.arange(1, size + 1, dtype=psf.dtype)
    x1, x2 = jnp.meshgrid(i, i, indexing="ij")
    means = psf_mus(psf) + jnp.array([c, c], dtype=psf.dtype)
    return eval_bvn_mixture_grid(x1, x2, means, psf_covs(psf), psf_alphas(psf))
