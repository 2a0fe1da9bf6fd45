"""Fit a K-component Gaussian mixture to a rasterized PSF stamp.

Rebuilds PSF.jl (PsfOptimizer :32-130, evaluate_psf_pixel_fit! :385-469,
fit_raw_psf_for_celeste :635-674): weighted least squares of the mixture
density against the stamp, minimized by the same batched Newton trust-region
used for the ELBO — gradients/Hessians via JAX instead of hand-built
SensitiveFloats through the legacy Transform bounds.

Per-component parameters (6, matching PsfParams): mu (2, offset from the
stamp center), axis ratio, angle, scale (major-axis sigma), weight. Box
constraints keep the mixture well-posed; derivatives flow through the same
sigmoid box bijector as the ELBO optimizer.

`fit_psfs_batched` vmaps the whole fit over many stamps (e.g. all fields of
an SDSS run) — one TPU launch replaces the reference's per-field loop.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.newton import NewtonConfig, minimize_newton_tr
from .bvn import get_bvn_cov
from .psf import make_psf

PSF_NPARAM = 6  # mu1, mu2, axis_ratio, angle, scale, weight

# box bounds per parameter (lower, upper, scale); mirrors the intent of the
# reference's PSF transform bounds (PSF.jl:250-344)
_LB = np.array([-5.0, -5.0, 0.10, -4.0 * np.pi, 0.25, 0.05])
_UB = np.array([5.0, 5.0, 1.0, 4.0 * np.pi, 10.0, 2.0])


def _to_bound(free):
    return _LB + (_UB - _LB) / (1.0 + jnp.exp(-free))


def _to_free(bound):
    frac = (bound - _LB) / (_UB - _LB)
    return -jnp.log(1.0 / frac - 1.0)


def psf_mixture_density(params, x1, x2, center):
    """Mixture density on the stamp grid. params: (K, 6); x1, x2: (H, W)
    1-based pixel coordinates; center: (2,) stamp center."""
    mu = params[:, 0:2] + center[None, :]
    covs = get_bvn_cov(params[:, 2], params[:, 3], params[:, 4])  # (K,2,2)
    det = covs[:, 0, 0] * covs[:, 1, 1] - covs[:, 0, 1] ** 2
    p11 = covs[:, 1, 1] / det
    p22 = covs[:, 0, 0] / det
    p12 = -covs[:, 0, 1] / det
    z = params[:, 5] / (2.0 * jnp.pi * jnp.sqrt(det))
    dx1 = x1[None] - mu[:, 0, None, None]
    dx2 = x2[None] - mu[:, 1, None, None]
    quad = (p11[:, None, None] * dx1 * dx1
            + 2.0 * p12[:, None, None] * dx1 * dx2
            + p22[:, None, None] * dx2 * dx2)
    return jnp.sum(z[:, None, None] * jnp.exp(-0.5 * quad), axis=0)


def _squared_error(free, stamp, x1, x2, center, K):
    params = _to_bound(free.reshape(K, PSF_NPARAM))
    model = psf_mixture_density(params, x1, x2, center)
    return jnp.sum((model - stamp) ** 2)


def initialize_psf_params(K, dtype=np.float64):
    """Concentric isotropic start (initialize_psf_params semantics)."""
    params = np.zeros((K, PSF_NPARAM), dtype=dtype)
    params[:, 2] = 0.8                       # axis ratio
    params[:, 4] = np.sqrt(2.0 * (1.0 + np.arange(K)))   # scale
    params[:, 5] = 1.0 / K                   # weight
    return params


def fit_raw_psf(raw_psf, K=2, config=NewtonConfig(max_iters=50)):
    """Fit one stamp. Returns ((K, 6) packed PSF mixture, final sq. error).

    The packed output matches models/psf.py: [alpha, mu1, mu2, s11, s12, s22]
    with mu relative to the stamp center (a source at pixel p gets PSF
    components centered at p + mu).
    """
    raw_psf = jnp.asarray(raw_psf)
    out, err = _fit_jit(raw_psf, K, config)
    return np.asarray(out), float(err)


@partial(jax.jit, static_argnames=("K", "config"))
def _fit_jit(raw_psf, K, config):
    H, W = raw_psf.shape
    dtype = raw_psf.dtype
    i = jnp.arange(1, H + 1, dtype=dtype)
    j = jnp.arange(1, W + 1, dtype=dtype)
    x1, x2 = jnp.meshgrid(i, j, indexing="ij")
    center = jnp.array([(H + 1) / 2.0, (W + 1) / 2.0], dtype=dtype)

    free0 = _to_free(jnp.asarray(initialize_psf_params(K), dtype)).reshape(-1)

    def fgh(free):
        f, g = jax.value_and_grad(_squared_error)(free, raw_psf, x1, x2,
                                                  center, K)
        h = jax.hessian(_squared_error)(free, raw_psf, x1, x2, center, K)
        return f, g, h

    state = minimize_newton_tr(fgh, free0, config)
    params = _to_bound(state.x.reshape(K, PSF_NPARAM))
    covs = get_bvn_cov(params[:, 2], params[:, 3], params[:, 4])
    packed = jnp.concatenate(
        [params[:, 5:6], params[:, 0:2],
         covs[:, 0, 0, None], covs[:, 0, 1, None], covs[:, 1, 1, None]],
        axis=1)
    return packed, state.f


def fit_psfs_batched(stamps, K=2, config=NewtonConfig(max_iters=50)):
    """vmapped fit over (N, H, W) stamps -> (N, K, 6) packed mixtures."""
    stamps = jnp.asarray(stamps)

    @partial(jax.jit, static_argnames=())
    def run(st):
        return jax.vmap(lambda s: _fit_jit(s, K, config))(st)

    packed, errs = run(stamps)
    return np.asarray(packed), np.asarray(errs)


def trim_width(raw_psf, trim_percent=0.999):
    """Half-width of the central square window holding trim_percent of |PSF|
    (PSF.jl:677-693)."""
    raw_psf = np.asarray(raw_psf)
    h_mid = (raw_psf.shape[0] + 1) // 2 - 1
    w_mid = (raw_psf.shape[1] + 1) // 2 - 1
    total = np.abs(raw_psf).sum()
    width = 1
    while True:
        win = raw_psf[h_mid - width:h_mid + width + 1,
                      w_mid - width:w_mid + width + 1]
        if np.abs(win).sum() >= trim_percent * total or \
                win.shape[0] >= min(raw_psf.shape):
            return width
        width += 1


def trim_psf(raw_psf, trim_percent=0.999):
    """Central square window holding trim_percent of |PSF| (PSF.jl:677-693)."""
    raw_psf = np.asarray(raw_psf)
    h_mid = (raw_psf.shape[0] + 1) // 2 - 1
    w_mid = (raw_psf.shape[1] + 1) // 2 - 1
    width = trim_width(raw_psf, trim_percent)
    return raw_psf[h_mid - width:h_mid + width + 1,
                   w_mid - width:w_mid + width + 1].copy()


def _pad_components(packed, K_out):
    """Pad a (K, 6) packed mixture to (K_out, 6) with zero-weight identity
    components (alpha = 0 contributes nothing to the rendered mixture)."""
    packed = np.asarray(packed, dtype=np.float64)
    K = packed.shape[0]
    if K >= K_out:
        return packed[:K_out]
    pad = np.zeros((K_out - K, 6))
    pad[:, 3] = 1.0   # s11
    pad[:, 5] = 1.0   # s22
    return np.concatenate([packed, pad], axis=0)


def fit_patch_psfs(images, positions, K=2,
                   config=NewtonConfig(max_iters=50), trim_percent=0.999):
    """Per-source, per-band local PSFs from each image's spatially-varying
    psfmap: (S, B, K_out, 6) packed mixtures.

    The reference evaluates the psField eigenimage-polynomial map at every
    patch's pixel center and fits a K=2 GMM per patch
    (model/imaged_sources.jl:97-107 + SDSSIO.jl:239-298). Here the stamps of
    all S sources in one band are evaluated with one einsum
    (SDSSPSFMap.at), trimmed to a COMMON window (the max per-stamp trim
    width, so every stamp keeps >= trim_percent of its light) and fitted as
    one vmapped Newton launch (fit_psfs_batched) — S fits per band instead
    of the reference's per-patch loop.

    Bands whose Image carries no ``meta['psfmap']`` fall back to the image's
    global (field-center) PSF for every source. Mixed component counts are
    reconciled by padding with zero-weight components.
    """
    positions = np.asarray(positions, dtype=np.float64)
    S, B = len(positions), len(images)
    per_band = []   # list of (S, K_b, 6)
    for img in images:
        psfmap = img.meta.get("psfmap") if img.meta else None
        if psfmap is None:
            per_band.append(np.broadcast_to(
                np.asarray(img.psf, dtype=np.float64),
                (S,) + np.shape(img.psf)).copy())
            continue
        centers = np.stack([np.asarray(img.world_to_pix(p), np.float64)
                            for p in positions])   # (S, 2) 1-based
        # psfmap is evaluated at (x=col-ish axis1, y=axis2) like the
        # field-center fit in load_field_images (io/sdss.py:392-394)
        stamps = psfmap.at(centers[:, 0], centers[:, 1])
        width = max(trim_width(st, trim_percent) for st in stamps)
        h_mid = (stamps.shape[1] + 1) // 2 - 1
        w_mid = (stamps.shape[2] + 1) // 2 - 1
        win = stamps[:, h_mid - width:h_mid + width + 1,
                     w_mid - width:w_mid + width + 1]
        packed, _ = fit_psfs_batched(win, K=K, config=config)
        per_band.append(packed)
    K_out = max(pb.shape[1] for pb in per_band)
    out = np.zeros((S, B, K_out, 6))
    for b, pb in enumerate(per_band):
        for s in range(S):
            out[s, b] = _pad_components(pb[s], K_out)
    return out
