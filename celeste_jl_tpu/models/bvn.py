"""Bivariate normals on pixel grids, JAX-native.

The reference hand-derives value+gradient+Hessian of each 2-D Gaussian
(BivariateNormals.jl, 574 LoC). Here only the *value* path exists —
derivatives come from jax.grad/jax.hessian through these functions — and
evaluation is vectorized over whole pixel tiles (VPU-friendly broadcasting)
instead of per-pixel scalar loops.
"""

import jax.numpy as jnp

TWO_PI = 6.283185307179586


def get_bvn_cov(axis_ratio, angle, scale):
    """Covariance of a 2-D Gaussian parameterized by rotation.

    axis_ratio: minor/major ratio in (0, 1]; angle: radians; scale: major-axis
    sigma. Returns (..., 2, 2). Matches get_bvn_cov (BivariateNormals.jl:29-43).
    """
    cp = jnp.cos(angle)
    sp = jnp.sin(angle)
    ab_term = axis_ratio ** 2 - 1.0
    s2 = scale ** 2
    off = -s2 * cp * sp * ab_term
    c11 = s2 * (1.0 + ab_term * sp ** 2)
    c22 = s2 * (1.0 + ab_term * cp ** 2)
    return jnp.stack([jnp.stack([c11, off], -1), jnp.stack([off, c22], -1)], -2)


def bvn_sufficient_stats(cov, weight):
    """Precision, log-weighted normalizer for a batch of 2x2 covariances.

    cov: (..., 2, 2); weight: (...). Returns (precision (...,2,2), z (...))
    where z = weight / (2*pi*sqrt(det)).
    """
    det = cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    inv_det = 1.0 / det
    p11 = cov[..., 1, 1] * inv_det
    p22 = cov[..., 0, 0] * inv_det
    p12 = -cov[..., 0, 1] * inv_det
    precision = jnp.stack(
        [jnp.stack([p11, p12], -1), jnp.stack([p12, p22], -1)], -2)
    z = weight / (TWO_PI * jnp.sqrt(det))
    return precision, z


def eval_bvn_grid(dx1, dx2, precision, z):
    """Weighted Gaussian density over a pixel grid.

    dx1, dx2: (H, W) offsets of pixel coordinates from the component mean.
    precision: (2, 2); z: scalar weighted normalizer.
    Returns (H, W) density values.
    """
    quad = (precision[0, 0] * dx1 * dx1
            + 2.0 * precision[0, 1] * dx1 * dx2
            + precision[1, 1] * dx2 * dx2)
    return z * jnp.exp(-0.5 * quad)


def eval_bvn_mixture_grid(x1, x2, means, covs, weights):
    """Mixture of weighted 2-D Gaussians evaluated on a grid.

    x1, x2: (H, W) pixel coordinate grids.
    means: (C, 2); covs: (C, 2, 2); weights: (C,).
    Returns (H, W) sum of component densities.

    All component axes are static so XLA unrolls/fuses this into a single
    elementwise kernel over the tile.
    """
    precision, z = bvn_sufficient_stats(covs, weights)  # (C,2,2), (C,)
    dx1 = x1[None] - means[:, 0, None, None]            # (C, H, W)
    dx2 = x2[None] - means[:, 1, None, None]
    quad = (precision[:, 0, 0, None, None] * dx1 * dx1
            + 2.0 * precision[:, 0, 1, None, None] * dx1 * dx2
            + precision[:, 1, 1, None, None] * dx2 * dx2)
    return jnp.sum(z[:, None, None] * jnp.exp(-0.5 * quad), axis=0)
