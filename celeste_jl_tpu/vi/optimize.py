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

from ..models.params import ids
from ..ops import bijectors
from ..ops.newton import NewtonConfig, minimize_newton_tr
from .elbo import elbo_likelihood, subtract_kl


class FitResult(NamedTuple):
    vp: jnp.ndarray          # (44,) optimized canonical params
    elbo: jnp.ndarray        # final ELBO value
    iters: jnp.ndarray
    f_calls: jnp.ndarray
    converged: jnp.ndarray


def _make_bounds(pos, loc_width=1e-4, loc_scale=1.0):
    """Traced version of default_box_bounds (pos enters as a traced value)."""
    import numpy as np
    static = bijectors.default_box_bounds(np.zeros(2), loc_width, loc_scale)
    lower = static.lower.at[0:2].set(pos - loc_width)
    upper = static.upper.at[0:2].set(pos + loc_width)
    return bijectors.BoxBounds(lower, upper, static.scale)


def maximize(vp0, patch, bg_E_G=None, bg_var_G=None, include_kl=True,
             config: NewtonConfig = NewtonConfig(), loc_width=1e-4,
             loc_scale=1.0, pixel_axis=None):
    """Fit one source. vp0: (44,). Returns FitResult.

    bg_E_G / bg_var_G: fixed neighbor brightness images (B, P, P); gradients
    are stopped through them.

    pixel_axis: optional mesh-axis name. When the patch tiles are sharded
    across devices along their pixel rows (the "context parallel" analog —
    ELBO is a sum over pixels, so pixel-sharding + psum of the likelihood is
    exact, SURVEY.md §5), the local likelihood is psum'ed over this axis and
    each shard runs the identical Newton iteration.
    """
    if bg_E_G is not None:
        bg_E_G = jax.lax.stop_gradient(bg_E_G)
    if bg_var_G is not None:
        bg_var_G = jax.lax.stop_gradient(bg_var_G)

    bounds = _make_bounds(vp0[ids.pos], loc_width, loc_scale)
    vp_c = bijectors.enforce(vp0, bounds)
    free0 = bijectors.to_free(vp_c, bounds)

    def neg_elbo(free):
        vp = bijectors.to_bound(free, bounds)
        ll = elbo_likelihood(vp, patch, bg_E_G, bg_var_G)
        if include_kl:
            kl = subtract_kl(vp)
            if pixel_axis is not None:
                # Each pixel shard carries an equal share of the KL so the
                # psum below reconstructs likelihood + KL exactly once.
                kl = kl / jax.lax.axis_size(pixel_axis)
            ll = ll + kl
        return -ll

    def fgh(free):
        f, g = jax.value_and_grad(neg_elbo)(free)
        H = jax.hessian(neg_elbo)(free)
        if pixel_axis is not None:
            # psum the derivative triple rather than the objective: psum
            # inside the differentiated function does not accumulate
            # cotangents across shards under shard_map(check_vma=False).
            f, g, H = jax.lax.psum((f, g, H), pixel_axis)
        return f, g, H

    state = minimize_newton_tr(fgh, free0, config)
    vp_opt = bijectors.to_bound(state.x, bounds)
    return FitResult(vp=vp_opt, elbo=-state.f, iters=state.iters,
                     f_calls=state.f_calls, converged=state.converged)


@partial(jax.jit, static_argnames=("include_kl", "config"))
def fit_sources(vp0s, patches, bg_E_G=None, bg_var_G=None, include_kl=True,
                config: NewtonConfig = NewtonConfig()):
    """Batched fits: vp0s (S, 44), patches SkyPatch with leading S axis,
    optional bg images (S, B, P, P). Returns FitResult with leading S axis."""
    fit = partial(maximize, include_kl=include_kl, config=config)
    if bg_E_G is None:
        return jax.vmap(lambda v, p: fit(v, p))(vp0s, patches)
    return jax.vmap(fit)(vp0s, patches, bg_E_G, bg_var_G)
