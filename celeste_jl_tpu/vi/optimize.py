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
from .elbo import (brightness_coeffs, moment_grids_from_fs,
                   pixel_log_likelihood, source_fs_grids, subtract_kl)

# free[0:6] = pos(2), gal_frac_dev, gal_axis_ratio, gal_angle, gal_radius_px:
# the only free params the likelihood depends on through the pixel render
# (bijectors free layout). Everything else reaches the likelihood through
# the 20 brightness coefficients (elbo.brightness_coeffs) or only the KL.
N_SHAPE = 6


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

    def lik_of(free):
        vp = bijectors.to_bound(free, bounds)
        fs0m, fs1m = source_fs_grids(vp, patch)
        E_G_s, var_G_s = moment_grids_from_fs(
            brightness_coeffs(vp), fs0m, fs1m)
        return pixel_log_likelihood(E_G_s, var_G_s, patch, bg_E_G, bg_var_G)

    def kl_of(free):
        kl = subtract_kl(bijectors.to_bound(free, bounds))
        if pixel_axis is not None:
            # Each pixel shard carries an equal share of the KL so the psums
            # below reconstruct likelihood + KL exactly once.
            kl = kl / jax.lax.axis_size(pixel_axis)
        return kl

    def neg_elbo(free):
        ll = lik_of(free)
        if include_kl:
            ll = ll + kl_of(free)
        return -ll

    def fg(free):
        f, g = jax.value_and_grad(neg_elbo)(free)
        if pixel_axis is not None:
            # psum the derivatives rather than the objective: psum inside
            # the differentiated function does not accumulate cotangents
            # across shards under shard_map(check_vma=False).
            f, g = jax.lax.psum((f, g), pixel_axis)
        return f, g

    def fgh(free):
        """Structured ELBO Hessian.

        A generic jax.hessian pushes 41 forward tangents through the pixel
        render (~90x the gradient cost). But the likelihood touches the
        pixel grids only through free[0:6] (the density grids) and the 20
        brightness coefficients C — per pixel the moments are LINEAR in C.
        So: exact rows for the 6 shape dims (6 tangents through the render),
        the 26x26 brightness block via the C bottleneck (20 tangents of
        pixel math that never re-renders), and the KL Hessian on the side
        (scalar graph, no pixels). ~5x cheaper at f64-exact parity
        (tests/test_structured_hessian.py).
        """
        f, g = jax.value_and_grad(neg_elbo)(free)

        # (41, 6) rows of the likelihood Hessian for the shape dims.
        def grad_lik(s6):
            return jax.grad(lik_of)(free.at[:N_SHAPE].set(s6))
        H_s = jax.jacfwd(grad_lik)(free[:N_SHAPE])

        # Brightness block through C: likelihood(C) with frozen grids.
        vp = bijectors.to_bound(free, bounds)
        fs0m, fs1m = jax.lax.stop_gradient(source_fs_grids(vp, patch))

        def lik_of_C(C):
            E_G_s, var_G_s = moment_grids_from_fs(C, fs0m, fs1m)
            return pixel_log_likelihood(E_G_s, var_G_s, patch,
                                        bg_E_G, bg_var_G)

        def C_of(free):
            return brightness_coeffs(bijectors.to_bound(free, bounds))

        C0 = C_of(free)
        gC = jax.grad(lik_of_C)(C0)                       # (20,)
        H_CC = jax.hessian(lik_of_C)(C0)                  # (20, 20)
        J_C = jax.jacfwd(C_of)(free)                      # (20, 41)
        T_C = jax.hessian(C_of)(free)                     # (20, 41, 41)
        # J_C/T_C vanish on the shape and k dims, so H_bb only fills the
        # brightness block; chain rule: J'HJ + sum_k gC_k * Hess(C_k).
        H_bb = J_C.T @ (H_CC @ J_C) + jnp.tensordot(gC, T_C, axes=1)

        H_lik = H_bb.at[:, :N_SHAPE].set(H_s).at[:N_SHAPE, :].set(H_s.T)
        H = -H_lik
        if include_kl:
            H = H - jax.hessian(kl_of)(free)
        if pixel_axis is not None:
            f, g, H = jax.lax.psum((f, g, H), pixel_axis)
        return f, g, H

    state = minimize_newton_tr(fgh, free0, config, fg=fg)
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
