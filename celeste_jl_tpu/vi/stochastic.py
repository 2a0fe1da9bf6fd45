"""Stochastic variational inference (StochasticVI.jl is an empty stub in the
reference, StochasticVI.jl:1-3 — this is the real implementation).

Same variational family and closed-form ELBO as deterministic VI, optimized
by Adam on *pixel-minibatch* gradients: each step scores a Bernoulli
subsample of the active pixels and scales the likelihood by the inverse
sampling fraction — an unbiased ELBO gradient estimator whose per-step cost
is `pixel_fraction` of the full one. Useful when patches are large (big
galaxies) or when thousands of sources share one device.

All steps run in one lax.scan; `fit_sources_svi` vmaps whole fits across
sources, like vi/optimize.fit_sources.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.params import ids
from ..ops import bijectors
from .elbo import elbo_likelihood, subtract_kl
from .optimize import _make_bounds


class SVIConfig(NamedTuple):
    steps: int = 500
    learning_rate: float = 0.1
    pixel_fraction: float = 0.25
    # cosine-decay the step size to a fraction of the initial value
    final_lr_fraction: float = 0.02


class SVIResult(NamedTuple):
    vp: jnp.ndarray        # (44,)
    elbo: jnp.ndarray      # full-ELBO value at the final iterate
    elbo_trace: jnp.ndarray  # (steps,) minibatch ELBO estimates


def svi_maximize(key, vp0, patch, bg_E_G=None, bg_var_G=None,
                 include_kl=True, config: SVIConfig = SVIConfig(),
                 loc_width=1e-4, loc_scale=1.0):
    """Fit one source by pixel-minibatch SVI. Returns SVIResult."""
    if bg_E_G is not None:
        bg_E_G = jax.lax.stop_gradient(bg_E_G)
    if bg_var_G is not None:
        bg_var_G = jax.lax.stop_gradient(bg_var_G)

    bounds = _make_bounds(vp0[ids.pos], loc_width, loc_scale)
    free0 = bijectors.to_free(bijectors.enforce(vp0, bounds), bounds)
    p = config.pixel_fraction

    def estimate(free, subsample_key):
        vp = bijectors.to_bound(free, bounds)
        if p >= 1.0:
            sub = patch
            scale = 1.0
        else:
            keep = jax.random.bernoulli(subsample_key, p,
                                        patch.mask.shape)
            sub = patch._replace(mask=patch.mask & keep)
            scale = 1.0 / p
        ll = scale * elbo_likelihood(vp, sub, bg_E_G, bg_var_G)
        if include_kl:
            ll = ll + subtract_kl(vp)
        return ll

    schedule = optax.cosine_decay_schedule(
        config.learning_rate, config.steps,
        alpha=config.final_lr_fraction)
    opt = optax.adam(schedule)
    opt_state0 = opt.init(free0)

    def step(carry, key_t):
        free, opt_state = carry
        loss, grad = jax.value_and_grad(
            lambda f: -estimate(f, key_t))(free)
        updates, opt_state = opt.update(grad, opt_state, free)
        free = optax.apply_updates(free, updates)
        return (free, opt_state), -loss

    keys = jax.random.split(key, config.steps)
    (free, _), trace = jax.lax.scan(step, (free0, opt_state0), keys)

    vp = bijectors.to_bound(free, bounds)
    full = elbo_likelihood(vp, patch, bg_E_G, bg_var_G)
    if include_kl:
        full = full + subtract_kl(vp)
    return SVIResult(vp=vp, elbo=full, elbo_trace=trace)


@partial(jax.jit, static_argnames=("include_kl", "config"))
def fit_sources_svi(key, vp0s, patches, bg_E_G=None, bg_var_G=None,
                    include_kl=True, config: SVIConfig = SVIConfig()):
    """Batched SVI fits: vp0s (S, 44), patches with leading S axis."""
    keys = jax.random.split(key, vp0s.shape[0])
    fit = partial(svi_maximize, include_kl=include_kl, config=config)
    if bg_E_G is None:
        return jax.vmap(lambda k, v, pch: fit(k, v, pch))(keys, vp0s,
                                                          patches)
    return jax.vmap(fit)(keys, vp0s, patches, bg_E_G, bg_var_G)
