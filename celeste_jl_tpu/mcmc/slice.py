"""Jittable component-wise slice sampler (mcmc/slicesample.jl rebuilt).

The reference's sampler (slicesample.jl:20-231) uses unbounded Python-style
while loops and a doubling step-out with an acceptability check. For XLA we
use Neal (2003)'s *linear* stepping-out + shrinkage — also a valid
slice-sampling transition, with bounded loops: step-out is capped at
max_steps_out (reference: 10) and shrinkage always terminates (interval
halves toward the current point, which satisfies the slice).

Everything is expressed with lax.while_loop / lax.scan so chains can be
jitted and vmapped over sources on a TPU mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _dir_slice(key, x, direction, lnpdf, sigma, max_steps_out, max_shrink):
    """One directional slice-sampling update: x' = x + z* direction."""
    k_y, k_u, k_step, k_shrink = jax.random.split(key, 4)

    def f(z):
        return lnpdf(x + z * direction)

    llh_s = f(0.0) - jax.random.exponential(k_y)  # log slice height

    upper0 = sigma * jax.random.uniform(k_u)
    lower0 = upper0 - sigma

    # linear stepping out, capped
    def step_lower(carry):
        lo, n = carry
        return lo - sigma, n + 1

    def cond_lower(carry):
        lo, n = carry
        return (f(lo) > llh_s) & (n < max_steps_out)

    lower, _ = jax.lax.while_loop(cond_lower, step_lower, (lower0, 0))

    def step_upper(carry):
        hi, n = carry
        return hi + sigma, n + 1

    def cond_upper(carry):
        hi, n = carry
        return (f(hi) > llh_s) & (n < max_steps_out)

    upper, _ = jax.lax.while_loop(cond_upper, step_upper, (upper0, 0))

    # shrinkage: sample z ~ U(lower, upper); accept if above the slice,
    # else shrink the violated side toward 0 (the current point).
    def shrink_cond(carry):
        z, ll, lo, hi, key, n, accepted = carry
        return (~accepted) & (n < max_shrink)

    def shrink_body(carry):
        z, ll, lo, hi, key, n, accepted = carry
        key, kz = jax.random.split(key)
        z_new = lo + (hi - lo) * jax.random.uniform(kz)
        ll_new = f(z_new)
        ok = ll_new > llh_s
        lo = jnp.where(ok | (z_new >= 0.0), lo, z_new)
        hi = jnp.where(ok | (z_new < 0.0), hi, z_new)
        return (jnp.where(ok, z_new, z), jnp.where(ok, ll_new, ll),
                lo, hi, key, n + 1, ok)

    z0 = jnp.asarray(0.0, x.dtype)
    z, ll, *_ = jax.lax.while_loop(
        shrink_cond, shrink_body,
        (z0, f(0.0), lower, upper, k_shrink, 0, jnp.asarray(False)))
    return x + z * direction, ll


def slicesample(key, x, lnpdf, sigma=1.0, max_steps_out=10, max_shrink=50,
                shuffle=True):
    """One full component-wise sweep (slicesample.jl:20-231 semantics:
    compwise=true, shuffled component ordering). Returns (x', loglike')."""
    D = x.shape[0]
    k_perm, k_scan = jax.random.split(key)
    order = (jax.random.permutation(k_perm, D) if shuffle
             else jnp.arange(D))
    eye = jnp.eye(D, dtype=x.dtype)

    def body(carry, inp):
        x, key = carry
        d = inp
        key, kd = jax.random.split(key)
        x, ll = _dir_slice(kd, x, eye[d], lnpdf, sigma, max_steps_out,
                           max_shrink)
        return (x, key), ll

    (x, _), lls = jax.lax.scan(body, (x, k_scan), order)
    return x, lls[-1]


def slicesample_chain(key, x0, lnpdf, n_samples, sigma=1.0, **kwargs):
    """Draw n_samples sequential samples (slicesample.jl:209-231).
    Returns (samples (N, D), loglikes (N,))."""
    def body(carry, key_t):
        x = carry
        x, ll = slicesample(key_t, x, lnpdf, sigma=sigma, **kwargs)
        return x, (x, ll)

    keys = jax.random.split(key, n_samples)
    _, (samps, lls) = jax.lax.scan(body, x0, keys)
    return samps, lls
