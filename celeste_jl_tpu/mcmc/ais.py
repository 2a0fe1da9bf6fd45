"""Annealed importance sampling over a slice-sampling kernel
(mcmc/ais.jl rebuilt as lax.scan loops)."""

import jax
import jax.numpy as jnp
import numpy as np

from .slice import slicesample


def sigmoid_schedule(num_steps, rad=4.0):
    """Temperature ladder concentrated near 0 and 1 (ais.jl:94-101)."""
    if num_steps == 1:
        return np.linspace(0.0, 1.0, 2)
    t = np.linspace(-rad, rad, num_steps)
    sigm = 1.0 / (1.0 + np.exp(-t))
    return (sigm - sigm.min()) / (sigm.max() - sigm.min())


def ais(key, logpost, logprior, z0, schedule, sigma=1.0):
    """One AIS run: anneal z0 ~ prior through p_t ∝ post^t * prior^(1-t).

    Returns (z_final, ln_weight). The per-step importance ratio
    ln p_t(z) - ln p_{t-1}(z) reduces to (t - t_prev) * loglike(z) since
    logpost = loglike + logprior (ais.jl:17-63).
    """
    schedule = jnp.asarray(schedule)
    pairs = jnp.stack([schedule[:-1], schedule[1:]], axis=1)

    def body(carry, inp):
        z, key = carry
        tprev, t = inp[0], inp[1]
        key, kt = jax.random.split(key)

        def lnpdf_t(zz):
            return t * logpost(zz) + (1.0 - t) * logprior(zz)

        z, _ = slicesample(kt, z, lnpdf_t, sigma=sigma)
        llr = (t - tprev) * (logpost(z) - logprior(z))
        return (z, key), llr

    (z, _), llrs = jax.lax.scan(body, (z0, key), pairs)
    return z, jnp.sum(llrs)


def ais_slicesample(key, logpost, logprior, sample_prior, schedule,
                    num_samps=10, sigma=1.0):
    """num_samps independent AIS runs (vmapped). Returns dict with
    zsamps (num_samps, D) and lnZ weight samples (ais.jl:106-143)."""
    k_init, k_run = jax.random.split(key)
    z0s = jax.vmap(sample_prior)(jax.random.split(k_init, num_samps))
    runs = jax.vmap(lambda k, z: ais(k, logpost, logprior, z, schedule,
                                     sigma=sigma))
    zs, ws = runs(jax.random.split(k_run, num_samps), z0s)
    lnZ = jax.scipy.special.logsumexp(ws) - jnp.log(num_samps)
    return {"zsamps": zs, "lnZsamps": ws, "lnZ": lnZ}


def bootstrap_lnZ(key, lnZ_samps, num_bootstrap=100):
    """Bootstrap distribution of the lnZ estimator (ais.jl:75-83)."""
    n = lnZ_samps.shape[0]
    idx = jax.random.randint(key, (num_bootstrap, n), 0, n)
    boots = lnZ_samps[idx]
    return jax.scipy.special.logsumexp(boots, axis=1) - jnp.log(n)
