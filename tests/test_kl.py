"""Closed-form KL divergences vs Monte Carlo estimates (test_kl.jl:13-40:
each KL must lie within 4 MC standard errors of a large-sample estimate)."""

import numpy as np
import pytest

from celeste_jl_tpu.vi.elbo import (PRIOR, categorical_kl, diagmvn_mvn_kl,
                                    gaussian_kl, subtract_kl)
from celeste_jl_tpu.vi.init import generic_init_source

N_SAMPLES = 1_000_000
RNG = np.random.default_rng(7)


def _assert_mc_close(closed_form, log_ratio_samples):
    mc = log_ratio_samples.mean()
    se = log_ratio_samples.std() / np.sqrt(len(log_ratio_samples))
    assert abs(closed_form - mc) < 4 * max(se, 1e-12), (closed_form, mc, se)


def test_categorical_kl_vs_mc():
    p = np.array([0.3, 0.7])
    q = np.array([0.6, 0.4])
    draws = RNG.choice(2, size=N_SAMPLES, p=p)
    log_ratio = np.log(p[draws]) - np.log(q[draws])
    _assert_mc_close(float(categorical_kl(p, q)), log_ratio)


def test_gaussian_kl_vs_mc():
    mu1, var1, mu2, var2 = 0.5, 0.25, -0.3, 2.0
    x = RNG.normal(mu1, np.sqrt(var1), size=N_SAMPLES)

    def logpdf(x, mu, var):
        return -0.5 * (np.log(2 * np.pi * var) + (x - mu) ** 2 / var)

    log_ratio = logpdf(x, mu1, var1) - logpdf(x, mu2, var2)
    _assert_mc_close(float(gaussian_kl(mu1, var1, mu2, var2)), log_ratio)


def test_diagmvn_mvn_kl_vs_mc():
    d = 4
    mu1 = np.array([0.1, -0.2, 0.3, 0.0])
    var1 = np.array([0.5, 0.8, 0.3, 1.2])
    mu2 = np.array([-0.1, 0.1, 0.0, 0.2])
    A = RNG.normal(size=(d, d))
    cov2 = A @ A.T / d + np.eye(d)
    inv2 = np.linalg.inv(cov2)
    logdet2 = np.linalg.slogdet(cov2)[1]

    x = mu1 + np.sqrt(var1) * RNG.normal(size=(N_SAMPLES, d))
    lp1 = -0.5 * (np.sum(np.log(2 * np.pi * var1))
                  + np.sum((x - mu1) ** 2 / var1, axis=1))
    dx = x - mu2
    lp2 = -0.5 * (d * np.log(2 * np.pi) + logdet2
                  + np.einsum("ni,ij,nj->n", dx, inv2, dx))
    closed = float(diagmvn_mvn_kl(mu1, var1, mu2, inv2, logdet2))
    _assert_mc_close(closed, lp1 - lp2)


def test_subtract_kl_vs_mc_full_source():
    """End-to-end: -subtract_kl (minus the gal-radius log-prior term) equals
    the MC KL of the full variational posterior against the prior."""
    vp = generic_init_source(np.array([10.0, 10.0]))
    vp[26:28] = [0.4, 0.6]
    vp[6:8] = [1.2, 0.9]      # flux_loc
    vp[8:10] = [0.04, 0.05]   # flux_scale
    vp[10:18] = 0.3           # color_mean
    vp[18:26] = 0.02          # color_var

    n = 200_000
    a = RNG.choice(2, size=n, p=vp[26:28])
    log_ratio = np.log(vp[26:28][a]) - np.log(np.asarray(PRIOR.is_star)[a])

    for i in range(2):
        sel = a == i
        m = sel.sum()
        # flux KL
        x = RNG.normal(vp[6 + i], np.sqrt(vp[8 + i]), size=m)
        lr = (-0.5 * (np.log(vp[8 + i]) + (x - vp[6 + i]) ** 2 / vp[8 + i])
              + 0.5 * (np.log(PRIOR.flux_var[i])
                       + (x - PRIOR.flux_mean[i]) ** 2 / PRIOR.flux_var[i]))
        log_ratio[sel] += lr
        # color-component categorical + color MVN
        k = np.full(8, 1.0 / 8)
        d = RNG.choice(8, size=m, p=k)
        log_ratio[sel] += np.log(k[d]) - np.log(np.asarray(PRIOR.k)[d, i])
        cm = vp[10:18].reshape(2, 4).T[:, i]
        cv = vp[18:26].reshape(2, 4).T[:, i]
        c = cm + np.sqrt(cv) * RNG.normal(size=(m, 4))
        lq = -0.5 * (np.sum(np.log(2 * np.pi * cv))
                     + np.sum((c - cm) ** 2 / cv, axis=1))
        mu_p = np.asarray(PRIOR.color_mean)[:, d, i].T          # (m, 4)
        inv_p = np.asarray(PRIOR.color_cov_inv)[:, :, d, i]     # (4,4,m)
        ld_p = np.asarray(PRIOR.color_cov_logdet)[d, i]
        dc = c - mu_p
        lp = -0.5 * (4 * np.log(2 * np.pi) + ld_p
                     + np.einsum("ni,ijn,nj->n", dc, inv_p, dc))
        log_ratio[sel] += lq - lp

    # subtract_kl = -KL + gal-radius log prior term; remove the latter
    x = vp[5]
    radius_term = -0.5 * (np.log(2 * np.pi)
                          + np.log(PRIOR.gal_radius_px_var)
                          + (x - PRIOR.gal_radius_px_mean) ** 2
                          / PRIOR.gal_radius_px_var)
    closed_kl = -(float(subtract_kl(np.asarray(vp))) - radius_term)
    _assert_mc_close(closed_kl, log_ratio)
