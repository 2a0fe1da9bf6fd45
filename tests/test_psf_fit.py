"""PSF GMM fitting tests (test_psf.jl semantics): fit a known mixture's
raster and recover the density; batched fits agree with single fits."""

import numpy as np
import pytest

from celeste_jl_tpu.models.psf import gaussian_psf, make_psf, render_psf
from celeste_jl_tpu.models.psf_fit import (fit_psfs_batched, fit_raw_psf,
                                           psf_mixture_density, trim_psf)


def _true_psf():
    alphas = [0.6, 0.4]
    mus = [[0.3, -0.2], [0.0, 0.1]]
    covs = [np.array([[2.0, 0.3], [0.3, 1.5]]),
            np.array([[6.0, -0.5], [-0.5, 7.0]])]
    return make_psf(alphas, mus, covs)


def test_fit_recovers_known_mixture_density():
    truth = _true_psf()
    stamp = np.asarray(render_psf(truth, size=41))
    fitted, err = fit_raw_psf(stamp, K=2)
    model = np.asarray(render_psf(fitted, size=41))
    # pointwise density error small relative to the peak
    assert np.max(np.abs(model - stamp)) / stamp.max() < 5e-3
    assert err < 1e-6


def test_fit_total_flux_near_one():
    stamp = np.asarray(render_psf(gaussian_psf(sigma=1.4), size=41))
    fitted, _ = fit_raw_psf(stamp, K=2)
    assert abs(fitted[:, 0].sum() - 1.0) < 0.02


def test_batched_fits_each_recover_stamp():
    # vmapped fits take (harmlessly) different Newton paths than single
    # fits, so compare each against the stamp, not against each other.
    stamps = np.stack([np.asarray(render_psf(gaussian_psf(sigma=s), size=31))
                       for s in (1.2, 1.8)])
    packed, errs = fit_psfs_batched(stamps, K=2)
    for i in range(2):
        model = np.asarray(render_psf(packed[i], size=31))
        assert np.max(np.abs(model - stamps[i])) / stamps[i].max() < 1e-3
    assert np.all(errs < 1e-6)


def test_trim_psf_keeps_mass():
    stamp = np.asarray(render_psf(gaussian_psf(sigma=1.0), size=51))
    trimmed = trim_psf(stamp, trim_percent=0.99)
    assert trimmed.shape[0] < 51
    assert trimmed.sum() > 0.98 * stamp.sum()
