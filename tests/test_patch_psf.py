"""Per-patch spatially-varying PSF (model/imaged_sources.jl:97-107 +
SDSSIO.jl:239-298): a psField-style eigenimage psfmap with strong spatial
variation must bias fluxes when only the field-center PSF is used, and the
per-patch path must recover them."""

import numpy as np
import pytest

from celeste_jl_tpu.io.sdss import SDSSPSFMap
from celeste_jl_tpu.models.image import Image
from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.models.psf import make_psf, render_psf
from celeste_jl_tpu.models.psf_fit import (fit_patch_psfs, fit_raw_psf,
                                           trim_psf)
from celeste_jl_tpu.synthetic import gen_images, sample_star

SIGMA_NARROW, SIGMA_WIDE = 1.0, 3.0
H = W = 40
STAMP = 31


def _gauss_stamp(sigma, size=STAMP):
    c = (size + 1) / 2.0
    i = np.arange(1, size + 1)
    x1, x2 = np.meshgrid(i, i, indexing="ij")
    r2 = (x1 - c) ** 2 + (x2 - c) ** 2
    g = np.exp(-0.5 * r2 / sigma ** 2) / (2 * np.pi * sigma ** 2)
    return g


def make_varying_psfmap():
    """PSF(x) = (1 - w(x)) * narrow + w(x) * wide with w going 0 -> 1 across
    the image's x range: eigen 0 = narrow, eigen 1 = wide - narrow, and the
    eigen-1 polynomial weight is linear in x (psField 'c' matrix layout,
    SDSSIO.jl:239-298)."""
    narrow = _gauss_stamp(SIGMA_NARROW)
    wide = _gauss_stamp(SIGMA_WIDE)
    rrows = np.stack([narrow.ravel(order="F"),
                      (wide - narrow).ravel(order="F")], axis=1)
    cmat = np.zeros((2, 1, 2))
    cmat[0, 0, 0] = 1.0                              # w0(x, y) = 1
    cmat[1, 0, 1] = 1.0 / (SDSSPSFMap.RCS * (W - 1))  # w1(x) = (x-1)/(W-1)
    return SDSSPSFMap(rrows, STAMP, STAMP, cmat)


def local_weight(x):
    return (x - 1.0) / (W - 1.0)


def local_psf_packed(x):
    """True local PSF as a packed 2-component mixture."""
    w = local_weight(x)
    return make_psf([1.0 - w, w], [np.zeros(2), np.zeros(2)],
                    [np.eye(2) * SIGMA_NARROW ** 2,
                     np.eye(2) * SIGMA_WIDE ** 2])


def test_psfmap_at_matches_scalar_call():
    m = make_varying_psfmap()
    xs = np.array([1.0, 10.5, 36.0])
    ys = np.array([3.0, 20.0, 39.0])
    batched = m.at(xs, ys)
    for i in range(3):
        np.testing.assert_allclose(batched[i], m(xs[i], ys[i]), atol=1e-14)


def test_psfmap_interpolates_between_eigenimages():
    m = make_varying_psfmap()
    np.testing.assert_allclose(m(1.0, 20.0), _gauss_stamp(SIGMA_NARROW),
                               atol=1e-12)
    np.testing.assert_allclose(m(float(W), 20.0), _gauss_stamp(SIGMA_WIDE),
                               atol=1e-12)


def _field_images(src_x):
    """5-band synthetic field: star at (src_x, 20), pixels rendered with the
    TRUE local PSF, Image.psf fitted at the image center exactly as
    load_field_images does (io/sdss.py:392-394)."""
    psfmap = make_varying_psfmap()
    center_stamp = psfmap(H / 2.0, W / 2.0)
    center_psf, _ = fit_raw_psf(trim_psf(center_stamp), K=2)
    star = sample_star(pos=(src_x, 20.0), r_flux=20.0)
    true_psf = local_psf_packed(src_x)
    images = [Image(pixels=np.zeros((H, W)), band=b, psf=np.asarray(true_psf),
                    sky=0.1, nelec_per_nmgy=1000.0,
                    meta={"psfmap": psfmap}) for b in range(5)]
    gen_images(images, [star], expectation=True)
    # inference sees the center-fitted PSF as the per-image global PSF
    for img in images:
        img.psf = center_psf
    return images, star


def test_fit_patch_psfs_recovers_local_width():
    images, star = _field_images(src_x=36.0)
    table = fit_patch_psfs(images, [star.pos])
    assert table.shape[:2] == (1, 5)
    # the fitted local mixture must match the true local PSF's density
    true_stamp = np.asarray(render_psf(local_psf_packed(36.0), size=STAMP))
    fit_stamp = np.asarray(render_psf(table[0, 0], size=STAMP))
    assert np.max(np.abs(fit_stamp - true_stamp)) / true_stamp.max() < 2e-2


def test_fit_patch_psfs_falls_back_without_psfmap():
    images, star = _field_images(src_x=36.0)
    for img in images:
        img.meta = {}
    table = fit_patch_psfs(images, [star.pos])
    np.testing.assert_allclose(table[0, 0], images[0].psf)


@pytest.mark.parametrize("src_x", [36.0])
def test_per_patch_psf_removes_flux_bias(src_x):
    from celeste_jl_tpu.parallel.run import one_node_single_infer
    from celeste_jl_tpu.utils.config import Config

    images, star = _field_images(src_x)
    cfg = Config(min_radius_pix=12.0)
    true_flux = star.star_fluxes[2]

    def recovered_flux(use_psfmap):
        imgs = [Image(pixels=img.pixels, band=img.band, psf=img.psf,
                      sky=img.sky, nelec_per_nmgy=img.nelec_per_nmgy,
                      meta=(img.meta if use_psfmap else {}))
                for img in images]
        res = one_node_single_infer([star], imgs, config=cfg)[0]
        i = 0 if res.vs[ids.is_star[0]] > 0.5 else 1
        return float(np.exp(res.vs[ids.flux_loc[i]])), res.vs

    flux_center, _ = recovered_flux(use_psfmap=False)
    flux_patch, vs_patch = recovered_flux(use_psfmap=True)
    err_center = abs(flux_center - true_flux) / true_flux
    err_patch = abs(flux_patch - true_flux) / true_flux
    # the off-center source is materially biased under the field-center PSF
    # and recovered under the per-patch PSF
    assert err_patch < 0.03, (flux_patch, true_flux)
    assert err_patch < err_center, (err_patch, err_center)
    assert vs_patch[ids.is_star[0]] > 0.5  # still a star
