"""The independent truth renderer must agree with the model's forward
renderer to float64 precision — this is the check that makes the GalSim
suite a real test of models/fsm.py (VERDICT: the reference uses GalSim as an
external renderer so renderer bugs can't cancel)."""

import numpy as np

from celeste_jl_tpu.benchmark.independent_render import render_scene_nmgy
from celeste_jl_tpu.models.image import Image
from celeste_jl_tpu.models.psf import make_psf
from celeste_jl_tpu.io.wcs import LinearWCS
from celeste_jl_tpu.synthetic import (render_source_nmgy, sample_galaxy,
                                      sample_star)

H = W = 40


def _image(psf):
    return Image(pixels=np.zeros((H, W)), band=2, psf=np.asarray(psf),
                 sky=0.05, nelec_per_nmgy=1000.0)


def _psf():
    return make_psf([0.7, 0.3],
                    [[0.1, -0.2], [0.0, 0.3]],
                    [np.array([[1.8, 0.2], [0.2, 1.4]]),
                     np.array([[5.0, -0.4], [-0.4, 6.0]])])


def _model_dense(img, ce):
    # tile big enough to cover the whole image so truncation can't differ
    return render_source_nmgy(img, ce, tile_size=128, radius=100)


def test_star_agrees_with_model_renderer():
    img = _image(_psf())
    ce = sample_star(pos=(17.3, 22.8), r_flux=12.0)
    model = _model_dense(img, ce)
    indep = render_scene_nmgy([img], [ce])[0]
    assert np.max(np.abs(model - indep)) < 1e-6 * model.max()


def test_galaxy_agrees_with_model_renderer():
    img = _image(_psf())
    ce = sample_galaxy(pos=(20.6, 18.1), r_flux=30.0, gal_frac_dev=0.35,
                       gal_axis_ratio=0.45, gal_angle=0.8, gal_radius_px=2.5)
    model = _model_dense(img, ce)
    indep = render_scene_nmgy([img], [ce])[0]
    assert np.max(np.abs(model - indep)) < 1e-6 * model.max()


def test_world_wcs_and_multiple_sources():
    wcs = LinearWCS(crpix=(0.0, 0.0), crval=(30.0, 5.0), cd=np.eye(2) * 1e-4)
    img = Image(pixels=np.zeros((H, W)), band=2, psf=np.asarray(_psf()),
                sky=0.05, nelec_per_nmgy=1000.0, wcs=wcs)
    star = sample_star(pos=wcs.pix_to_world(np.array([15.0, 15.0])),
                       r_flux=12.0)
    gal = sample_galaxy(pos=wcs.pix_to_world(np.array([28.0, 24.0])),
                        r_flux=30.0)
    model = _model_dense(img, star) + _model_dense(img, gal)
    indep = render_scene_nmgy([img], [star, gal])[0]
    assert np.max(np.abs(model - indep)) < 1e-6 * model.max()


def test_flux_is_conserved():
    # on a wide grid the mixture integrates to the flux (pixel quadrature)
    img = Image(pixels=np.zeros((200, 200)), band=2,
                psf=np.asarray(_psf()), sky=0.0, nelec_per_nmgy=1.0)
    ce = sample_star(pos=(100.0, 100.0), r_flux=7.0)
    indep = render_scene_nmgy([img], [ce])[0]
    np.testing.assert_allclose(indep.sum(), 7.0, rtol=1e-6)
