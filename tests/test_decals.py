"""DECaLS overlap-query tests (test_decalsio.jl semantics)."""

import numpy as np
import pytest

from celeste_jl_tpu.io.dataset import BoundingBox
from celeste_jl_tpu.io.decals import DECALSDataSet
from celeste_jl_tpu.io.fits import write_fits


def _write_ccds(path, crvals):
    n = len(crvals)
    scale = 0.262 / 3600.0  # DECam arcsec/px
    write_fits(path, [
        (None, None),
        ({"crpix1": np.full(n, 1024.0, np.float32),
          "crpix2": np.full(n, 2048.0, np.float32),
          "crval1": np.array([c[0] for c in crvals], np.float64),
          "crval2": np.array([c[1] for c in crvals], np.float64),
          "cd1_1": np.full(n, scale, np.float32),
          "cd1_2": np.zeros(n, np.float32),
          "cd2_1": np.zeros(n, np.float32),
          "cd2_2": np.full(n, scale, np.float32),
          "width": np.full(n, 2046, np.int16),
          "height": np.full(n, 4094, np.int16)}, None)])


def test_overlap_query(tmp_path):
    _write_ccds(tmp_path / "survey-ccds-decals.fits",
                [(150.0, 2.0), (151.0, 2.0), (150.0, -30.0)])
    ds = DECALSDataSet(tmp_path)
    idx = ds.get_overlapping_ccds(BoundingBox(149.9, 150.1, 1.9, 2.1))
    assert list(idx) == [0]
    idx = ds.get_overlapping_ccds(BoundingBox(140.0, 152.0, -31.0, 3.0))
    assert list(idx) == [0, 1, 2]
    assert len(ds.get_overlapping_ccds(BoundingBox(10.0, 11.0, 0.0, 1.0))) == 0


def test_overlap_query_ra_wraparound(tmp_path):
    # CCD centered at RA ~= 359.95: its extent crosses RA=0
    _write_ccds(tmp_path / "survey-ccds-decals.fits", [(359.95, 0.0)])
    ds = DECALSDataSet(tmp_path)
    idx = ds.get_overlapping_ccds(BoundingBox(359.90, 359.99, -0.5, 0.5))
    assert list(idx) == [0]


def _write_decals_fixture(basedir, seed=5):
    """Render grz CCDs of one star with the forward model and write a
    legacypipe-style layout: survey-ccds table + per-CCD calibrated
    (sky-subtracted, nMgy) image files. Returns (truth, nelec_per_nmgy)."""
    import os

    from celeste_jl_tpu.io.wcs import TanWCS
    from celeste_jl_tpu.models.image import Image
    from celeste_jl_tpu.models.psf import gaussian_psf
    from celeste_jl_tpu.synthetic import gen_images, sample_star

    H, W = 80, 64
    scale = 0.262 / 3600.0
    crval = (150.0, 2.0)
    wcs = TanWCS(crpix=[H / 2, W / 2], crval=crval,
                 cd=np.eye(2) * scale)
    truth = [sample_star(pos=wcs.pix_to_world([40.0, 30.0]), r_flux=50.0)]
    exptime, zpt = 100.0, 25.0
    nelec_per_nmgy = exptime * 10.0 ** ((zpt - 22.5) / 2.5)
    sky_nmgy = 0.2
    fwhm_px = 3.5

    filters, filenames = [], []
    for f in ("g", "r", "z"):
        band = {"g": 1, "r": 2, "z": 4}[f]
        psf = gaussian_psf(sigma=fwhm_px / 2.355, K=2)
        img = Image(pixels=np.zeros((H, W)), band=band, psf=psf,
                    sky=sky_nmgy, nelec_per_nmgy=nelec_per_nmgy, wcs=wcs)
        gen_images([img], truth, seed=seed)
        calibrated_nmgy = img.pixels / nelec_per_nmgy - sky_nmgy
        fname = f"decam-00001-{f}.image.fits"
        write_fits(os.path.join(str(basedir), fname),
                   [(calibrated_nmgy.astype(np.float32), None)])
        filters.append(f)
        filenames.append(fname)

    n = len(filters)
    write_fits(os.path.join(str(basedir), "survey-ccds-decals.fits"), [
        (None, None),
        ({"crpix1": np.full(n, H / 2, np.float64),
          "crpix2": np.full(n, W / 2, np.float64),
          "crval1": np.full(n, crval[0], np.float64),
          "crval2": np.full(n, crval[1], np.float64),
          "cd1_1": np.full(n, scale, np.float64),
          "cd1_2": np.zeros(n, np.float64),
          "cd2_1": np.zeros(n, np.float64),
          "cd2_2": np.full(n, scale, np.float64),
          "width": np.full(n, H, np.int32),
          "height": np.full(n, W, np.int32),
          "filter": np.array(filters, dtype="S4"),
          "exptime": np.full(n, exptime, np.float32),
          "ccdzpt": np.full(n, zpt, np.float32),
          "fwhm": np.full(n, fwhm_px, np.float32),
          "image_filename": np.array(filenames, dtype="S40"),
          "image_hdu": np.zeros(n, np.int16)}, None)])
    return truth, nelec_per_nmgy, sky_nmgy


def test_load_images_end_to_end(tmp_path):
    """DECaLS loading is implemented here (the reference's load_images
    raises 'Not yet implemented', DECALSIO.jl:111-149): calibrated CCDs ->
    Images with reconstructed sky -> detection finds the planted star."""
    from celeste_jl_tpu.detection.detect import detect_sources
    from celeste_jl_tpu.utils.coordinates import angular_separation

    truth, nelec, sky_nmgy = _write_decals_fixture(tmp_path)
    ds = DECALSDataSet(tmp_path)
    box = BoundingBox(149.99, 150.01, 1.99, 2.01)
    images = ds.load_images(box)
    assert len(images) == 3
    assert sorted(im.band for im in images) == [1, 2, 4]
    for im in images:
        assert np.isfinite(im.pixels).all()
        np.testing.assert_allclose(im.nelec_per_nmgy, nelec)
        # reconstructed sky should be within ~25% of the truth
        assert abs(np.median(np.asarray(im.sky)) - sky_nmgy) / sky_nmgy < 0.25

    catalog, _ = detect_sources(images, thresh=5.0, boxsize=(64, 64))
    assert len(catalog) == 1
    sep = angular_separation(catalog[0].pos[0], catalog[0].pos[1],
                             truth[0].pos[0], truth[0].pos[1])
    assert sep < 1.0 / 3600.0  # within 1 arcsec
