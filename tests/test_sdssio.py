"""SDSS reader round-trip tests against synthetic fixtures
(test_sdssio.jl semantics, with generated rather than downloaded fields)."""

import numpy as np
import pytest

from celeste_jl_tpu.io.dataset import BoundingBox
from celeste_jl_tpu.io.sdss import (RunCamcolField, SDSSDataSet,
                                    read_photoobj)
from celeste_jl_tpu.io.fits import open_fits
from celeste_jl_tpu.models.psf import render_psf

from sdss_fixtures import H, W, fixture_wcs, make_sdss_field


@pytest.fixture(scope="module")
def field_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("sdss")
    rcf, truth, wcs = make_sdss_field(base)
    return base, rcf, truth, wcs


def test_load_field_images_shapes_and_calibration(field_dir):
    base, rcf, truth, wcs = field_dir
    ds = SDSSDataSet(str(base))
    images = ds.load_field_images(rcf)
    assert len(images) == 5
    for img in images:
        assert img.pixels.shape == (H, W)
        np.testing.assert_allclose(img.nelec_per_nmgy, 800.0)
        assert np.nanmin(img.pixels) >= 0.0
        # sky is materialized per pixel, in nMgy
        assert img.sky.shape == (H, W)
        np.testing.assert_allclose(img.sky, 0.15, rtol=1e-5)


def test_mask_applied_as_nans(field_dir):
    base, rcf, truth, wcs = field_dir
    images = SDSSDataSet(str(base)).load_field_images(rcf)
    r_band = images[2]
    assert np.all(np.isnan(r_band.pixels[5:9, 5:9]))
    assert not np.any(np.isnan(images[0].pixels))  # only r was masked


def test_frame_pixels_match_forward_render(field_dir):
    base, rcf, truth, wcs = field_dir
    images = SDSSDataSet(str(base)).load_field_images(rcf)
    # electrons = nelec * (frame_nmgy + sky): the star pixel region must
    # carry far more electrons than blank sky
    img = images[2]
    star_pix = np.asarray(wcs.world_to_pix(truth[0].pos)).astype(int)
    peak = img.pixels[star_pix[0] - 1, star_pix[1] - 1]
    blank = np.nanmedian(img.pixels)
    assert peak > 3 * blank


def test_fitted_psf_matches_eigenimage(field_dir):
    base, rcf, truth, wcs = field_dir
    images = SDSSDataSet(str(base)).load_field_images(rcf)
    psfmap = images[2].meta["psfmap"]
    stamp = psfmap(H / 2.0, W / 2.0)
    model = np.asarray(render_psf(images[2].psf, size=stamp.shape[0]))
    assert np.max(np.abs(model - stamp)) / stamp.max() < 0.05


def test_wcs_roundtrip(field_dir):
    base, rcf, truth, wcs = field_dir
    images = SDSSDataSet(str(base)).load_field_images(rcf)
    img = images[0]
    pix = np.array([40.0, 30.0])
    np.testing.assert_allclose(img.world_to_pix(img.pix_to_world(pix)), pix,
                               atol=1e-8)


def test_photoobj_catalog_filtering_and_values(field_dir):
    base, rcf, truth, wcs = field_dir
    ds = SDSSDataSet(str(base))
    catalog = ds.load_field_catalog(rcf)
    assert len(catalog) == len(truth)  # flagged row filtered out
    for ce, t in zip(catalog, truth):
        np.testing.assert_allclose(ce.pos, t.pos, atol=1e-9)
        assert ce.is_star == t.is_star
        if not t.is_star:
            np.testing.assert_allclose(ce.gal_fluxes, t.gal_fluxes,
                                       rtol=1e-5)
            np.testing.assert_allclose(ce.gal_axis_ratio, t.gal_axis_ratio,
                                       rtol=1e-5)


def test_load_images_by_bounding_box(field_dir):
    base, rcf, truth, wcs = field_dir
    ds = SDSSDataSet(str(base))
    lo = wcs.pix_to_world([10.0, 10.0])
    hi = wcs.pix_to_world([60.0, 50.0])
    box = BoundingBox(min(lo[0], hi[0]), max(lo[0], hi[0]),
                      min(lo[1], hi[1]), max(lo[1], hi[1]))
    assert ds.get_overlapping_fields(box) == [rcf]
    images = ds.load_images(box)
    assert len(images) == 5
    empty = BoundingBox(10.0, 11.0, -5.0, -4.0)
    assert ds.get_overlapping_fields(empty) == []


def test_end_to_end_inference_on_sdss_field(field_dir):
    """Config-4 smoke: load field -> detect -> joint VI -> recover truth."""
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.ops.newton import NewtonConfig
    from celeste_jl_tpu.parallel.run import infer_box
    from celeste_jl_tpu.utils.config import Config

    base, rcf, truth, wcs = field_dir
    images = SDSSDataSet(str(base)).load_field_images(rcf)
    results = infer_box(images, method="joint_vi",
                        config=Config(num_joint_vi_iters=2), thresh=8.0,
                        boxsize=(H, W))
    assert len(results) == len(truth)
    # match results to truth by position
    for res in results:
        dists = [np.linalg.norm(res.vs[ids.pos] - t.pos) for t in truth]
        t = truth[int(np.argmin(dists))]
        i = 0 if t.is_star else 1
        flux = np.exp(res.vs[ids.flux_loc[i]]
                      + 0.5 * res.vs[ids.flux_scale[i]])
        truth_flux = (t.star_fluxes if t.is_star else t.gal_fluxes)[2]
        assert abs(flux - truth_flux) / truth_flux < 0.25, (flux, truth_flux)
