"""FITS image-bundle round trip (AccuracyBenchmark.jl:478-585, 694-799):
images + header PSF + CL* truth survive write/read, and inference on the
read-back images recovers the planted source."""

import numpy as np

from celeste_jl_tpu.benchmark.bundle import (read_image_bundle,
                                             write_image_bundle)
from celeste_jl_tpu.benchmark.galsim import SCENES_BY_NAME, render_scene


def test_bundle_roundtrip(tmp_path):
    images, truth = render_scene(SCENES_BY_NAME["galaxy_with_all"])
    path = str(tmp_path / "bundle.fits")
    write_image_bundle(path, images, truth)

    images2, truth2 = read_image_bundle(path)
    assert len(images2) == len(images) == 5
    assert len(truth2) == len(truth) == 1

    for a, b in zip(images, images2):
        assert a.band == b.band
        np.testing.assert_allclose(np.asarray(b.pixels),
                                   np.asarray(a.pixels, np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b.psf), np.asarray(a.psf),
                                   rtol=1e-9)
        np.testing.assert_allclose(float(np.median(np.asarray(b.sky))),
                                   float(np.median(np.asarray(a.sky))),
                                   rtol=1e-6)
        np.testing.assert_allclose(b.wcs.cd, a.wcs.cd, rtol=1e-12)

    t, t2 = truth[0], truth2[0]
    np.testing.assert_allclose(t2.pos, t.pos, rtol=1e-10)
    assert t2.is_star == t.is_star
    np.testing.assert_allclose(t2.gal_fluxes, t.gal_fluxes, rtol=1e-9)
    np.testing.assert_allclose(t2.gal_axis_ratio, t.gal_axis_ratio)
    np.testing.assert_allclose(t2.gal_radius_px, t.gal_radius_px)


def test_bundle_images_are_inferrable(tmp_path):
    """The read-back bundle feeds straight into detection (self-describing
    file, GalsimBenchmark.jl flow)."""
    from celeste_jl_tpu.detection.detect import detect_sources

    images, truth = render_scene(SCENES_BY_NAME["bright_star"])
    path = str(tmp_path / "bundle.fits")
    write_image_bundle(path, images, truth)
    images2, truth2 = read_image_bundle(path)
    catalog, _ = detect_sources(images2, thresh=5.0, boxsize=(96, 96))
    assert len(catalog) == 1
    assert np.linalg.norm(np.asarray(catalog[0].pos)
                          - np.asarray(truth2[0].pos)) < 2e-4
