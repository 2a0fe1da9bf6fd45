"""WCS & coordinates tests (test_wcs.jl / test_coordinates.jl analogs)."""

import numpy as np

from celeste_jl_tpu.io.wcs import LinearWCS, TanWCS, wcs_from_header
from celeste_jl_tpu.utils.coordinates import (angular_separation,
                                              match_coordinates)


def _sdss_like_tan():
    # ~0.396 arcsec/pixel, slight rotation, centered on (150.0, 2.2) deg
    scale = 0.396 / 3600.0
    th = 0.1
    cd = scale * np.array([[np.cos(th), -np.sin(th)],
                           [np.sin(th), np.cos(th)]])
    return TanWCS(crpix=[1024.5, 744.5], crval=[150.0, 2.2], cd=cd)


def test_tan_roundtrip():
    wcs = _sdss_like_tan()
    rng = np.random.default_rng(0)
    for _ in range(20):
        pix = rng.uniform(1, 2000, size=2)
        world = wcs.pix_to_world(pix)
        back = wcs.world_to_pix(world)
        np.testing.assert_allclose(back, pix, atol=1e-8)


def test_tan_reference_point():
    wcs = _sdss_like_tan()
    np.testing.assert_allclose(wcs.pix_to_world(wcs.crpix),
                               wcs.crval, atol=1e-12)


def test_jacobian_consistency():
    wcs = _sdss_like_tan()
    pix = np.array([500.0, 600.0])
    J = wcs.pixel_world_jacobian(pix)
    world = wcs.pix_to_world(pix)
    # linearized transform should track true transform nearby
    for dw in [np.array([1e-4, 0.0]), np.array([0.0, 1e-4]),
               np.array([5e-5, -8e-5])]:
        true_pix = wcs.world_to_pix(world + dw)
        lin_pix = pix + J @ dw
        np.testing.assert_allclose(lin_pix, true_pix, atol=2e-4)


def test_linear_wcs_roundtrip():
    wcs = LinearWCS(crpix=[10.0, 20.0], crval=[1.0, 2.0],
                    cd=np.array([[2.0, 0.1], [-0.1, 0.5]]))
    pix = np.array([33.0, 44.0])
    np.testing.assert_allclose(wcs.world_to_pix(wcs.pix_to_world(pix)), pix,
                               atol=1e-10)


def test_wcs_from_header():
    hdr = {"CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN", "CRPIX1": 5.0,
           "CRPIX2": 6.0, "CRVAL1": 10.0, "CRVAL2": -3.0,
           "CD1_1": 1e-4, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 1e-4}
    wcs = wcs_from_header(hdr)
    assert isinstance(wcs, TanWCS)
    np.testing.assert_allclose(wcs.pix_to_world([5.0, 6.0]), [10.0, -3.0])


def test_angular_separation():
    assert np.isclose(angular_separation(0.0, 0.0, 90.0, 0.0), 90.0)
    assert np.isclose(angular_separation(10.0, 20.0, 10.0, 20.0), 0.0)
    # small separation ~ euclidean
    d = angular_separation(150.0, 2.0, 150.0, 2.0 + 1.0 / 3600.0)
    assert np.isclose(d * 3600.0, 1.0, rtol=1e-6)


def test_match_coordinates():
    ra2 = np.array([10.0, 20.0, 30.0])
    dec2 = np.array([0.0, 5.0, -5.0])
    idx, dist = match_coordinates([20.0001, 30.0], [5.0, -5.0], ra2, dec2)
    assert list(idx) == [1, 2]
    assert dist[1] < 1e-9
    assert np.isclose(dist[0] * 3600.0, 0.0001 * 3600.0 * np.cos(np.deg2rad(5.0)),
                      rtol=1e-3)
