"""Detection subsystem tests (test_sep.jl / test_detection.jl analogs)."""

import numpy as np
import pytest

from celeste_jl_tpu.detection import _native
from celeste_jl_tpu.detection.background import Background
from celeste_jl_tpu.detection.detect import detect_sources
from celeste_jl_tpu.detection.extract import extract
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)


def _gaussian_blob(H, W, cx, cy, sigma, flux):
    ii, jj = np.mgrid[0:H, 0:W]
    return flux * np.exp(-((ii + 1 - cx) ** 2 + (jj + 1 - cy) ** 2)
                         / (2 * sigma ** 2)) / (2 * np.pi * sigma ** 2)


def test_background_flat():
    rng = np.random.default_rng(0)
    data = 5.0 + 0.1 * rng.normal(size=(128, 128))
    bkg = Background(data, boxsize=(32, 32))
    assert abs(bkg.global_back() - 5.0) < 0.05
    assert abs(bkg.global_rms() - 0.1) < 0.03
    assert np.abs(bkg.back() - 5.0).max() < 0.1


def test_background_gradient():
    ii = np.linspace(0, 1, 100)[:, None] * np.ones((1, 100))
    data = 10.0 + 4.0 * ii
    bkg = Background(data, boxsize=(25, 25))
    est = bkg.back()
    assert np.abs(est - data).mean() < 0.5


def test_extract_two_blobs():
    data = (_gaussian_blob(64, 64, 20.0, 20.0, 2.0, 500.0)
            + _gaussian_blob(64, 64, 45.0, 40.0, 2.0, 300.0))
    cat = extract(data, thresh=0.05)
    assert len(cat) == 2
    order = np.argsort(cat.x)
    assert abs(cat.x[order[0]] - 20.0) < 0.3
    assert abs(cat.y[order[0]] - 20.0) < 0.3
    assert abs(cat.x[order[1]] - 45.0) < 0.3
    assert cat.flux[order[0]] > cat.flux[order[1]]


def test_extract_ellipse_orientation():
    ii, jj = np.mgrid[0:64, 0:64]
    dx, dy = ii + 1 - 32.0, jj + 1 - 32.0
    # elongated along axis2 (y)
    data = 100 * np.exp(-(dx ** 2 / (2 * 2.0 ** 2) + dy ** 2 / (2 * 5.0 ** 2)))
    cat = extract(data, thresh=1.0)
    assert len(cat) == 1
    assert cat.a[0] > cat.b[0]
    assert abs(abs(cat.theta[0]) - np.pi / 2) < 0.15


def test_native_label_matches_scipy():
    if not _native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    mask = rng.random((200, 150)) > 0.7
    from scipy import ndimage
    lab_s, n_s = ndimage.label(mask, structure=np.ones((3, 3), int))
    lab_n, n_n = _native.label(mask)
    assert n_s == n_n
    # same partition (label ids may differ)
    for lab in range(1, n_n + 1):
        sel = lab_n == lab
        ref_ids = np.unique(lab_s[sel])
        assert len(ref_ids) == 1


def test_detect_sources_on_synthetic():
    images = make_blank_images(H=60, W=60, sky_nmgy=0.05,
                               nelec_per_nmgy=2000.0)
    bodies = [sample_star(pos=(18.0, 18.0), r_flux=15.0),
              sample_galaxy(pos=(42.0, 40.0), r_flux=25.0)]
    gen_images(images, bodies, seed=1)
    # identity WCS: world units are pixels, so pass a pixel-scale match
    # radius and a threshold that ignores faint noise clumps
    catalog, boxes = detect_sources(images, thresh=6.0, boxsize=(60, 60),
                                    match_radius_deg=1.0)
    assert len(catalog) == 2
    positions = sorted([tuple(np.round(c.pos, 0)) for c in catalog])
    assert positions[0] == (18.0, 18.0)
    assert positions[1] == (42.0, 40.0)
    # fluxes roughly right (r band)
    for c in catalog:
        truth = 15.0 if c.pos[0] < 30 else 25.0
        assert abs(c.gal_fluxes[2] - truth) / truth < 0.35
