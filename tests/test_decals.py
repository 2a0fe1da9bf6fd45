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


def test_load_images_not_implemented(tmp_path):
    _write_ccds(tmp_path / "survey-ccds-decals.fits", [(150.0, 2.0)])
    with pytest.raises(NotImplementedError):
        DECALSDataSet(tmp_path).load_images(BoundingBox(0, 1, 0, 1))
