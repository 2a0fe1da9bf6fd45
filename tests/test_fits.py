"""Round-trip tests for the pure-numpy FITS layer (replaces test of the
cfitsio binding; see SDSSIO round-trips in test_sdssio.jl)."""

import gzip
import os

import numpy as np

from celeste_jl_tpu.io.fits import open_fits, write_fits


def test_image_roundtrip(tmp_path):
    p = str(tmp_path / "img.fits")
    img = np.arange(35.0, dtype=np.float32).reshape(5, 7) * 1.5
    write_fits(p, [(img, [("RUN", 94, "sdss run"), ("CAMCOL", 1, "")])])
    hdus = open_fits(p)
    assert len(hdus) == 1
    np.testing.assert_array_equal(hdus[0].data, img)
    assert hdus[0].header["RUN"] == 94
    assert hdus[0].header["NAXIS1"] == 7
    assert hdus[0].header["NAXIS2"] == 5


def test_int16_with_bscale(tmp_path):
    p = str(tmp_path / "i16.fits")
    img = np.array([[1, 2], [3, 4]], dtype=np.int16)
    write_fits(p, [(img, [("BSCALE", 2.0, ""), ("BZERO", 10.0, "")])])
    hdus = open_fits(p)
    np.testing.assert_allclose(hdus[0].data, img * 2.0 + 10.0)


def test_multi_hdu_and_strings(tmp_path):
    p = str(tmp_path / "multi.fits")
    img1 = np.zeros((3, 3), dtype=np.float64)
    img2 = np.ones((2, 4), dtype=np.int32)
    write_fits(p, [(img1, [("OBJECT", "M31 o'clock", "target")]),
                   (img2, [])])
    hdus = open_fits(p)
    assert len(hdus) == 2
    assert hdus[0].header["OBJECT"] == "M31 o'clock"
    np.testing.assert_array_equal(hdus[1].data, img2)


def test_bintable_roundtrip(tmp_path):
    p = str(tmp_path / "tab.fits")
    cols = {
        "ra": np.array([12.5, 13.5], dtype=np.float64),
        "flags": np.array([3, 7], dtype=np.int32),
        "name": np.array(["abc", "de"]),
        "is_star": np.array([True, False]),
    }
    write_fits(p, [(None, []), (cols, [("EXTNAME", "CATALOG", "")])])
    hdus = open_fits(p)
    tab = hdus[1].data
    np.testing.assert_allclose(tab["ra"], cols["ra"])
    np.testing.assert_array_equal(tab["flags"], cols["flags"])
    assert list(tab["name"]) == ["abc", "de"]
    np.testing.assert_array_equal(tab["is_star"], [True, False])


def test_gzip_and_bytes(tmp_path):
    p = str(tmp_path / "img.fits")
    img = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    write_fits(p, [(img, [])])
    raw = open(p, "rb").read()
    gz = str(tmp_path / "img.fits.gz")
    with open(gz, "wb") as f:
        f.write(gzip.compress(raw))
    np.testing.assert_array_equal(open_fits(gz)[0].data, img)
    # in-memory bytes (slurp mode, SDSSIO.jl:651-669)
    np.testing.assert_array_equal(open_fits(raw)[0].data, img)
    np.testing.assert_array_equal(open_fits(gzip.compress(raw))[0].data, img)


def test_results_to_fits_catalog(tmp_path):
    """tools/results_to_fits.py: per-box npz results round-trip into one
    FITS bintable catalog (optimized_sources_to_fits.jl parity)."""
    import sys

    import numpy as np

    from celeste_jl_tpu.io.dataset import BoundingBox
    from celeste_jl_tpu.io.fits import open_fits
    from celeste_jl_tpu.main import save_results
    from celeste_jl_tpu.parallel.run import OptimizedSource
    from celeste_jl_tpu.vi.init import generic_init_source

    results = [OptimizedSource(init_pos=np.array([10.0 + i, 20.0]),
                               vs=generic_init_source((10.0 + i, 20.0)),
                               elbo=-100.0 - i, converged=True,
                               is_sky_bad=(i == 2))
               for i in range(3)]
    fname = save_results(str(tmp_path), BoundingBox(9, 12, 19, 21), results)

    sys.path.insert(0, "tools")
    try:
        from results_to_fits import results_to_fits
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "catalog.fits")
    n = results_to_fits([fname], out)
    assert n == 2  # the bad-sky row is dropped

    hdus = open_fits(out)
    cat = hdus[1].data
    assert len(cat["ra"]) == 2
    assert set(cat) >= {"ra", "dec", "is_star", "flux_r_nmgy", "elbo",
                        "converged", "gal_axis_ratio"}
