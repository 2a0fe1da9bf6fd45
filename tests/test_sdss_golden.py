"""Byte-level golden vectors for the SDSS readers, transcribed from the
SDSS datamodel / reference semantics (SDSSIO.jl:56-124 sky,
SDSSIO.jl:173-224 fpM masks, SDSSIO.jl:239-338 psField eigenimages) with
constants derived BY HAND in this file — deliberately sharing no code or
helper with tests/sdss_fixtures.py, so a wrong assumption baked into both
the fixture writer and the parser cannot hide (VERDICT r4 item 8).

Real survey bytes are unobtainable in this sandbox; what these tests pin
is the documented convention set: the psf polynomial's 0.001*(pos-1)
scaling and coefficient orientation, Fortran-order eigenimage reshape,
fpM inclusive (cmin..cmax, rmin..rmax) extents filtered by S_MASKTYPE
plane, the frame sky's 0->1-based XINTERP shift, bilinear weights with
constant border extrapolation, and the per-ROW calibration broadcast.
"""

import numpy as np

from celeste_jl_tpu.io.sdss import (SDSSPSFMap, interpolate_sky, read_mask,
                                    read_sky)


class _HDU:
    def __init__(self, data):
        self.data = data


# -----------------------------------------------------------------------------
# psField eigenimage evaluation (SDSSIO.jl:239-298)


def test_psfmap_polynomial_golden_offcenter():
    """Hand-evaluated weighted eigenimage sum at an off-center position.

    rnrow = rncol = 2; two eigenimages e1 = [1,2,3,4], e2 = [10,20,30,40]
    (flattened Fortran order); cmat (ni=2, nj=2, nk=2) with
    c[:,:,0] = [[1,0],[0,0]], c[:,:,1] = [[0,1],[2,0]].
    At (x, y) = (501, 301): xt = [1, 0.001*500] = [1, 0.5],
    yt = [1, 0.3]; w0 = 1, w1 = c[0,1]*1*0.3 + c[1,0]*0.5*1 = 1.3;
    stamp_flat = e1 + 1.3*e2 = [14, 28, 42, 56], Fortran-reshaped to
    [[14, 42], [28, 56]].
    """
    rrows = np.stack([np.array([1.0, 2.0, 3.0, 4.0]),
                      np.array([10.0, 20.0, 30.0, 40.0])], axis=1)
    cmat = np.zeros((2, 2, 2))
    cmat[0, 0, 0] = 1.0
    cmat[0, 1, 1] = 1.0
    cmat[1, 0, 1] = 2.0
    psf = SDSSPSFMap(rrows, 2, 2, cmat)
    expected = np.array([[14.0, 42.0], [28.0, 56.0]])
    np.testing.assert_allclose(psf(501.0, 301.0), expected, rtol=1e-14)
    # vectorized path must agree with the scalar path, including at a
    # second, asymmetric position
    stamps = psf.at([501.0, 11.0], [301.0, 21.0])
    np.testing.assert_allclose(stamps[0], expected, rtol=1e-14)
    xt = (0.001 * 10.0) ** np.arange(2)
    yt = (0.001 * 20.0) ** np.arange(2)
    w1 = cmat[0, 1, 1] * xt[0] * yt[1] + cmat[1, 0, 1] * xt[1] * yt[0]
    flat = rrows[:, 0] * 1.0 + rrows[:, 1] * w1
    np.testing.assert_allclose(stamps[1], flat.reshape(2, 2, order="F"),
                               rtol=1e-14)


# -----------------------------------------------------------------------------
# fpM mask extents (SDSSIO.jl:173-224)


def test_fpm_mask_extents_golden():
    """Hand-built fpM HDU list: the S_MASKTYPE key table maps plane names
    to HDU indices (Value + 1); only requested planes contribute; extents
    are inclusive (cmin..cmax, rmin..rmax) 0-based pairs, in order."""
    key = {
        "Value": np.array([3, 4, 7]),
        "defName": np.array(["S_MASKTYPE", "S_MASKTYPE", "S_MASKTYPE"]),
        "attributeName": np.array(["S_MASK_INTERP", "S_MASK_SATUR",
                                   "S_MASK_GHOST"]),
    }
    interp = {"cmin": np.array([5, 100]), "cmax": np.array([9, 100]),
              "rmin": np.array([0, 7]), "rmax": np.array([2, 7])}
    satur = {"cmin": np.array([20]), "cmax": np.array([21]),
             "rmin": np.array([30]), "rmax": np.array([33])}
    ghost = {"cmin": np.array([0]), "cmax": np.array([0]),
             "rmin": np.array([0]), "rmax": np.array([0])}
    hdus = [None] * 12
    hdus[11] = _HDU(key)
    hdus[4] = _HDU(interp)   # Value 3 -> HDU 4
    hdus[5] = _HDU(satur)    # Value 4 -> HDU 5
    hdus[8] = _HDU(ghost)    # Value 7 -> HDU 8 (not requested)

    xr, yr = read_mask(hdus, mask_planes={"S_MASK_INTERP", "S_MASK_SATUR"})
    assert xr == [(5, 9), (100, 100), (20, 21)]
    assert yr == [(0, 2), (7, 7), (30, 33)]

    # an empty plane HDU is skipped, not an error
    hdus[5] = _HDU(None)
    xr, yr = read_mask(hdus, mask_planes={"S_MASK_INTERP", "S_MASK_SATUR"})
    assert xr == [(5, 9), (100, 100)]


# -----------------------------------------------------------------------------
# frame sky interpolation (SDSSIO.jl:56-124)


def test_sky_bilinear_corners_golden():
    """2x2 binned sky with hand-computed bilinear values: interior points
    mix all four cells with the fractional weights; coordinates below 1
    or beyond the grid clamp to the edge cells (constant extrapolation);
    the calibration multiplies per ROW (axis 0)."""
    sky_small = np.array([[1.0, 3.0],
                          [5.0, 7.0]])   # (nx, ny)
    # rows: 1.0 (on cell 1), 1.5 (midway), 2.0 (on cell 2), 2.75 (beyond)
    sky_x = np.array([1.0, 1.5, 2.0, 2.75])
    # cols: 0.5 (below grid), 1.25
    sky_y = np.array([0.5, 1.25])
    calib = np.array([1.0, 1.0, 2.0, 1.0])

    out = interpolate_sky(sky_small, sky_x, sky_y, calib)
    # hand values: at x=1.0 floor=1, w=0 -> row [1,3]; y=0.5 floor=0, w=0.5
    # but both cells clamp to col 1 -> 1.0; y=1.25 -> 1*(0.75)+3*0.25 = 1.5
    row1 = [1.0, 1.5]
    # x=1.5: rows mix half-half -> [3,5]: y=0.5 -> 3; y=1.25 -> 0.75*3+0.25*5=3.5
    row15 = [3.0, 3.5]
    # x=2.0: floor=2, w=0 -> both clamp to row 2 -> [5,7]: y=0.5 -> 5;
    # y=1.25 -> 0.75*5+0.25*7 = 5.5 ; calibrated x2
    row2 = [10.0, 11.0]
    # x=2.75: floor=2, w=0.75, hi clamps to row 2 as well -> same as row 2
    row275 = [5.0, 5.5]
    np.testing.assert_allclose(out, np.array([row1, row15, row2, row275]),
                               rtol=1e-14)


def test_read_sky_one_based_shift_and_transpose():
    """XINTERP/YINTERP are 0-based in the file and must come back 1-based;
    ALLSKY is stored FITS-row-major and must transpose to (axis1, axis2)."""
    allsky = np.array([[1.0, 5.0], [3.0, 7.0]])   # (ny, nx) on disk
    hdu = _HDU({"ALLSKY": allsky,
                "XINTERP": np.array([0.0, 0.5, 1.0]),
                "YINTERP": np.array([0.0, 1.0])})
    sky_small, sky_x, sky_y = read_sky(hdu)
    np.testing.assert_array_equal(sky_small, allsky.T)
    np.testing.assert_array_equal(sky_x, [1.0, 1.5, 2.0])
    np.testing.assert_array_equal(sky_y, [1.0, 2.0])
