"""Synthetic SDSS field fixtures.

Writes a complete run/camcol/field directory in the 'celeste' layout —
frame/fpM/psField/photoField/photoObj plus field_extents.fits — whose pixel
contents are rendered with the package's own forward model, so SDSSDataSet
round-trips can be checked against known truth. Mirrors the role of the
reference's test/data Makefile (which downloads real fields; we have no
network)."""

import os

import numpy as np

from celeste_jl_tpu.io.fits import write_fits
from celeste_jl_tpu.io.sdss import BAND_CHARS, RunCamcolField
from celeste_jl_tpu.io.wcs import TanWCS
from celeste_jl_tpu.models.image import Image
from celeste_jl_tpu.models.psf import gaussian_psf, render_psf
from celeste_jl_tpu.synthetic import gen_images, sample_galaxy, sample_star

# frame geometry: axis1 (H) x axis2 (W) in the package's convention
H, W = 96, 64
SKY_NX, SKY_NY = 6, 4
PSF_STAMP = 25
CD = np.array([[1.1e-4, 0.0], [0.0, 1.1e-4]])  # ~0.396 arcsec/px


def fixture_wcs():
    return TanWCS(crpix=[H / 2, W / 2], crval=[150.0, 1.0], cd=CD)


def fixture_truth(wcs=None):
    """Catalog of known sources placed inside the frame."""
    wcs = wcs or fixture_wcs()
    star_pos = wcs.pix_to_world([30.0, 25.0])
    gal_pos = wcs.pix_to_world([65.0, 40.0])
    return [sample_star(pos=star_pos, r_flux=30.0),
            sample_galaxy(pos=gal_pos, r_flux=40.0, gal_radius_px=1.8,
                          gal_axis_ratio=0.7)]


def make_sdss_field(basedir, rcf=RunCamcolField(3900, 6, 269), seed=0,
                    gain=4.0, calib0=0.005, sky_nmgy=0.15,
                    mask_box=((5, 8), (5, 8))):
    """Write all files for one field; returns (rcf, truth_catalog, wcs).

    gain: electrons per DN; calib0: nMgy per DN -> nelec_per_nmgy =
    gain / calib = 800. One masked pixel box is written to the fpM file.
    """
    wcs = fixture_wcs()
    truth = fixture_truth(wcs)
    rng = np.random.default_rng(seed)

    calibration = np.full(H, calib0, dtype=np.float64)
    nelec_per_nmgy = gain / calibration

    # ground-truth electron images via the forward model
    psf = gaussian_psf(sigma=1.6, K=2)
    images = [Image(pixels=np.zeros((H, W)), band=b, psf=psf, sky=sky_nmgy,
                    nelec_per_nmgy=nelec_per_nmgy, wcs=wcs)
              for b in range(5)]
    gen_images(images, truth, seed=seed)

    fdir = os.path.join(str(basedir), str(rcf.run), str(rcf.camcol),
                        str(rcf.field))
    pfdir = os.path.join(str(basedir), str(rcf.run), str(rcf.camcol))
    os.makedirs(fdir, exist_ok=True)

    # --- frames: HDU0 sky-subtracted calibrated image (FITS stores the
    # transpose of our (axis1, axis2) arrays), HDU1 calibration, HDU2 sky
    sky_small = np.full((SKY_NX, SKY_NY), sky_nmgy / calib0)  # DN
    sky_x = np.linspace(0, SKY_NX - 1, H)   # 0-based, reader adds 1
    sky_y = np.linspace(0, SKY_NY - 1, W)
    wcs_cards = [
        ("CTYPE1", "RA---TAN"), ("CTYPE2", "DEC--TAN"),
        ("CRPIX1", H / 2), ("CRPIX2", W / 2),
        ("CRVAL1", 150.0), ("CRVAL2", 1.0),
        ("CD1_1", CD[0, 0]), ("CD1_2", CD[0, 1]),
        ("CD2_1", CD[1, 0]), ("CD2_2", CD[1, 1]),
    ]
    for b, band in enumerate(BAND_CHARS):
        frame_nmgy = (images[b].pixels / nelec_per_nmgy[:, None]
                      - sky_nmgy).astype(np.float32)
        write_fits(
            os.path.join(
                fdir,
                f"frame-{band}-{rcf.run:06d}-{rcf.camcol}-{rcf.field:04d}"
                ".fits"),
            [(frame_nmgy.T.copy(), wcs_cards),
             (calibration.astype(np.float32), None),
             ({"ALLSKY": sky_small.T[None].astype(np.float32),
               "XINTERP": sky_x[None].astype(np.float32),
               "YINTERP": sky_y[None].astype(np.float32)}, None)])

    # --- fpM masks: 10 plane HDUs + key HDU; plane 0 (S_MASK_INTERP)
    # masks mask_box in band r only
    for b, band in enumerate(BAND_CHARS):
        hdus = [(None, None)]
        for plane in range(10):
            if plane == 0 and band == "r":
                (x0, x1), (y0, y1) = mask_box
                tbl = {"cmin": np.array([x0], np.int32),
                       "cmax": np.array([x1], np.int32),
                       "rmin": np.array([y0], np.int32),
                       "rmax": np.array([y1], np.int32)}
            else:
                tbl = {"cmin": np.array([], np.int32),
                       "cmax": np.array([], np.int32),
                       "rmin": np.array([], np.int32),
                       "rmax": np.array([], np.int32)}
            hdus.append((tbl, None))
        hdus.append(({
            "Value": np.arange(10, dtype=np.int32),
            "defName": np.array(["S_MASKTYPE"] * 10),
            "attributeName": np.array(
                ["S_MASK_INTERP", "S_MASK_SATUR", "S_MASK_CR",
                 "S_MASK_GHOST", "S_MASK_OTHER1", "S_MASK_OTHER2",
                 "S_MASK_OTHER3", "S_MASK_OTHER4", "S_MASK_OTHER5",
                 "S_MASK_OTHER6"]),
        }, None))
        write_fits(
            os.path.join(
                fdir,
                f"fpM-{rcf.run:06d}-{band}{rcf.camcol}-{rcf.field:04d}.fit"),
            hdus)

    # --- psField: per band, 2 eigenimages; weight poly = const for eigen 0,
    # tiny linear term for eigen 1
    eigen0 = np.asarray(render_psf(psf, size=PSF_STAMP), dtype=np.float64)
    eigen1 = 0.01 * eigen0
    nk = 2
    cmat_rows = np.zeros((nk, 9), dtype=np.float64)  # 3x3 poly, col-major
    cmat_rows[0, 0] = 1.0      # eigen0 weight = 1
    cmat_rows[1, 1] = 1e-4     # eigen1 weight grows slowly with x
    psf_hdus = [(None, None)]
    for band in BAND_CHARS:
        psf_hdus.append(({
            "nrow_b": np.array([3, 3], np.int32),
            "ncol_b": np.array([3, 3], np.int32),
            "rnrow": np.array([PSF_STAMP, PSF_STAMP], np.int32),
            "rncol": np.array([PSF_STAMP, PSF_STAMP], np.int32),
            "c": cmat_rows.astype(np.float32),
            "rrows": np.stack([eigen0.ravel(order="F"),
                               eigen1.ravel(order="F")]).astype(np.float32),
        }, None))
    write_fits(os.path.join(
        fdir, f"psField-{rcf.run:06d}-{rcf.camcol}-{rcf.field:04d}.fit"),
        psf_hdus)

    # --- photoField
    write_fits(os.path.join(
        pfdir, f"photoField-{rcf.run:06d}-{rcf.camcol}.fits"),
        [(None, None),
         ({"FIELD": np.array([rcf.field], np.int32),
           "GAIN": np.full((1, 5), gain, np.float32)}, None)])

    # --- photoObj: truth rows plus one flagged row that must be filtered
    n = len(truth) + 1
    ra = np.array([ce.pos[0] for ce in truth] + [150.01])
    dec = np.array([ce.pos[1] for ce in truth] + [1.01])
    objc_type = np.array([6 if ce.is_star else 3 for ce in truth] + [6],
                         np.int32)
    objc_flags = np.zeros(n, np.int32)
    objc_flags[-1] = 2 ** 18   # saturated -> filtered out
    fluxes = np.zeros((n, 5), np.float32)
    for i, ce in enumerate(truth):
        fluxes[i] = ce.star_fluxes if ce.is_star else ce.gal_fluxes
    fluxes[-1] = 1.0
    fracdev = np.array([ce.gal_frac_dev for ce in truth] + [0.0], np.float32)
    ab = np.array([ce.gal_axis_ratio for ce in truth] + [1.0], np.float32)
    phi = np.array([np.degrees(ce.gal_angle) for ce in truth] + [0.0],
                   np.float32)
    theta = np.array([ce.gal_radius_px * 0.396 for ce in truth] + [0.1],
                     np.float32)
    rep5 = lambda v: np.repeat(v[:, None], 5, axis=1)  # noqa: E731
    write_fits(os.path.join(
        fdir, f"photoObj-{rcf.run:06d}-{rcf.camcol}-{rcf.field:04d}.fits"),
        [(None, None),
         ({"objid": np.array([f"obj-{i}" for i in range(n)]),
           "ra": ra, "dec": dec,
           "objc_flags": objc_flags,
           "objc_flags2": np.zeros(n, np.int32),
           "nchild": np.zeros(n, np.int16),
           "objc_type": objc_type,
           "fracdev": rep5(fracdev),
           "psfflux": fluxes, "cmodelflux": fluxes,
           "devflux": fluxes, "expflux": fluxes,
           "phi_dev_deg": rep5(phi), "phi_exp_deg": rep5(phi),
           "phi_offset": rep5(np.zeros(n, np.float32)),
           "theta_dev": rep5(theta), "theta_exp": rep5(theta),
           "ab_exp": rep5(ab), "ab_dev": rep5(ab)}, None)])

    # --- field_extents
    corners = np.array([wcs.pix_to_world(p) for p in
                        ([1, 1], [H, 1], [1, W], [H, W])])
    write_fits(os.path.join(str(basedir), "field_extents.fits"),
               [(None, None),
                ({"run": np.array([rcf.run], np.int16),
                  "camcol": np.array([rcf.camcol], np.int16),
                  "field": np.array([rcf.field], np.int16),
                  "ramin": np.array([corners[:, 0].min()]),
                  "ramax": np.array([corners[:, 0].max()]),
                  "decmin": np.array([corners[:, 1].min()]),
                  "decmax": np.array([corners[:, 1].max()])}, None)])

    return rcf, truth, wcs
