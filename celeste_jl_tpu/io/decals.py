"""DECaLS survey dataset (DECALSIO.jl rebuilt).

Like the reference, full image loading is not implemented — the overlap
query against the survey-ccds metadata table works (incl. the RA=0
wraparound handling, DECALSIO.jl:26-108) and `load_images` raises with the
reference's TODO list so callers get a clear status.
"""

import os

import numpy as np

from .dataset import BoundingBox, SurveyDataSet
from .fits import open_fits


class DECALSDataSet(SurveyDataSet):
    def __init__(self, basedir, metadatafile="survey-ccds-decals.fits"):
        self.basedir = str(basedir)
        self.metadatafile = metadatafile

    def get_overlapping_ccds(self, box: BoundingBox):
        """Indices of CCDs whose linear-WCS corner extents overlap `box`
        (DECALSIO.jl:26-108)."""
        tbl = open_fits(os.path.join(self.basedir, self.metadatafile))[1].data
        crpix1 = np.asarray(tbl["crpix1"], np.float64)
        crpix2 = np.asarray(tbl["crpix2"], np.float64)
        crval1 = np.asarray(tbl["crval1"], np.float64)
        crval2 = np.asarray(tbl["crval2"], np.float64)
        cd11 = np.asarray(tbl["cd1_1"], np.float64)
        cd12 = np.asarray(tbl["cd1_2"], np.float64)
        cd21 = np.asarray(tbl["cd2_1"], np.float64)
        cd22 = np.asarray(tbl["cd2_2"], np.float64)
        width = np.asarray(tbl["width"], np.float64)
        height = np.asarray(tbl["height"], np.float64)

        def pix_to_world(x, y):
            dx, dy = x - crpix1, y - crpix2
            return (crval1 + cd11 * dx + cd12 * dy,
                    crval2 + cd21 * dx + cd22 * dy)

        corners = [pix_to_world(1.0, 1.0), pix_to_world(width, 1.0),
                   pix_to_world(1.0, height), pix_to_world(width, height)]
        ras = np.stack([c[0] for c in corners])
        decs = np.stack([c[1] for c in corners])
        ramin, ramax = ras.min(0), ras.max(0)
        decmin, decmax = decs.min(0), decs.max(0)

        # rotate everything away from the RA=0 discontinuity: center the
        # box at RA=180 and rotate CCD extents by the same offset
        offset = 180.0 - (box.ramax + box.ramin) / 2.0
        box_lo, box_hi = box.ramin + offset, box.ramax + offset
        ramin = (ramin + offset) % 360.0
        ramax = (ramax + offset) % 360.0

        mask = ((ramax > box_lo) & (ramin < box_hi)
                & (decmax > box.decmin) & (decmin < box.decmax))
        return np.flatnonzero(mask)

    def load_images(self, box: BoundingBox):
        raise NotImplementedError(
            "DECaLS image loading is not yet implemented (the reference's "
            "DECALSIO.load_images raises the same, DECALSIO.jl:111-149). "
            "TODO: read image/weight/dq HDUs, fit the PsfEx PSF model, "
            "convert zeropoints to nelec_per_nmgy, build sky from splinesky.")
