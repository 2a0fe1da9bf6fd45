"""Detection-footprint active masks (imaged_sources.jl:92-95 via
detection.jl:152-167): patches carry the dilated detection bounding box as
the active region instead of a flux-radius box."""

import numpy as np

from celeste_jl_tpu.detection.detect import detect_sources
from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.parallel.run import (InferenceState,
                                         detection_active_boxes, infer_box,
                                         patch_radii)
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)
from celeste_jl_tpu.utils.config import Config


def _scene():
    images = make_blank_images(H=72, W=72, sky_nmgy=0.05,
                               nelec_per_nmgy=2000.0)
    truth = [sample_star(pos=(20.0, 20.0), r_flux=20.0),
             sample_galaxy(pos=(50.0, 48.0), r_flux=30.0, gal_radius_px=2.0)]
    gen_images(images, truth, seed=3)
    return images, truth


def test_active_boxes_cover_detections_and_minimum():
    images, truth = _scene()
    catalog, det_boxes = detect_sources(images, thresh=6.0, boxsize=(72, 72),
                                        match_radius_deg=1.0)
    assert len(catalog) == 2
    boxes, req = detection_active_boxes(catalog, det_boxes, images)
    assert boxes.shape == (2, 5, 4)
    for i, ce in enumerate(catalog):
        for b in range(5):
            ctr = np.asarray(images[b].world_to_pix(ce.pos))
            xlo, xhi, ylo, yhi = boxes[i, b]
            # contains the +-5px minimum box around the center
            assert xlo <= ctr[0] - 5 and xhi >= ctr[0] + 5
            assert ylo <= ctr[1] - 5 and yhi >= ctr[1] + 5
            # and the dilated detection box where one exists
            det = det_boxes[i].get(b)
            if det is not None:
                xmin, xmax, ymin, ymax = det
                assert xlo <= xmin and xhi >= xmax
                assert ylo <= ymin and yhi >= ymax
        assert req[i] >= 5.0


def test_footprint_mask_smaller_than_radius_box():
    """At equal tile budgets a compact source's detected footprint activates
    fewer pixels than the flux-based radius box — the wasted masked-lane
    compute VERDICT flagged on crowded fields."""
    images, truth = _scene()
    catalog, det_boxes = detect_sources(images, thresh=6.0, boxsize=(72, 72),
                                        match_radius_deg=1.0)
    cfg = Config(min_radius_pix=8.0)
    boxes = detection_active_boxes(catalog, det_boxes, images)
    st_fp = InferenceState(catalog, images, cfg, active_boxes=boxes)
    st_rb = InferenceState(catalog, images, cfg)
    for s in range(len(catalog)):
        n_fp = int(np.asarray(st_fp.patch(s, tile=64).mask).sum())
        n_rb = int(np.asarray(st_rb.patch(s, tile=64).mask).sum())
        assert n_fp < n_rb, (s, n_fp, n_rb)
        assert n_fp > 5 * 11 * 11 / 2  # still covers the minimum box


def test_infer_box_with_footprints_recovers_sources():
    images, truth = _scene()
    res = infer_box(images, method="single_vi", thresh=6.0, boxsize=(72, 72),
                    match_radius_deg=1.0)
    assert len(res) == 2
    got = sorted(res, key=lambda r: r.vs[ids.pos[0]])
    assert got[0].vs[ids.is_star[0]] > 0.5      # star
    assert got[1].vs[ids.is_star[0]] < 0.5      # galaxy
    f_star = np.exp(got[0].vs[ids.flux_loc[0]])
    f_gal = np.exp(got[1].vs[ids.flux_loc[1]])
    assert abs(f_star - 20.0) / 20.0 < 0.05, f_star
    assert abs(f_gal - 30.0) / 30.0 < 0.1, f_gal
