"""GalSim-equivalent accuracy suite, fast subset (the reference gates the
full set behind --long-running; see disabled_test_galsim_benchmarks.jl)."""

import numpy as np
import pytest

from celeste_jl_tpu.benchmark import accuracy as ab
from celeste_jl_tpu.benchmark.galsim import (SCENES, SCENES_BY_NAME,
                                             render_scene, run_benchmarks,
                                             scene_truth)
from celeste_jl_tpu.ops.newton import NewtonConfig


def test_scene_suite_covers_reference_cases():
    assert len(SCENES) >= 27
    for name in ("simple_star", "star_with_noise", "angle_and_axis_ratio_1",
                 "galaxy_with_all", "galaxy_with_noise",
                 "overlapping_stars", "three_sources_all_overlap"):
        assert name in SCENES_BY_NAME


def test_render_scene_shapes_and_flux():
    images, truth = render_scene(SCENES_BY_NAME["simple_star"])
    assert len(images) == 5
    assert images[0].pixels.shape == (96, 96)
    # total flux in r band ~= flux_r * nelec + sky
    total_nmgy = images[2].pixels.sum() / 1000.0 - 0.01 * 96 * 96
    np.testing.assert_allclose(total_nmgy, 40.0, rtol=0.02)


def test_noise_flag_changes_pixels():
    clean, _ = render_scene(SCENES_BY_NAME["galaxy_with_all"])
    noisy, _ = render_scene(SCENES_BY_NAME["galaxy_with_noise"])
    assert not np.allclose(clean[2].pixels, noisy[2].pixels)


@pytest.mark.parametrize("name", ["simple_star", "galaxy_with_all"])
def test_benchmark_recovers_truth(name):
    truth_df, pred_df = run_benchmarks(
        [name], newton_config=NewtonConfig(max_iters=40))
    assert len(truth_df) == len(pred_df) == 1
    t, p = truth_df.iloc[0], pred_df.iloc[0]
    # position within ~half an SDSS pixel
    sep_px = 3600.0 / 0.396 * np.hypot(t["ra"] - p["ra"],
                                       t["dec"] - p["dec"])
    assert sep_px < 0.5, sep_px
    assert (p["is_star"] > 0.5) == (t["is_star"] > 0.5)
    assert abs(p["flux_r_nmgy"] - t["flux_r_nmgy"]) / t["flux_r_nmgy"] < 0.1
    if t["is_star"] < 0.5:
        assert abs(p["gal_axis_ratio"] - t["gal_axis_ratio"]) < 0.1
        assert abs(p["gal_radius_px"] - t["gal_radius_px"]) \
            / t["gal_radius_px"] < 0.25


def test_scoring_over_multiple_scenes():
    truth_df, pred_df = run_benchmarks(
        ["simple_star", "bright_star"],
        newton_config=NewtonConfig(max_iters=40))
    scores = ab.score_predictions(truth_df, [pred_df])
    pos = scores[scores["field"] == "position"].iloc[0]
    assert pos["N"] == 2
    assert pos["first"] < 0.5  # mean position error < half an SDSS pixel
