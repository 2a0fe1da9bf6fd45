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


def test_scene_world_origins_are_disjoint():
    """Every scene owns its own sky footprint: no truth source of one scene
    may fall within 10x the 1-px match tolerance of another scene's sources.
    Round 1 rendered all 28 scenes at the same world center, so KDTree
    catalog matching paired truth rows with OTHER scenes' predictions and the
    committed field-score artifact was meaningless."""
    positions, scene_of = [], []
    for s in SCENES:
        for ce in scene_truth(s):
            positions.append(ce.pos)
            scene_of.append(s.name)
    positions = np.array(positions)
    tol = ab.SDSS_ARCSEC_PER_PIXEL / 3600.0
    for i in range(len(positions)):
        for j in range(i + 1, len(positions)):
            if scene_of[i] != scene_of[j]:
                sep = np.hypot(*(positions[i] - positions[j]))
                assert sep > 10 * tol, (scene_of[i], scene_of[j], sep)


def test_cross_scene_matching_regression():
    """A star scene plus a same-flux galaxy scene: matched scoring must agree
    with objid-aligned scoring. Under round 1's shared world center the
    star's truth row KDTree-matched the galaxy's prediction (identical world
    position), producing phantom missed_stars/missed_galaxies."""
    truth_df, pred_df = run_benchmarks(
        ["simple_star", "star_position_1", "galaxy_with_all",
         "angle_and_axis_ratio_1"],
        newton_config=NewtonConfig(max_iters=40))
    # aligned scoring (cannot cross scenes, ground truth for the comparison)
    aligned = ab.get_scores_df(truth_df, ab.get_error_df(truth_df, pred_df))
    # position-matched scoring (the reference's path)
    matched = ab.score_predictions(truth_df, [pred_df])
    a = aligned.set_index("field")
    m = matched.set_index("field")
    assert set(a.index) == set(m.index)
    for field in a.index:
        assert m.loc[field, "N"] == a.loc[field, "N"], field
        np.testing.assert_allclose(m.loc[field, "first"],
                                   a.loc[field, "first"], atol=1e-12)
    assert a.loc["missed_stars", "first"] == 0.0
    assert a.loc["missed_galaxies", "first"] == 0.0


def test_tolerance_gate_arithmetic():
    import pandas as pd

    from celeste_jl_tpu.benchmark.galsim import (estimate_violations,
                                                 max_error_for)
    assert max_error_for("is_star", 1.0) == 0.1
    assert max_error_for("gal_angle_deg", 95.0) == 5.0
    assert max_error_for("flux_r_nmgy", 40.0) == pytest.approx(8.0)
    df = pd.DataFrame([
        {"objid": "a", "variable": "is_star", "truth": 1.0,
         "estimate": 0.95},                      # ok
        {"objid": "a", "variable": "flux_r_nmgy", "truth": 40.0,
         "estimate": 50.0},                      # 25% off -> violation
        {"objid": "a", "variable": "gal_angle_deg", "truth": 1.0,
         "estimate": 179.0},                     # wraps to 2 deg -> ok
        {"objid": "a", "variable": "gal_radius_px", "truth": np.nan,
         "estimate": 3.0},                       # NaN truth skipped
    ])
    bad = estimate_violations(df)
    assert len(bad) == 1 and bad[0][1] == "flux_r_nmgy"
