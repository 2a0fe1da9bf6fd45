"""Scoring-pipeline tests (test_accuracy_benchmarks.jl semantics)."""

import numpy as np
import pandas as pd
import pytest

from celeste_jl_tpu.benchmark import accuracy as ab
from celeste_jl_tpu.models.params import ids
from celeste_jl_tpu.parallel.run import OptimizedSource
from celeste_jl_tpu.vi.init import catalog_init_source
from celeste_jl_tpu.synthetic import sample_galaxy, sample_star


def test_mag_flux_roundtrip():
    for b in range(5):
        for flux in (0.5, 10.0, 500.0):
            mag = ab.flux_to_mag(flux, b)
            np.testing.assert_allclose(ab.mag_to_flux(mag, b), flux,
                                       rtol=1e-10)


def test_color_from_fluxes_nan_on_nonpositive():
    assert np.isnan(ab.color_from_fluxes(-1.0, 2.0))
    np.testing.assert_allclose(ab.color_from_fluxes(2.0, 4.0), np.log(2.0))


def test_canonical_angle_and_degree_diff():
    np.testing.assert_allclose(ab.canonical_angle(190.0), 10.0)
    np.testing.assert_allclose(ab.canonical_angle(-10.0), 170.0)
    np.testing.assert_allclose(ab.degrees_to_diff(5.0, 175.0), 10.0)


def test_fluxes_from_colors_roundtrip():
    fluxes = ab.fluxes_from_colors(10.0, [0.1, -0.2, 0.3, 0.4])
    np.testing.assert_allclose(fluxes[2], 10.0)
    np.testing.assert_allclose(np.log(fluxes[3] / fluxes[2]), 0.3)
    np.testing.assert_allclose(np.log(fluxes[1] / fluxes[0]), 0.1)


def _result_from_entry(ce):
    vs = catalog_init_source(ce)
    vs[ids.is_star] = [0.9, 0.1] if ce.is_star else [0.1, 0.9]
    return OptimizedSource(init_pos=np.asarray(ce.pos), vs=vs, elbo=0.0,
                           converged=True, is_sky_bad=False)


def test_celeste_to_df_schema_and_values():
    ce = sample_star(pos=(0.01, 0.02), r_flux=25.0)
    df = ab.celeste_to_df([_result_from_entry(ce)])
    ab.assert_columns_are_present(df, ab.CATALOG_COLUMNS)
    ab.assert_columns_are_present(df, ab.STDERR_COLUMNS)
    assert df["is_star"].iloc[0] > 0.5
    np.testing.assert_allclose(df["flux_r_nmgy"].iloc[0], 25.0, rtol=1e-6)
    # bad-sky rows dropped
    bad = _result_from_entry(ce)
    bad.is_sky_bad = True
    assert len(ab.celeste_to_df([bad])) == 0


def test_match_and_score_predictions():
    truth_entries = [sample_star(pos=(0.010, 0.010), r_flux=20.0),
                     sample_galaxy(pos=(0.020, 0.020), r_flux=30.0)]
    truth = ab.catalog_entries_to_df(truth_entries)
    # prediction: same as truth but 0.3 nMgy flux error on the star and a
    # slightly offset position within the match tolerance
    pred = ab.celeste_to_df([_result_from_entry(ce)
                             for ce in truth_entries])
    pred.loc[0, "flux_r_nmgy"] += 0.3
    pred.loc[0, "ra"] += 1e-5  # ~0.09 px
    scores = ab.score_predictions(truth, [pred])
    assert set(scores["field"]) >= {"position", "flux_r_mag", "flux_r_nmgy"}
    flux_err = float(
        scores.loc[scores["field"] == "flux_r_nmgy", "first"].iloc[0])
    np.testing.assert_allclose(flux_err, 0.15, atol=0.01)  # mean of .3 and 0


def test_match_catalogs_drops_unmatched():
    truth = ab.catalog_entries_to_df([sample_star(pos=(0.01, 0.01)),
                                      sample_star(pos=(0.05, 0.05))])
    pred = ab.catalog_entries_to_df([sample_star(pos=(0.01, 0.01))])
    m_truth, (m_pred,) = ab.match_catalogs(truth, [pred])
    assert len(m_truth) == 1 and len(m_pred) == 1


def test_two_prediction_comparison():
    # two sources: get_scores_df skips columns with <=1 valid row
    entries = [sample_star(pos=(0.01, 0.01), r_flux=20.0),
               sample_star(pos=(0.03, 0.03), r_flux=35.0)]
    truth = ab.catalog_entries_to_df(entries)
    good = ab.celeste_to_df([_result_from_entry(ce) for ce in entries])
    worse = good.copy()
    worse["flux_r_nmgy"] += 1.0
    scores = ab.score_predictions(truth, [good, worse])
    row = scores[scores["field"] == "flux_r_nmgy"].iloc[0]
    assert row["first"] < row["second"]
    assert row["diff"] < 0


def test_uncertainty_scoring_calibrated_posterior():
    rng = np.random.default_rng(0)
    n = 400
    truth = pd.DataFrame({
        "ra": np.linspace(0.01, 0.02, n), "dec": np.full(n, 0.01),
        "is_star": 1.0, "flux_r_nmgy": np.full(n, 20.0),
        "color_ug": 0.0, "color_gr": 0.0, "color_ri": 0.0, "color_iz": 0.0,
        "gal_frac_dev": np.nan, "gal_axis_ratio": np.nan,
        "gal_radius_px": np.nan, "gal_angle_deg": np.nan,
    })
    pred = truth.copy()
    sd = 0.1
    pred["flux_r_nmgy"] = np.exp(np.log(truth["flux_r_nmgy"])
                                 + sd * rng.normal(size=n))
    pred["log_flux_r_stderr"] = sd
    for c in ab.COLOR_COLUMNS:
        pred[c] = truth[c] + sd * rng.normal(size=n)
        pred[f"{c}_stderr"] = sd
    udf = ab.get_uncertainty_df(truth, pred)
    scores = ab.score_uncertainty(udf)
    row = scores[scores["field"] == "log_flux_r_nmgy"].iloc[0]
    assert abs(row["within_1_sd"] - 0.68) < 0.08
    assert abs(row["within_2_sd"] - 0.95) < 0.05


def test_prior_draw_catalog():
    cat = ab.generate_catalog_from_prior(50, seed=1)
    assert len(cat) == 50
    stars = [ce for ce in cat if ce.is_star]
    assert 0 < len(stars) < 50
    for ce in cat:
        assert np.all(ce.star_fluxes > 0)
        assert ce.gal_radius_px > 0


def test_catalog_csv_roundtrip(tmp_path):
    truth = ab.catalog_entries_to_df([sample_star(pos=(0.01, 0.01))])
    path = tmp_path / "cat.csv"
    ab.write_catalog(path, truth)
    df = ab.read_catalog(path)
    np.testing.assert_allclose(df["flux_r_nmgy"], truth["flux_r_nmgy"])
