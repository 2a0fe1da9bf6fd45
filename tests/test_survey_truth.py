"""Real-survey ground-truth loaders (AccuracyBenchmark.jl:198-335): the
reference's checked-in Stripe 82 coadd fixtures must round-trip through
io/fits.py + load_coadd_catalog, photoObj fields must load through
load_primary, and score_predictions must run end-to-end against a
coadd-format truth frame."""

import os

import numpy as np
import pytest

from celeste_jl_tpu.benchmark import accuracy as ab

COADD_FIXTURES = [
    "/root/reference/test/data/coadd_for_4263_5_119.fit",
    "/root/reference/test/data/coadd_for_3325_5_110.fit",
]

needs_fixture = pytest.mark.skipif(
    not os.path.exists(COADD_FIXTURES[0]),
    reason="reference coadd fixtures not present")


@needs_fixture
@pytest.mark.parametrize("path", COADD_FIXTURES)
def test_load_coadd_catalog_roundtrips_reference_fixture(path):
    df = ab.load_coadd_catalog(path)
    ab.assert_columns_are_present(df, ab.CATALOG_COLUMNS)
    assert len(df) > 100
    assert set(np.unique(df["is_star"])) <= {0.0, 1.0}
    # galaxy-only fields are NaN exactly on star rows
    stars = df["is_star"].to_numpy() > 0.5
    assert stars.any() and (~stars).any()
    for c in ab.GALAXY_ONLY_COLUMNS:
        vals = df[c].to_numpy()
        assert np.all(np.isnan(vals[stars])), c
    # galaxy shape values in range on galaxy rows
    gal = df[~stars]
    assert ((gal["gal_axis_ratio"] >= 0) & (gal["gal_axis_ratio"] <= 1)).all()
    assert ((gal["gal_angle_deg"] >= 0) & (gal["gal_angle_deg"] < 180)).all()
    assert (gal["gal_frac_dev"].between(0, 1)).all()
    # excluded objids really are gone
    assert not df["objid"].isin(ab.BAD_COADD_OBJID).any()
    # positions are inside the Stripe 82 RA/Dec neighborhood
    assert df["dec"].abs().max() < 2.0


@needs_fixture
def test_score_predictions_against_coadd_truth():
    """End-to-end scoring against a coadd-format truth file: perturbed
    predictions at matched positions score near-zero errors; every field
    of the reference's score table is produced."""
    truth = ab.load_coadd_catalog(COADD_FIXTURES[0]).head(200).copy()
    truth = truth[truth["flux_r_nmgy"].notna()].reset_index(drop=True)
    rng = np.random.default_rng(0)
    pred = truth.copy()
    # sub-tolerance position jitter + small flux error + stderr columns
    jitter = rng.normal(0.0, 0.05 * ab.SDSS_ARCSEC_PER_PIXEL / 3600.0,
                        size=(len(pred), 2))
    pred["ra"] += jitter[:, 0]
    pred["dec"] += jitter[:, 1]
    pred["flux_r_nmgy"] *= 1.0 + rng.normal(0.0, 0.01, len(pred))
    for c in ab.STDERR_COLUMNS:
        pred[c] = 0.1
    scores = ab.score_predictions(truth, [pred])
    fields = set(scores["field"])
    assert {"position", "flux_r_mag", "missed_stars",
            "missed_galaxies"} <= fields
    s = scores.set_index("field")
    assert s.loc["missed_stars", "first"] == 0.0
    assert s.loc["missed_galaxies", "first"] == 0.0
    assert s.loc["position", "first"] < 0.2
    # uncertainty pipeline runs on the same frames
    unc = ab.score_uncertainty(ab.get_uncertainty_df(truth, pred))
    assert len(unc) == 5


def test_load_primary_from_synthetic_field(tmp_path):
    from celeste_jl_tpu.io.sdss import SDSSDataSet
    from tests.sdss_fixtures import make_sdss_field

    rcf, truth, _ = make_sdss_field(str(tmp_path))
    ds = SDSSDataSet(str(tmp_path))
    df = ab.load_primary(ds, rcf)
    ab.assert_columns_are_present(df, ab.CATALOG_COLUMNS)
    assert len(df) == len(truth)
    # positions match the fixture truth to sub-arcsec
    got = np.sort(df["ra"].to_numpy())
    want = np.sort([ce.pos[0] for ce in truth])
    np.testing.assert_allclose(got, want, atol=1e-5)
