"""Catalog schema, conversions and scoring (AccuracyBenchmark.jl rebuilt).

DataFrames are pandas; the catalog CSV schema matches the reference's
CATALOG_COLUMNS (AccuracyBenchmark.jl:40-66) so scores are comparable.
"""

import numpy as np
import pandas as pd

from ..models.image import CatalogEntry
from ..models.params import ids
from ..utils.coordinates import angular_separation, match_coordinates

CATALOG_COLUMNS = {
    "ra", "dec", "is_star", "flux_r_nmgy", "color_ug", "color_gr",
    "color_ri", "color_iz", "gal_frac_dev", "gal_axis_ratio",
    "gal_radius_px", "gal_angle_deg",
}
STDERR_COLUMNS = {
    "log_flux_r_stderr", "color_ug_stderr", "color_gr_stderr",
    "color_ri_stderr", "color_iz_stderr",
}
COLOR_COLUMNS = ["color_ug", "color_gr", "color_ri", "color_iz"]
ABSOLUTE_ERROR_COLUMNS = (["gal_frac_dev", "gal_axis_ratio",
                           "gal_radius_px"] + COLOR_COLUMNS)

ARCSEC_PER_DEGREE = 3600.0
SDSS_ARCSEC_PER_PIXEL = 0.396

# SDSS asinh magnitude softening parameters, bands ugriz
# (AccuracyBenchmark.jl:131-137)
ASINH_SOFTENING = np.array([1.4e-10, 0.9e-10, 1.2e-10, 1.8e-10, 7.4e-10])


def mag_to_flux(mags, band_index):
    b = ASINH_SOFTENING[band_index]
    return 1e9 * 2 * b * np.sinh(-np.log(10) / 2.5 * np.asarray(mags)
                                 - np.log(b))


def flux_to_mag(flux_nmgy, band_index):
    b = ASINH_SOFTENING[band_index]
    return -2.5 / np.log(10) * (np.arcsinh(np.asarray(flux_nmgy) * 1e-9
                                           / (2 * b)) + np.log(b))


def color_from_fluxes(flux1, flux2):
    flux1, flux2 = np.asarray(flux1, float), np.asarray(flux2, float)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.log(flux2 / flux1)
    return np.where((flux1 > 0) & (flux2 > 0), out, np.nan)


def canonical_angle(gal_angle_deg):
    a = np.asarray(gal_angle_deg, float)
    return a - np.floor(a / 180.0) * 180.0


def degrees_to_diff(a, b):
    d = np.abs(np.asarray(a, float) - np.asarray(b, float)) % 180.0
    return np.minimum(d, 180.0 - d)


def fluxes_from_colors(flux_r_nmgy, colors):
    """(AccuracyBenchmark.jl:325-336)"""
    r = np.exp(np.asarray(colors, float))
    f = np.zeros(5)
    f[2] = flux_r_nmgy
    f[3] = f[2] * r[2]
    f[4] = f[3] * r[3]
    f[1] = f[2] / r[1]
    f[0] = f[1] / r[0]
    return f


def assert_columns_are_present(df, required):
    missing = set(required) - set(df.columns)
    if missing:
        raise ValueError(f"missing columns: {sorted(missing)}")


def read_catalog(csv_file):
    df = pd.read_csv(csv_file)
    assert_columns_are_present(df, CATALOG_COLUMNS)
    return df


def write_catalog(filename, df):
    assert_columns_are_present(df, CATALOG_COLUMNS)
    df.to_csv(filename, index=False)


# -----------------------------------------------------------------------------
# Real-survey ground-truth loaders (AccuracyBenchmark.jl:164-335)

GALAXY_ONLY_COLUMNS = ["gal_frac_dev", "gal_axis_ratio", "gal_radius_px",
                       "gal_angle_deg"]

# known-bad Stripe 82 coadd objects excluded from scoring
# (AccuracyBenchmark.jl:63-78: blends, bright neighbors, quasars)
BAD_COADD_OBJID = {
    "8647474692482203853", "8647474692482203816",
    "8647474692482204612", "8647474692482204147",
}


def color_from_mags(mags1, band1, mags2, band2):
    return color_from_fluxes(mag_to_flux(mags1, band1),
                             mag_to_flux(mags2, band2))


def load_coadd_catalog(fits_filename):
    """Stripe 82 coadd ground truth -> catalog DataFrame
    (AccuracyBenchmark.jl:198-263). `fits_filename` is a CasJobs Stripe82
    query result (e.g. the reference's test/data/coadd_for_*.fit fixtures,
    which round-trip through io/fits.py)."""
    from ..io.fits import open_fits

    tbl = open_fits(fits_filename)[1].data
    col = {k: np.asarray(v) for k, v in tbl.items()}

    usedev = col["fracdev_r"] > 0.5

    def dev_or_exp(dev_column, exp_column):
        return np.where(usedev, col[dev_column], col[exp_column])

    is_star = col["probpsf"] != 0

    def star_or_galaxy(star_column, dev_column, exp_column):
        return np.where(is_star, col[star_column],
                        dev_or_exp(dev_column, exp_column))

    mags = {c: star_or_galaxy(f"psfmag_{c}", f"devmag_{c}", f"expmag_{c}")
            for c in "ugriz"}

    flux_r = mag_to_flux(mags["r"], 2)
    result = pd.DataFrame({
        "objid": col["objid"].astype(str),
        "ra": col["ra"].astype(np.float64),
        "dec": col["dec"].astype(np.float64),
        "is_star": is_star.astype(float),
        "flux_r_nmgy": np.where(flux_r > 0, flux_r, np.nan),
        "color_ug": color_from_mags(mags["u"], 0, mags["g"], 1),
        "color_gr": color_from_mags(mags["g"], 1, mags["r"], 2),
        "color_ri": color_from_mags(mags["r"], 2, mags["i"], 3),
        "color_iz": color_from_mags(mags["i"], 3, mags["z"], 4),
        "gal_frac_dev": col["fracdev_r"].astype(np.float64),
        "gal_axis_ratio": dev_or_exp("devab_r", "expab_r"),
        "gal_radius_px": dev_or_exp("devrad_r", "exprad_r")
        / SDSS_ARCSEC_PER_PIXEL,
        "gal_angle_deg": canonical_angle(dev_or_exp("devphi_r", "expphi_r")),
    })
    keep = (col["is_saturated"] == 0) \
        & ~result["objid"].isin(BAD_COADD_OBJID).to_numpy()
    result = result[keep].reset_index(drop=True)
    # for stars, galaxy-only fields are undefined
    star_rows = result["is_star"].to_numpy() > 0.5
    for c in GALAXY_ONLY_COLUMNS:
        result.loc[star_rows, c] = np.nan
    return result


def load_primary(dataset, rcf):
    """SDSS primary (photoObj) catalog -> catalog DataFrame
    (AccuracyBenchmark.jl:272-335). `dataset`: io.sdss.SDSSDataSet;
    `rcf`: RunCamcolField."""
    from ..io.sdss import read_photoobj

    col = read_photoobj(dataset._open("photoObj", rcf))
    usedev = col["frac_dev"] > 0.5

    def dev_or_exp(dev_column, exp_column):
        return np.where(usedev, col[dev_column], col[exp_column])

    is_star = np.asarray(col["is_star"], bool)

    def star_or_galaxy(star_column, dev_column, exp_column):
        return np.where(is_star, col[star_column],
                        dev_or_exp(dev_column, exp_column))

    flux = {c: star_or_galaxy(f"psfflux_{c}", f"devflux_{c}", f"expflux_{c}")
            for c in "ugriz"}

    result = pd.DataFrame({
        "objid": np.asarray(col["objid"]).astype(str),
        "ra": col["ra"], "dec": col["dec"],
        "is_star": is_star.astype(float),
        "flux_r_nmgy": flux["r"],
        "color_ug": color_from_fluxes(flux["u"], flux["g"]),
        "color_gr": color_from_fluxes(flux["g"], flux["r"]),
        "color_ri": color_from_fluxes(flux["r"], flux["i"]),
        "color_iz": color_from_fluxes(flux["i"], flux["z"]),
        "gal_frac_dev": col["frac_dev"],
        "gal_axis_ratio": dev_or_exp("ab_dev", "ab_exp"),
        "gal_radius_px": dev_or_exp("theta_dev", "theta_exp")
        / SDSS_ARCSEC_PER_PIXEL,
        "gal_angle_deg": canonical_angle(dev_or_exp("phi_dev", "phi_exp")),
    })
    # primary flags oversaturation better than coadd: drop psf mag_r < 16
    with np.errstate(invalid="ignore"):
        keep = ~(flux_to_mag(np.asarray(col["psfflux_r"], float), 2) < 16)
    return result[keep].reset_index(drop=True)


# -----------------------------------------------------------------------------
# Variational parameters -> catalog rows (AccuracyBenchmark.jl:337-393)


def get_median_fluxes(vs, source_type):
    return fluxes_from_colors(np.exp(vs[ids.flux_loc[source_type]]),
                              vs[ids.color_mean[:, source_type]])


def variational_params_to_row(vs):
    vs = np.asarray(vs)
    row = {
        "ra": vs[ids.pos[0]], "dec": vs[ids.pos[1]],
        "is_star": vs[ids.is_star[0]],
        "gal_frac_dev": vs[ids.gal_frac_dev],
        "gal_axis_ratio": vs[ids.gal_axis_ratio],
        # the catalog convention is the geometric-mean ("effective") radius
        "gal_radius_px": vs[ids.gal_radius_px]
        * np.sqrt(vs[ids.gal_axis_ratio]),
        "gal_angle_deg": canonical_angle(np.degrees(vs[ids.gal_angle])),
    }
    i = 0 if row["is_star"] > 0.5 else 1
    fluxes = get_median_fluxes(vs, i)
    row["flux_r_nmgy"] = fluxes[2]
    row["color_ug"] = color_from_fluxes(fluxes[0], fluxes[1])
    row["color_gr"] = color_from_fluxes(fluxes[1], fluxes[2])
    row["color_ri"] = color_from_fluxes(fluxes[2], fluxes[3])
    row["color_iz"] = color_from_fluxes(fluxes[3], fluxes[4])
    row["log_flux_r_stderr"] = np.sqrt(vs[ids.flux_scale[i]])
    for c, name in enumerate(COLOR_COLUMNS):
        row[f"{name}_stderr"] = np.sqrt(vs[ids.color_var[c, i]])
    return row


def celeste_to_df(results):
    """OptimizedSource list -> catalog DataFrame, dropping bad-sky rows
    (AccuracyBenchmark.jl:378-393)."""
    rows = [variational_params_to_row(r.vs) for r in results
            if not r.is_sky_bad]
    return pd.DataFrame(rows)


def catalog_entries_to_df(entries):
    """Ground-truth CatalogEntry list -> truth DataFrame."""
    rows = []
    for ce in entries:
        fluxes = ce.star_fluxes if ce.is_star else ce.gal_fluxes
        rows.append({
            "ra": ce.pos[0], "dec": ce.pos[1],
            "is_star": 1.0 if ce.is_star else 0.0,
            "flux_r_nmgy": fluxes[2],
            "color_ug": color_from_fluxes(fluxes[0], fluxes[1]),
            "color_gr": color_from_fluxes(fluxes[1], fluxes[2]),
            "color_ri": color_from_fluxes(fluxes[2], fluxes[3]),
            "color_iz": color_from_fluxes(fluxes[3], fluxes[4]),
            "gal_frac_dev": np.nan if ce.is_star else ce.gal_frac_dev,
            "gal_axis_ratio": np.nan if ce.is_star else ce.gal_axis_ratio,
            "gal_radius_px": np.nan if ce.is_star
            else ce.gal_radius_px * np.sqrt(ce.gal_axis_ratio),
            "gal_angle_deg": np.nan if ce.is_star
            else canonical_angle(np.degrees(ce.gal_angle)),
        })
    return pd.DataFrame(rows)


# -----------------------------------------------------------------------------
# Prior-draw catalog simulation (AccuracyBenchmark.jl:395-476)

PRIOR_PROBABILITY_OF_STAR = 0.28


def draw_source_params(rng, prior, pos):
    """One random CatalogEntry from the model prior."""
    is_star = rng.uniform() < PRIOR_PROBABILITY_OF_STAR
    i = 0 if is_star else 1
    lnr = rng.normal(prior.flux_mean[i], np.sqrt(prior.flux_var[i]))
    d = rng.choice(8, p=prior.k[:, i] / prior.k[:, i].sum())
    colors = rng.multivariate_normal(prior.color_mean[:, d, i],
                                     prior.color_cov[:, :, d, i])
    fluxes = fluxes_from_colors(np.exp(lnr), colors)
    gal_radius = float(np.exp(rng.normal(prior.gal_radius_px_mean,
                                         np.sqrt(prior.gal_radius_px_var))))
    return CatalogEntry(
        pos=np.asarray(pos, float), is_star=is_star,
        star_fluxes=np.maximum(fluxes, 1e-6),
        gal_fluxes=np.maximum(fluxes, 1e-6),
        gal_frac_dev=float(rng.uniform()),
        gal_axis_ratio=float(rng.uniform(0.2, 1.0)),
        gal_angle=float(rng.uniform(0.0, np.pi)),
        gal_radius_px=gal_radius)


def generate_catalog_from_prior(num_sources, extent=40.0, margin=10.0,
                                seed=0):
    from ..models.priors import prior
    rng = np.random.default_rng(seed)
    return [draw_source_params(
        rng, prior, rng.uniform(margin, extent - margin, size=2))
        for _ in range(num_sources)]


# -----------------------------------------------------------------------------
# Scoring (AccuracyBenchmark.jl:801-1026)


def match_catalogs(truth, predictions, tol=SDSS_ARCSEC_PER_PIXEL / 3600.0):
    """Subset rows so every truth row has a <tol-degree match in every
    prediction (AccuracyBenchmark.jl:934-963)."""
    matched = np.ones(len(truth), dtype=bool)
    idxs = []
    for pred in predictions:
        idx, dists = match_coordinates(
            truth["ra"].to_numpy(), truth["dec"].to_numpy(),
            pred["ra"].to_numpy(), pred["dec"].to_numpy())
        matched &= dists < tol
        idxs.append(idx)
    matched_truth = truth[matched].reset_index(drop=True)
    matched_preds = [pred.iloc[idx[matched]].reset_index(drop=True)
                     for pred, idx in zip(predictions, idxs)]
    return matched_truth, matched_preds


def get_error_df(truth, predicted):
    """Per-row absolute errors (AccuracyBenchmark.jl:814-847)."""
    errors = pd.DataFrame()
    pred_gal = predicted["is_star"].to_numpy() < 0.5
    true_gal = truth["is_star"].to_numpy() < 0.5
    errors["missed_stars"] = np.where(~true_gal, pred_gal.astype(float),
                                      np.nan)
    errors["missed_galaxies"] = np.where(true_gal, (~pred_gal).astype(float),
                                         np.nan)
    errors["position"] = (ARCSEC_PER_DEGREE / SDSS_ARCSEC_PER_PIXEL) \
        * angular_separation(truth["ra"], truth["dec"],
                             predicted["ra"], predicted["dec"])
    errors["flux_r_mag"] = np.abs(
        flux_to_mag(truth["flux_r_nmgy"].to_numpy(), 2)
        - flux_to_mag(predicted["flux_r_nmgy"].to_numpy(), 2))
    errors["flux_r_nmgy"] = np.abs(truth["flux_r_nmgy"].to_numpy()
                                   - predicted["flux_r_nmgy"].to_numpy())
    errors["gal_angle_deg"] = degrees_to_diff(
        truth["gal_angle_deg"].to_numpy(),
        predicted["gal_angle_deg"].to_numpy())
    for col in ABSOLUTE_ERROR_COLUMNS:
        errors[col] = np.abs(truth[col].to_numpy()
                             - predicted[col].to_numpy())
    for col in COLOR_COLUMNS:
        errors[col] *= 2.5 / np.log(10)   # match Stripe82Score mag diffs
    return errors


def _is_good_row(truth_row, error, column):
    if pd.isna(error) or (isinstance(error, float) and np.isnan(error)):
        return False
    if not pd.isna(truth_row["gal_radius_px"]) \
            and truth_row["gal_radius_px"] > 20:
        return False
    if column in ("gal_axis_ratio", "gal_radius_px", "gal_angle_deg",
                  "gal_frac_dev"):
        fd = truth_row["gal_frac_dev"]
        if not pd.isna(fd) and 0.05 < fd < 0.95:
            return False
    if column == "gal_angle_deg":
        ar = truth_row["gal_axis_ratio"]
        if not pd.isna(ar) and ar > 0.6:
            return False
    return True


def filter_rows(truth, errors, column):
    return np.array([
        _is_good_row(truth.iloc[i], errors[column].iloc[i], column)
        for i in range(len(truth))])


def get_scores_df(truth, first_errors, second_errors=None):
    rows = []
    for column in first_errors.columns:
        good = filter_rows(truth, first_errors, column)
        if second_errors is not None:
            good &= filter_rows(truth, second_errors, column)
        if good.sum() <= 1:
            continue
        row = {"field": column, "N": int(good.sum()),
               "first": float(first_errors[column][good].mean())}
        if second_errors is not None:
            row["second"] = float(second_errors[column][good].mean())
            diffs = (first_errors[column][good]
                     - second_errors[column][good]).to_numpy()
            row["diff"] = float(diffs.mean())
            row["diff_sd"] = float(np.abs(diffs).std(ddof=1)
                                   / np.sqrt(len(diffs)))
        rows.append(row)
    return pd.DataFrame(rows)


def score_predictions(truth, prediction_dfs,
                      tol=SDSS_ARCSEC_PER_PIXEL / 3600.0):
    """(AccuracyBenchmark.jl:967-976)"""
    assert len(prediction_dfs) <= 2
    matched_truth, matched = match_catalogs(truth, prediction_dfs, tol=tol)
    error_dfs = [get_error_df(matched_truth, p) for p in matched]
    return get_scores_df(matched_truth, error_dfs[0],
                         error_dfs[1] if len(error_dfs) > 1 else None)


# -----------------------------------------------------------------------------
# Uncertainty calibration (AccuracyBenchmark.jl:978-1026)


def get_uncertainty_df(truth, predictions,
                       tol=SDSS_ARCSEC_PER_PIXEL / 3600.0, aligned=False):
    """aligned=True: truth/prediction rows already correspond 1:1 (e.g. the
    objid-keyed GalSim suite output) — skip position matching entirely."""
    assert_columns_are_present(predictions, STDERR_COLUMNS)
    if aligned:
        assert len(truth) == len(predictions)
        matched_truth, pred = (truth.reset_index(drop=True),
                               predictions.reset_index(drop=True))
    else:
        matched_truth, (pred,) = match_catalogs(truth, [predictions], tol=tol)
    valid = matched_truth["flux_r_nmgy"].to_numpy() > 0
    matched_truth = matched_truth[valid].reset_index(drop=True)
    pred = pred[valid].reset_index(drop=True)

    entries = []
    specs = [("log_flux_r_nmgy", "flux_r_nmgy", np.log, "log_flux_r_stderr")]
    specs += [(c, c, None, f"{c}_stderr") for c in COLOR_COLUMNS]
    for name, col, fn, stderr_col in specs:
        t = matched_truth[col].to_numpy(float)
        p = pred[col].to_numpy(float)
        err = (fn(p) - fn(t)) if fn else (p - t)
        entries.append(pd.DataFrame({
            "name": name, "error": err,
            "posterior_std_err": pred[stderr_col].to_numpy(float)}))
    return pd.concat(entries, ignore_index=True)


def score_uncertainty(uncertainty_df):
    """Fraction of errors within 1/2, 1, 2 posterior std errors; a
    calibrated posterior gives ~0.38 / 0.68 / 0.95."""
    rows = []
    for name, group in uncertainty_df.groupby("name"):
        z = np.abs(group["error"].to_numpy()
                   / group["posterior_std_err"].to_numpy())
        z = z[~np.isnan(z)]
        rows.append({"field": name,
                     "within_half_sd": float((z <= 0.5).mean()),
                     "within_1_sd": float((z <= 1.0).mean()),
                     "within_2_sd": float((z <= 2.0).mean()),
                     "within_3_sd": float((z <= 3.0).mean())})
    return pd.DataFrame(rows)
