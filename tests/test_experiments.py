"""End-to-end smoke test for the MCMC-vs-VI experiment pipeline
(experiments/run_mcmc_experiment.py + mcmc_figures.py — the reference's
experiments/mcmc_scripts role): tiny field, reduced AIS ladder, asserts
every artifact is written and the scored tables are well-formed."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))


def test_experiment_pipeline(tmp_path):
    import mcmc_figures
    import run_mcmc_experiment

    out = str(tmp_path / "output")
    run_mcmc_experiment.main([
        "--num-sources", "5", "--size", "120", "--seed", "3",
        "--temperatures", "6", "--samples", "3", "--output-dir", out])

    for f in ("truth.csv", "vi.csv", "mc.csv", "mc_samples.npz",
              "vi_posterior.csv"):
        assert os.path.exists(os.path.join(out, f)), f

    truth = pd.read_csv(os.path.join(out, "truth.csv"))
    vi_df = pd.read_csv(os.path.join(out, "vi.csv"))
    mc_df = pd.read_csv(os.path.join(out, "mc.csv"))
    assert len(truth) == 5
    assert 0 < len(vi_df) <= 5
    assert len(mc_df) == 5
    # chain summaries carry posterior-stderr + diagnostics columns
    for col in ("log_flux_r_stderr", "color_ug_stderr", "star_lnZ",
                "gal_lnZ", "max_psrf"):
        assert col in mc_df.columns, col
    assert np.isfinite(mc_df["star_lnZ"]).all()

    mcmc_figures.main(["--results-dir", out])
    for f in ("error_comparison.png", "pstar_roc_comparison.png",
              "calibration.csv", "posterior_comparison.png"):
        assert os.path.exists(os.path.join(out, f)), f

    calib = pd.read_csv(os.path.join(out, "calibration.csv"))
    assert set(calib["method"]) == {"vi", "mc"}
    assert ((calib["within_2_sd"] >= calib["within_1_sd"])
            & (calib["within_1_sd"] >= calib["within_half_sd"])).all()
