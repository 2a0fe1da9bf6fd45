"""Figures + tables from an MCMC-vs-VI experiment run.

Reference analog: experiments/mcmc_scripts/make_mcmc_results_figures.py
(error-comparison figures :177-310, star/gal ROC curves :395-446,
calibration tables :32-57, posterior-comparison plots :449-507). Reads the
CSVs written by run_mcmc_experiment.py and writes into the same directory:

- error_comparison.png      per-parameter |error| of VI vs MCMC (paired dots)
- pstar_roc_comparison.png  star/galaxy ROC from each method's P(star)
- calibration.csv           within-k-sigma fractions for both posteriors
- posterior_comparison.png  MCMC log-flux histogram vs VI Gaussian overlay

Chart conventions: one axis per panel, two fixed series hues
(VI #2a78d6, MCMC #eb6834), recessive grey grid, legend + direct labels.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VI_COLOR = "#2a78d6"
MC_COLOR = "#eb6834"
INK = "#3d3d3a"
GRID = "#e3e2da"

ERROR_FIELDS = ["position", "flux_r_mag", "color_ug", "color_gr",
                "color_ri", "color_iz", "gal_frac_dev", "gal_axis_ratio",
                "gal_radius_px", "gal_angle_deg"]


def _style(ax):
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)


def make_error_comparison(truth, vi_df, mc_df, out_png):
    """Mean |error| per field, VI vs MCMC on matched sources
    (make_mcmc_results_figures.py:177-310)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from celeste_jl_tpu.benchmark.accuracy import score_predictions

    scores = score_predictions(truth, [vi_df, mc_df])
    scores = scores[scores["field"].isin(ERROR_FIELDS)]
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=200)
    y = np.arange(len(scores))
    ax.hlines(y, scores["first"], scores["second"], color=GRID,
              linewidth=1.2, zorder=1)
    ax.scatter(scores["first"], y, s=34, color=VI_COLOR, zorder=2,
               label="VI")
    ax.scatter(scores["second"], y, s=34, color=MC_COLOR, zorder=2,
               label="MCMC")
    ax.set_yticks(y, scores["field"])
    ax.set_xlabel("mean |error|  (matched sources)", color=INK, fontsize=9)
    ax.invert_yaxis()
    _style(ax)
    ax.legend(frameon=False, fontsize=8, loc="lower right")
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)
    return scores


def make_roc(truth, vi_df, mc_df, out_png):
    """Star/galaxy ROC from P(star), both methods
    (make_mcmc_results_figures.py:395-422)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from celeste_jl_tpu.benchmark.accuracy import match_catalogs

    m_truth, (m_vi, m_mc) = match_catalogs(truth, [vi_df, mc_df])
    is_star = m_truth["is_star"].to_numpy() > 0.5

    def roc(score):
        order = np.argsort(-score)
        tp = np.cumsum(is_star[order])
        fp = np.cumsum(~is_star[order])
        tpr = tp / max(is_star.sum(), 1)
        fpr = fp / max((~is_star).sum(), 1)
        auc = float(np.trapezoid(np.r_[0.0, tpr], np.r_[0.0, fpr]))
        return np.r_[0.0, fpr], np.r_[0.0, tpr], auc

    fig, ax = plt.subplots(figsize=(4.2, 4.0), dpi=200)
    aucs = {}
    for name, df, c in (("VI", m_vi, VI_COLOR), ("MCMC", m_mc, MC_COLOR)):
        fpr, tpr, auc = roc(df["is_star"].to_numpy(float))
        aucs[name] = auc
        ax.plot(fpr, tpr, color=c, linewidth=2,
                label=f"{name}  (AUC {auc:.3f})", drawstyle="steps-post")
    ax.plot([0, 1], [0, 1], color=GRID, linewidth=1, linestyle="--")
    ax.set_xlabel("False positive rate", color=INK, fontsize=9)
    ax.set_ylabel("True positive rate", color=INK, fontsize=9)
    _style(ax)
    ax.legend(frameon=False, fontsize=8, loc="lower right")
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)
    return aucs


def make_calibration_table(truth, vi_df, mc_df, out_csv):
    """Within-k-sigma fractions for both posteriors
    (make_mcmc_results_figures.py:32-57)."""
    import pandas as pd

    from celeste_jl_tpu.benchmark.accuracy import (get_uncertainty_df,
                                                   score_uncertainty)

    tables = []
    for name, df in (("vi", vi_df), ("mc", mc_df)):
        t = score_uncertainty(get_uncertainty_df(truth, df))
        t.insert(0, "method", name)
        tables.append(t)
    out = pd.concat(tables, ignore_index=True)
    out.to_csv(out_csv, index=False)
    return out


def make_posterior_comparison(samples_npz, vi_post_csv, mc_df, out_png,
                              max_sources=4):
    """MCMC log-flux histograms vs the VI Gaussian posterior for the first
    few sources (make_mcmc_results_figures.py:449-507)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import pandas as pd

    samples = np.load(samples_npz)
    vi_post = pd.read_csv(vi_post_csv)
    n = min(max_sources, len(vi_post), len(mc_df))
    fig, axes = plt.subplots(1, n, figsize=(3.0 * n, 2.6), dpi=200,
                             squeeze=False)
    for i in range(n):
        ax = axes[0][i]
        is_star = float(mc_df["is_star"].iloc[i]) > 0.5
        chain = samples[f"{'star' if is_star else 'gal'}_{i}"]
        lnf = chain[:, 2]
        ax.hist(lnf, bins=30, density=True, color=MC_COLOR, alpha=0.45,
                label="MCMC" if i == 0 else None)
        mu = float(vi_post["log_flux_r_mean"].iloc[i])
        sd = max(float(vi_post["log_flux_r_stderr"].iloc[i]), 1e-6)
        xs = np.linspace(min(lnf.min(), mu - 4 * sd),
                         max(lnf.max(), mu + 4 * sd), 200)
        ax.plot(xs, np.exp(-0.5 * ((xs - mu) / sd) ** 2)
                / (sd * np.sqrt(2 * np.pi)),
                color=VI_COLOR, linewidth=2, label="VI" if i == 0 else None)
        ax.set_xlabel(f"src {i}: log flux_r", color=INK, fontsize=8)
        ax.set_yticks([])
        _style(ax)
    axes[0][0].legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results-dir",
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)), "output"))
    args = p.parse_args(argv)
    d = args.results_dir

    import pandas as pd

    truth = pd.read_csv(os.path.join(d, "truth.csv"))
    vi_df = pd.read_csv(os.path.join(d, "vi.csv"))
    mc_df = pd.read_csv(os.path.join(d, "mc.csv"))

    scores = make_error_comparison(truth, vi_df, mc_df,
                                   os.path.join(d, "error_comparison.png"))
    aucs = make_roc(truth, vi_df, mc_df,
                    os.path.join(d, "pstar_roc_comparison.png"))
    calib = make_calibration_table(truth, vi_df, mc_df,
                                   os.path.join(d, "calibration.csv"))
    make_posterior_comparison(os.path.join(d, "mc_samples.npz"),
                              os.path.join(d, "vi_posterior.csv"), mc_df,
                              os.path.join(d, "posterior_comparison.png"))
    print(scores.to_string(index=False))
    print({"auc": aucs})
    print(calib.to_string(index=False))


if __name__ == "__main__":
    main()
