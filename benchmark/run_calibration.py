"""Posterior uncertainty calibration study (multi-seed, noise on).

The round-1 calibration table was computed on mostly noise-free scenes,
where errors are near zero and every error trivially lands within half a
posterior std — it said nothing about calibration. This study renders
EVERY GalSim-suite scene with Poisson noise across several seeds, so each
(scene, field) pair contributes independent error realizations, and reports
the within-k-sigma fractions per field (the reference treats these as a
first-class science output, AccuracyBenchmark.jl:978-1026; calibrated
posteriors give ~0.38 / 0.68 / 0.95 for k = 0.5 / 1 / 2).

Writes benchmark/calibration_results.md. Env: CAL_SEEDS (default 5).
Usage: python benchmark/run_calibration.py [--scenes a,b,c]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from celeste_jl_tpu.utils.config import enable_compile_cache  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
enable_compile_cache()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

N_SEEDS = int(os.environ.get("CAL_SEEDS", "5"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default=None)
    args = ap.parse_args()

    from celeste_jl_tpu.benchmark import accuracy as ab
    from celeste_jl_tpu.benchmark.galsim import SCENES, run_benchmarks

    names = args.scenes.split(",") if args.scenes else [s.name for s in SCENES]
    outdir = os.path.dirname(os.path.abspath(__file__))

    t0 = time.time()
    unc_dfs, err_rows = [], []
    for i in range(N_SEEDS):
        seed = 1234 + 7919 * i
        truth_df, pred_df = run_benchmarks(
            names, joint_inference=True, seed=seed, force_noise=True)
        unc = ab.get_uncertainty_df(truth_df, pred_df, aligned=True)
        unc["seed"] = seed
        unc_dfs.append(unc)
        err = ab.get_error_df(truth_df, pred_df)
        err_rows.append(ab.get_scores_df(truth_df, err).assign(seed=seed))
        print(f"seed {seed}: {len(truth_df)} sources, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)

    all_unc = pd.concat(unc_dfs, ignore_index=True)
    cal = ab.score_uncertainty(all_unc)
    cal["N"] = [int((all_unc["name"] == f).sum()) for f in cal["field"]]

    # z-score quantiles per field: a sharper view than threshold counts
    qs = []
    for f, g in all_unc.groupby("name"):
        z = np.abs(g["error"].to_numpy() / g["posterior_std_err"].to_numpy())
        z = z[np.isfinite(z)]
        qs.append({"field": f, "z_median": float(np.median(z)),
                   "z_p90": float(np.quantile(z, 0.9)),
                   "z_max": float(z.max())})
    zq = pd.DataFrame(qs)

    scores = pd.concat(err_rows, ignore_index=True)
    mean_scores = scores.groupby("field", as_index=False).agg(
        N=("N", "sum"), mean_err=("first", "mean"))

    md = os.path.join(outdir, "calibration_results.md")
    with open(md, "w") as f:
        f.write("# Posterior uncertainty calibration study\n\n")
        f.write(f"{len(names)} scenes x {N_SEEDS} seeds, ALL scenes "
                f"rendered with Poisson noise, joint inference, CPU f64, "
                f"{time.time() - t0:.0f}s wall.\n\n")
        f.write("A calibrated posterior gives within-k-sigma fractions "
                "~0.38 / 0.68 / 0.95 / 0.997 for k = 0.5 / 1 / 2 / 3 "
                "(AccuracyBenchmark.jl:978-1026 analog).\n\n")
        f.write(cal.to_markdown(index=False, floatfmt=".3f"))
        f.write("\n\n## |z| quantiles per field (|error| / posterior sd)\n\n")
        f.write(zq.to_markdown(index=False, floatfmt=".3f"))
        f.write("\n\n## Mean abs errors under noise "
                "(per-field, averaged over seeds)\n\n")
        f.write(mean_scores.to_markdown(index=False, floatfmt=".4f"))
        f.write("\n")
    print(cal.to_string(index=False))
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
