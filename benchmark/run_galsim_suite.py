"""Run the full GalSim-style accuracy suite and write a results artifact.

The reference's north-star accuracy metric (SURVEY.md §6): each of the 28
ground-truth scenes (benchmark/galsim/galsim_benchmarks.py cases) is rendered
by the model forward path, inferred end-to-end, and the estimates are scored
against the header truth. Writes benchmark/galsim_results.md (per-scene
truth-vs-estimate table + summary error stats) and galsim_results.csv.

Usage: python benchmark/run_galsim_suite.py [--joint] [--scenes a,b,c]
CPU (f64) by default — accuracy artifact, not a speed benchmark.
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
enable_compile_cache()  # host/platform-keyed dir + the XLA:CPU AVX2 ISA cap

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--joint", dest="joint", action="store_true",
                    default=True, help="joint (deblended) inference (default)")
    ap.add_argument("--single", dest="joint", action="store_false",
                    help="per-source single inference — overlap scenes then "
                         "absorb neighbor light (documented failure mode)")
    ap.add_argument("--scenes", default=None,
                    help="comma-separated subset of scene names")
    ap.add_argument("--out", default=None, help="output directory")
    ap.add_argument("--radius", type=float, default=40.0,
                    help="min active radius in px (the reference forces 40, "
                         "ACTIVE_PIXELS_MIN_RADIUS_PX; frac_dev of a "
                         "truncated dev profile is identified by its wings)")
    args = ap.parse_args()

    from celeste_jl_tpu.benchmark import accuracy as ab
    from celeste_jl_tpu.benchmark.galsim import SCENES, run_benchmarks

    names = args.scenes.split(",") if args.scenes else [s.name for s in SCENES]
    outdir = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)))

    t0 = time.time()
    truth_df, pred_df = run_benchmarks(names, joint_inference=args.joint,
                                       min_radius_pix=args.radius)
    wall = time.time() - t0

    # Field scores from the objid-aligned per-row error df. run_benchmarks
    # returns row-aligned truth/prediction frames, so no position matching is
    # needed — and none is done: round 1's artifact was invalidated by
    # KDTree matching pairing truth rows with other scenes' predictions.
    err = ab.get_error_df(truth_df, pred_df)
    scores = ab.get_scores_df(truth_df, err)

    # Cross-check: now that every scene has a distinct world origin, the
    # reference-style position-matched scoring must agree with the aligned
    # scoring (same N per field). Disagreement means match contamination.
    matched_scores = ab.score_predictions(truth_df, [pred_df])
    aligned_n = dict(zip(scores["field"], scores["N"]))
    for _, row in matched_scores.iterrows():
        n0 = aligned_n.get(row["field"])
        if n0 is not None and row["N"] != n0:
            print(f"WARNING: matched-vs-aligned N mismatch for "
                  f"{row['field']}: {row['N']} vs {n0}")

    csv_path = os.path.join(outdir, "galsim_results.csv")
    merged = truth_df[["objid", "is_star", "flux_r_nmgy", "gal_axis_ratio",
                       "gal_radius_px", "gal_angle_deg"]].copy()
    merged.columns = ["objid"] + [f"true_{c}" for c in merged.columns[1:]]
    for c in ("is_star", "flux_r_nmgy", "gal_axis_ratio", "gal_radius_px",
              "gal_angle_deg"):
        merged[f"est_{c}"] = pred_df[c].values
    merged.to_csv(csv_path, index=False)

    # uncertainty calibration (within-k-sigma fractions; a calibrated
    # posterior gives ~0.38 / 0.68 / 0.95)
    try:
        unc = ab.score_uncertainty(
            ab.get_uncertainty_df(truth_df, pred_df, aligned=True))
    except Exception as exc:
        unc = None
        print("uncertainty scoring skipped:", exc)

    # reference accuracy gate (disabled_test_galsim_benchmarks.jl:29-47)
    from celeste_jl_tpu.benchmark.galsim import (SCENES_BY_NAME,
                                                 estimate_violations,
                                                 truth_comparison_df)
    violations = estimate_violations(truth_comparison_df(truth_df, pred_df))

    # NOISE-FREE gate: the deterministic bar. Scenes that are noisy by
    # design are re-run with noise off; estimate_violations must be 0 here
    # (any as-defined violations above are then attributable to seed
    # scatter on weakly-identified directions, not fit bias).
    noisy_names = [n for n in names
                   if n in SCENES_BY_NAME and SCENES_BY_NAME[n].include_noise]
    nf_violations = []
    if noisy_names:
        t_nf, p_nf = run_benchmarks(noisy_names, joint_inference=args.joint,
                                    min_radius_pix=args.radius,
                                    force_noise_free=True)
        quiet = [n for n in names if n not in noisy_names]
        t_q = truth_df[truth_df.objid.str.rsplit("_", n=1).str[0]
                       .isin(quiet)]
        p_q = pred_df[pred_df.objid.str.rsplit("_", n=1).str[0].isin(quiet)]
        import pandas as pd
        t_all = pd.concat([t_q, t_nf], ignore_index=True)
        p_all = pd.concat([p_q, p_nf], ignore_index=True)
        nf_violations = estimate_violations(truth_comparison_df(t_all,
                                                                p_all))

    md_path = os.path.join(outdir, "galsim_results.md")
    with open(md_path, "w") as f:
        f.write("# GalSim-style accuracy suite results\n\n")
        f.write(f"{len(names)} scenes, {len(truth_df)} sources, "
                f"{'joint' if args.joint else 'single'} inference, "
                f"CPU f64, {wall:.0f}s wall.\n\n")
        f.write("## Field scores (mean abs error over sources "
                "with that field defined; objid-aligned rows)\n\n")
        f.write(scores.to_markdown(index=False))
        f.write(f"\n\nReference tolerance gate "
                f"(disabled_test_galsim_benchmarks.jl), scenes as defined "
                f"(incl. noisy), radius {args.radius:.0f}px: "
                f"{len(violations)} violations"
                + ("" if not violations else " — " + "; ".join(
                    f"{o}.{v} truth={t:.3f} est={e:.3f}"
                    for o, v, t, e, _ in violations[:20])) + "\n")
        f.write(f"\nNOISE-FREE gate (noisy-by-design scenes re-run with "
                f"noise off — the deterministic bar): "
                f"{len(nf_violations)} violations"
                + ("" if not nf_violations else " — " + "; ".join(
                    f"{o}.{v} truth={t:.3f} est={e:.3f}"
                    for o, v, t, e, _ in nf_violations[:20])) + "\n")
        if unc is not None:
            f.write("\n\n## Posterior uncertainty calibration "
                    "(fraction of errors within k posterior std errs; "
                    "calibrated ~ 0.38 / 0.68 / 0.95)\n\n")
            f.write("NOTE: this table mixes NOISE-FREE scenes into the "
                    "denominator — their errors are near zero, so every "
                    "error trivially lands within half a posterior std "
                    "and the fractions read as over-dispersed (~0.9 at "
                    "0.5 sd). It is NOT a calibration measurement. The "
                    "real study (all scenes under Poisson noise, "
                    "multi-seed) is benchmark/calibration_results.md: "
                    "r-band flux is calibrated (0.46/0.70/0.91), color "
                    "posteriors are OVERconfident (mean-field VI drops "
                    "the cross-band flux correlations), matching the "
                    "reference's own published pattern.\n\n")
            f.write(unc.to_markdown(index=False))
        f.write("\n\n## Per-source truth vs estimate\n\n")
        f.write(merged.to_markdown(index=False, floatfmt=".3f"))
        f.write("\n")

    n_star_true = (truth_df["is_star"] > 0.5).values
    n_star_est = (pred_df["is_star"] > 0.5).values
    acc = float(np.mean(n_star_true == n_star_est))
    flux_err = np.abs(pred_df["flux_r_nmgy"] - truth_df["flux_r_nmgy"]) \
        / truth_df["flux_r_nmgy"]
    print(f"scenes={len(names)} sources={len(truth_df)} wall={wall:.0f}s")
    print(f"tolerance-gate violations (as defined): {len(violations)}")
    for v in violations:
        print("  VIOLATION:", v)
    print(f"noise-free gate violations: {len(nf_violations)}")
    for v in nf_violations:
        print("  NF-VIOLATION:", v)
    print(f"type accuracy: {acc:.3f}")
    print(f"median rel flux err: {float(np.median(flux_err)):.4f}")
    print(f"wrote {md_path} and {csv_path}")


if __name__ == "__main__":
    main()
