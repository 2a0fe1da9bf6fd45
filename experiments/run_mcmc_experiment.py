"""MCMC-vs-VI experiment runner (the reference's AIS-MCMC results pipeline).

Reference analog: experiments/mcmc_scripts — run_synthetic_experiment.sh
drives per-source AIS-MCMC over a synthetic prior-draw field, scores the
samples against truth and against the VB (deterministic VI) catalog with
score_mcmc_results.jl, and make_mcmc_results_figures.py turns the scored
CSVs into the paper figures. This script is steps 0-2 in one process:

1. draw a catalog from the model prior and render a synthetic field
   (AccuracyBenchmark prior-draw simulation + Synthetic renderer),
2. fit every source with joint VI (one fused launch) AND with batched
   AIS/MCMC (one vmapped launch),
3. write truth/vi/mc catalog CSVs plus raw posterior-sample npz into
   --output-dir (default experiments/output) for mcmc_figures.py.

Env-free; everything is a flag. Small by default so it runs on CPU in
minutes; on the TPU the full Config() ladder is the measured path
(benchmark/mcmc_results.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-sources", type=int, default=16)
    p.add_argument("--size", type=int, default=200, help="field side (px)")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--temperatures", type=int, default=0,
                   help="AIS temperatures (0 = Config default, 50)")
    p.add_argument("--samples", type=int, default=0,
                   help="AIS importance samples (0 = Config default, 10)")
    p.add_argument("--output-dir",
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)), "output"))
    args = p.parse_args(argv)

    import numpy as np
    import pandas as pd

    from celeste_jl_tpu.benchmark.accuracy import (catalog_entries_to_df,
                                                   celeste_to_df,
                                                   generate_catalog_from_prior)
    from celeste_jl_tpu.io.wcs import LinearWCS
    from celeste_jl_tpu.mcmc.infer import mcmc_to_df, one_node_mcmc_infer
    from celeste_jl_tpu.models.image import Image
    from celeste_jl_tpu.models.psf import gaussian_psf
    from celeste_jl_tpu.parallel.run import one_node_joint_infer
    from celeste_jl_tpu.synthetic import gen_images
    from celeste_jl_tpu.utils.config import Config, enable_compile_cache
    from celeste_jl_tpu.utils import log as Log

    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)

    # real sky scale (0.396 arcsec/px, like the GalSim suite) so the
    # angular-separation scorers and the 1-SDSS-pixel match tolerance in
    # benchmark/accuracy.py apply unchanged
    dpp = 0.396 / 3600.0
    truth = generate_catalog_from_prior(args.num_sources,
                                        extent=args.size * dpp,
                                        margin=16.0 * dpp, seed=args.seed)
    wcs = LinearWCS(crpix=(0.0, 0.0), crval=(0.0, 0.0),
                    cd=np.eye(2) * dpp)
    psf = gaussian_psf()
    images = [Image(pixels=np.zeros((args.size, args.size)), band=b,
                    psf=psf, sky=0.1, nelec_per_nmgy=600.0, wcs=wcs)
              for b in range(5)]
    gen_images(images, truth, seed=args.seed)

    cfg = Config()
    if args.temperatures:
        cfg.num_ais_temperatures = args.temperatures
    if args.samples:
        cfg.num_ais_samples = args.samples

    # inference is initialized FROM the truth catalog (the reference's
    # synthetic experiment skips --use-full-initialization for the same
    # reason: init is ground truth, the posterior moves off it)
    Log.info(f"experiment: joint VI over {len(truth)} sources")
    vi_results = one_node_joint_infer(truth, images, config=cfg)
    vi_df = celeste_to_df(vi_results)

    Log.info(f"experiment: batched AIS/MCMC over {len(truth)} sources "
             f"({cfg.num_ais_temperatures} temps x {cfg.num_ais_samples})")
    mc_results = one_node_mcmc_infer(truth, images, config=cfg,
                                     seed=args.seed)
    mc_df = mcmc_to_df(mc_results, num_chains=cfg.num_ais_samples)

    truth_df = catalog_entries_to_df(truth)
    truth_df.to_csv(os.path.join(args.output_dir, "truth.csv"), index=False)
    vi_df.to_csv(os.path.join(args.output_dir, "vi.csv"), index=False)
    mc_df.to_csv(os.path.join(args.output_dir, "mc.csv"), index=False)

    # raw posterior samples for the posterior-comparison figures
    # (reference: make_mcmc_vb_uncertainty_comparison_plots reads per-source
    # sample chains)
    np.savez_compressed(
        os.path.join(args.output_dir, "mc_samples.npz"),
        **{f"star_{i}": np.asarray(r["star_samples"])
           for i, r in enumerate(mc_results)},
        **{f"gal_{i}": np.asarray(r["gal_samples"])
           for i, r in enumerate(mc_results)})
    # VI posterior (is_star prob + per-source flux_loc/scale) for overlays
    vi_post = pd.DataFrame({
        "is_star": vi_df["is_star"],
        "log_flux_r_mean": np.log(vi_df["flux_r_nmgy"]),
        "log_flux_r_stderr": vi_df["log_flux_r_stderr"],
    })
    vi_post.to_csv(os.path.join(args.output_dir, "vi_posterior.csv"),
                   index=False)
    Log.info(f"experiment: wrote truth/vi/mc CSVs to {args.output_dir}")


if __name__ == "__main__":
    main()
