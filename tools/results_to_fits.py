"""Convert celeste-<box>.npz result files to a FITS binary-table catalog.

Parity with the reference's contrib/nersc/optimized_sources_to_fits.jl:
gathers one or more per-box result files (main.save_results output), maps
variational parameters to catalog quantities (position, star/galaxy
probability, fluxes/colors + stderrs, galaxy shape), and writes ONE FITS
bintable.

    python tools/results_to_fits.py out/celeste-*.npz -o catalog.fits
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def results_to_fits(npz_paths, out_path):
    from celeste_jl_tpu.benchmark.accuracy import celeste_to_df
    from celeste_jl_tpu.io.fits import write_fits
    from celeste_jl_tpu.main import load_results

    frames = []
    extra = []
    for p in npz_paths:
        results = load_results(p)
        df = celeste_to_df(results)
        df["box_file"] = os.path.basename(p)
        df["converged"] = [r.converged for r in results
                           if not r.is_sky_bad]
        df["elbo"] = [r.elbo for r in results if not r.is_sky_bad]
        frames.append(df)
    import pandas as pd
    cat = pd.concat(frames, ignore_index=True) if frames else None
    if cat is None or not len(cat):
        raise SystemExit("no (good-sky) sources in the given result files")

    columns = {}
    for name in cat.columns:
        col = cat[name].to_numpy()
        if col.dtype == object:
            col = col.astype("U32")
        columns[name] = col
    write_fits(out_path, [(None, [("NSRC", int(len(cat)), "sources")]),
                          (columns, [("EXTNAME", "CATALOG", "")])])
    return len(cat)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="celeste-<box>.npz result files -> FITS catalog")
    ap.add_argument("npz", nargs="+", help="result files (celeste-*.npz)")
    ap.add_argument("-o", "--out", required=True, help="output FITS path")
    args = ap.parse_args(argv)
    n = results_to_fits(args.npz, args.out)
    print(f"wrote {n} sources to {args.out}")


if __name__ == "__main__":
    main()
