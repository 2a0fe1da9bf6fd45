"""Console entry point + config file reader (main.jl rebuilt).

`python -m celeste_jl_tpu <datasets> <ramin> <ramax> <decmin> <decmax>
 [--config celeste.yml] [--method joint_vi] [--outdir .]`

The YAML schema matches the reference (main.jl:12-44): universal keys
(min_radius_pix, num_ais_temperatures, num_ais_samples, num_joint_vi_iters)
plus `datasets.sdss.{basedir, dirlayout, slurp, compressed}` /
`datasets.decals.basedir`. Results are saved as
celeste-<ramin>-<ramax>-<decmin>-<decmax>.npz (the JLD equivalent).
"""

import argparse
import os

import numpy as np

from .io.dataset import BoundingBox
from .parallel.run import infer_box
from .utils import log as Log
from .utils.config import Config


def read_config(filename):
    """YAML config -> (Config, {name: SurveyDataSet}) (main.jl:12-44)."""
    import yaml

    with open(filename) as f:
        data = yaml.safe_load(f) or {}

    cfg_keys = ["min_radius_pix", "num_ais_temperatures",
                "num_ais_samples", "num_joint_vi_iters"]
    cfg = Config(**{k: data[k] for k in cfg_keys if k in data})

    datasets = {}
    for name, ds_cfg in (data.get("datasets") or {}).items():
        if name == "sdss":
            from .io.sdss import SDSSDataSet
            datasets[name] = SDSSDataSet(
                ds_cfg["basedir"],
                dirlayout=ds_cfg.get("dirlayout", "celeste"),
                compressed=ds_cfg.get("compressed", False),
                slurp=ds_cfg.get("slurp", False))
        elif name == "decals":
            from .io.decals import DECALSDataSet
            datasets[name] = DECALSDataSet(ds_cfg["basedir"])
        else:
            raise ValueError(f"unrecognized dataset name: {name}")
    return cfg, datasets


def save_results(outdir, box: BoundingBox, results):
    """Results -> one npz per sky box (main.jl:50-56). Resume granularity is
    the box: re-run missing boxes."""
    os.makedirs(outdir, exist_ok=True)
    fname = os.path.join(
        outdir, f"celeste-{box.ramin:.4f}-{box.ramax:.4f}"
                f"-{box.decmin:.4f}-{box.decmax:.4f}.npz")
    np.savez(
        fname,
        init_pos=np.stack([r.init_pos for r in results])
        if results else np.zeros((0, 2)),
        vs=np.stack([r.vs for r in results]) if results
        else np.zeros((0, 44)),
        elbo=np.array([r.elbo for r in results]),
        converged=np.array([r.converged for r in results]),
        is_sky_bad=np.array([r.is_sky_bad for r in results]))
    return fname


def load_results(fname):
    from .parallel.run import OptimizedSource
    d = np.load(fname)
    return [OptimizedSource(init_pos=d["init_pos"][i], vs=d["vs"][i],
                            elbo=float(d["elbo"][i]),
                            converged=bool(d["converged"][i]),
                            is_sky_bad=bool(d["is_sky_bad"][i]))
            for i in range(d["vs"].shape[0])]


def main(argv=None):
    from .utils.config import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(
        prog="infer-box",
        description="Infer a catalog for one RA/Dec box of the sky.")
    parser.add_argument("datasets",
                        help="comma-separated dataset names from the config")
    parser.add_argument("ramin", type=float)
    parser.add_argument("ramax", type=float)
    parser.add_argument("decmin", type=float)
    parser.add_argument("decmax", type=float)
    parser.add_argument("--config", default="celeste.yml",
                        help="YAML configuration file")
    parser.add_argument("--method", default="joint_vi",
                        choices=["joint_vi", "single_vi", "svi", "mcmc"])
    parser.add_argument("--outdir", default=".")
    parser.add_argument("--detect-thresh", type=float, default=1.3,
                        help="detection threshold in sky-noise sigmas "
                             "(detection.jl uses 1.3)")
    args = parser.parse_args(argv)

    # The reference pipeline is float64 throughout; survey world coordinates
    # (~150 deg with 1e-7-deg position boxes) are unrepresentable in f32.
    # NOTE: the JAX_ENABLE_X64 env var is ignored by current JAX — the
    # config flag must be set programmatically before any array is created.
    import jax
    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: box farming re-jits identical fit
    # shapes in every process; cache them across runs.
    cache_dir = os.environ.get("CELESTE_JAX_CACHE", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    config, known = read_config(args.config)
    box = BoundingBox(args.ramin, args.ramax, args.decmin, args.decmax)

    images = []
    for name in args.datasets.split(","):
        images.extend(known[name].load_images(box))
    Log.info(f"loaded {len(images)} images for box {box}")

    boxsize = (min(256, images[0].H), min(256, images[0].W)) if images \
        else (256, 256)
    results = infer_box(images, box=box, method=args.method, config=config,
                        thresh=args.detect_thresh, boxsize=boxsize)
    fname = save_results(args.outdir, box, results)
    Log.info(f"saved {len(results)} sources to {fname}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
