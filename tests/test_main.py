"""CLI + YAML config tests (test_main.jl semantics)."""

import os

import numpy as np
import pytest

from celeste_jl_tpu.main import load_results, main, read_config, save_results
from celeste_jl_tpu.io.dataset import BoundingBox
from celeste_jl_tpu.io.sdss import SDSSDataSet
from celeste_jl_tpu.parallel.run import OptimizedSource
from celeste_jl_tpu.utils.config import Config

from sdss_fixtures import make_sdss_field


def _write_config(path, basedir, **extra):
    import yaml
    cfg = {"min_radius_pix": 9.0, "num_joint_vi_iters": 2,
           "datasets": {"sdss": {"basedir": str(basedir)}}}
    cfg.update(extra)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def test_read_config(tmp_path):
    _write_config(tmp_path / "celeste.yml", tmp_path / "data",
                  num_ais_samples=7)
    cfg, datasets = read_config(tmp_path / "celeste.yml")
    assert cfg.min_radius_pix == 9.0
    assert cfg.num_joint_vi_iters == 2
    assert cfg.num_ais_samples == 7
    assert cfg.num_ais_temperatures == 50  # default preserved
    assert isinstance(datasets["sdss"], SDSSDataSet)
    assert datasets["sdss"].dirlayout == "celeste"


def test_read_config_rejects_unknown_dataset(tmp_path):
    import yaml
    with open(tmp_path / "bad.yml", "w") as f:
        yaml.safe_dump({"datasets": {"hubble": {"basedir": "x"}}}, f)
    with pytest.raises(ValueError, match="hubble"):
        read_config(tmp_path / "bad.yml")


def test_save_and_load_results_roundtrip(tmp_path):
    results = [OptimizedSource(init_pos=np.array([1.0, 2.0]),
                               vs=np.arange(44.0), elbo=-5.0,
                               converged=True, is_sky_bad=False)]
    box = BoundingBox(1.0, 2.0, 3.0, 4.0)
    fname = save_results(tmp_path, box, results)
    assert os.path.basename(fname) == "celeste-1.0000-2.0000-3.0000-4.0000.npz"
    loaded = load_results(fname)
    np.testing.assert_allclose(loaded[0].vs, results[0].vs)
    assert loaded[0].converged and not loaded[0].is_sky_bad


def test_main_end_to_end_on_fixture_field(tmp_path):
    base = tmp_path / "sdss"
    rcf, truth, wcs = make_sdss_field(base)
    _write_config(tmp_path / "celeste.yml", base)
    lo = wcs.pix_to_world([10.0, 10.0])
    hi = wcs.pix_to_world([90.0, 60.0])
    # outdir intentionally NOT pre-created: save_results must mkdir it
    # (regression: np.savez used to crash AFTER inference completed)
    outdir = tmp_path / "out" / "nested"
    rc = main(["sdss",
               str(min(lo[0], hi[0])), str(max(lo[0], hi[0])),
               str(min(lo[1], hi[1])), str(max(lo[1], hi[1])),
               "--config", str(tmp_path / "celeste.yml"),
               "--method", "single_vi", "--outdir", str(outdir),
               "--detect-thresh", "8.0"])
    assert rc == 0
    files = list(outdir.glob("celeste-*.npz"))
    assert len(files) == 1
    results = load_results(files[0])
    assert len(results) == len(truth)
    assert all(np.isfinite(r.elbo) for r in results)
