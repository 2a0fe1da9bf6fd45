"""Profile one warm bench launch on the live backend; view with
tools/xplane_summary.py <dir>."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _synthetic_batch
from celeste_jl_tpu.vi.optimize import fit_sources_compacted as fit_sources

S = int(os.environ.get("BENCH_SOURCES", "1024"))
out = os.environ.get("PROFILE_DIR", "/tmp/tpu_fit_trace")
# same solver knobs as bench.py so the profile matches the headline config
TR_SOLVER = os.environ.get("BENCH_TR_SOLVER", "pjacobi")
JACOBI_SWEEPS = int(os.environ.get(
    "BENCH_JACOBI_SWEEPS", "4" if TR_SOLVER == "pjacobi" else "12"))
from celeste_jl_tpu.ops.newton import NewtonConfig
cfg = NewtonConfig()._replace(tr_solver=TR_SOLVER,
                              jacobi_max_sweeps=JACOBI_SWEEPS)
vp0s, patches = _synthetic_batch(n_sources=S, tile=32, seed=1)
vp0s = jax.device_put(np.asarray(vp0s, dtype=np.float32))
patches = jax.tree.map(lambda x: jax.device_put(x), patches)
res = fit_sources(vp0s, patches, config=cfg)
jax.block_until_ready(res.vp)
t0 = time.perf_counter()
with jax.profiler.trace(out):
    res = fit_sources(vp0s, patches, config=cfg)
    jax.block_until_ready(res.vp)
print("profiled wall:", round(time.perf_counter() - t0, 3), "s ->", out)
