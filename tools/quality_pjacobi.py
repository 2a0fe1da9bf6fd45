"""Fit-quality parity: pjacobi vs the eig TR solver on the bench batch.

Same inputs, same schedule; compares final ELBO values, convergence, and
star/galaxy classifications. The ELBO margin is the basin-acceptance
margin (parallel.common.BASIN_MARGIN_REL reasoning): value differences
within optimizer tolerance are expected, basin flips are not."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _synthetic_batch
from celeste_jl_tpu.vi.optimize import fit_sources_compacted as fit_sources
from celeste_jl_tpu.ops.newton import NewtonConfig
from celeste_jl_tpu.models.params import ids

S = int(os.environ.get("BENCH_SOURCES", "1024"))
SW = int(os.environ.get("BENCH_JACOBI_SWEEPS", "5"))
vp0s, patches = _synthetic_batch(n_sources=S, tile=32, seed=1)
vp0s = jax.device_put(np.asarray(vp0s, dtype=np.float32))
patches = jax.tree.map(lambda x: jax.device_put(x), patches)

res_e = fit_sources(vp0s, patches, config=NewtonConfig())
e_elbo = np.asarray(res_e.elbo); e_vp = np.asarray(res_e.vp)
res_p = fit_sources(vp0s, patches, config=NewtonConfig(
    tr_solver="pjacobi", jacobi_max_sweeps=SW))
p_elbo = np.asarray(res_p.elbo); p_vp = np.asarray(res_p.vp)

d = p_elbo - e_elbo
rel = d / np.abs(e_elbo)
types_e = e_vp[:, ids.is_star[0]] > 0.5
types_p = p_vp[:, ids.is_star[0]] > 0.5
flips = int(np.sum(types_e != types_p))
print(f"sweeps={SW} elbo diff (pjacobi-eig): mean_rel {rel.mean():.3g} "
      f"min_rel {rel.min():.3g} max_rel {rel.max():.3g}")
print(f"worse_than_eig_by_>1e-6_rel: {int(np.sum(rel < -1e-6))} / {S}")
print(f"type flips: {flips} / {S}")
print(f"converged: eig {int(np.asarray(res_e.converged).sum())} "
      f"pjacobi {int(np.asarray(res_p.converged).sum())}")
