"""eigh vs pjacobi cost across batch widths (the joint schedule's narrow
class-steps vs the bench's wide launches)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from celeste_jl_tpu.ops.pallas_eigh import pallas_jacobi_eigh

rng = np.random.default_rng(0)
D = 42
A0 = rng.standard_normal((D, D)); A0 = 0.5*(A0+A0.T)

def timeit(f, n=6):
    r = f(); np.asarray(jax.tree.leaves(r)[0])
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); r=f(); np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter()-t0)
    return min(ts)

for B in (8, 32, 128, 512, 1024):
    batch = np.stack([A0 + 0.01*rng.standard_normal((D,D)) for _ in range(B)])
    batch = (0.5*(batch+batch.transpose(0,2,1))).astype(np.float32)
    Ab = jax.device_put(jnp.asarray(batch))
    t_e = timeit(lambda: jnp.linalg.eigh(Ab))
    t_p = timeit(lambda: pallas_jacobi_eigh(Ab, max_sweeps=4, tol=1e-6))
    print(f"B={B:5d}: eigh {t_e*1e3:8.2f} ms   pjacobi(4) {t_p*1e3:8.2f} ms")
