"""vjacobi_eigh vs XLA eigh on the fit's (1024, 42, 42) f32 shape."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from celeste_jl_tpu.ops.jacobi import vjacobi_eigh, jacobi_eigh

B, D = 1024, 42
rng = np.random.default_rng(0)
w_true = np.concatenate([-np.logspace(-4,1,6), np.logspace(-5,3,D-6)])
V,_ = np.linalg.qr(rng.standard_normal((D,D)))
A0 = 0.5*((V*w_true)@V.T + ((V*w_true)@V.T).T)
batch = np.stack([A0 + 1e-3*rng.standard_normal((D,D)) for _ in range(B)])
batch = (0.5*(batch + batch.transpose(0,2,1))).astype(np.float32)
Ab = jax.device_put(jnp.asarray(batch))

def timeit(f, n=5):
    # the tunnel under-measures block_until_ready; force a d2h transfer
    r = f(); np.asarray(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0=time.perf_counter(); r = f(); np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter()-t0)
    return min(ts), r

t_eigh, (w_e, Q_e) = timeit(lambda: jnp.linalg.eigh(Ab))
t_vj, (w_v, Q_v, sw) = timeit(lambda: vjacobi_eigh(Ab, max_sweeps=10, tol=1e-6))
t_j, (w_j, Q_j, swj) = timeit(lambda: jacobi_eigh(Ab, max_sweeps=10, tol=1e-6))
w64 = np.linalg.eigvalsh(batch.astype(np.float64))
err_e = np.max(np.abs(np.sort(np.asarray(w_e,np.float64),-1) - w64))
err_v = np.max(np.abs(np.sort(np.asarray(w_v,np.float64),-1) - w64))
err_j = np.max(np.abs(np.sort(np.asarray(w_j,np.float64),-1) - w64))
print(f"eigh:    {t_eigh*1e3:8.2f} ms  abs_err {err_e:.2e}")
print(f"vjacobi: {t_vj*1e3:8.2f} ms  abs_err {err_v:.2e}  sweeps {int(np.asarray(sw))}")
print(f"jacobi:  {t_j*1e3:8.2f} ms  abs_err {err_j:.2e}  sweeps {int(np.asarray(swj))}")
