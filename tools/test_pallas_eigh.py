import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from celeste_jl_tpu.ops.pallas_eigh import pallas_jacobi_eigh
import time

B, D = 1024, 42
rng = np.random.default_rng(0)
w_true = np.concatenate([-np.logspace(-4,1,6), np.logspace(-5,3,D-6)])
V,_ = np.linalg.qr(rng.standard_normal((D,D)))
A0 = 0.5*((V*w_true)@V.T + ((V*w_true)@V.T).T)
batch = np.stack([A0 + 1e-3*rng.standard_normal((D,D)) for _ in range(B)])
batch = (0.5*(batch + batch.transpose(0,2,1))).astype(np.float32)
Ab = jax.device_put(jnp.asarray(batch))

w, Q, sw = pallas_jacobi_eigh(Ab, max_sweeps=10, tol=1e-6)
w_np = np.asarray(w)
w64 = np.linalg.eigvalsh(batch.astype(np.float64))
err = np.max(np.abs(np.sort(w_np.astype(np.float64),-1) - w64))
Qn = np.asarray(Q[0], np.float64)
orth = np.max(np.abs(Qn.T@Qn - np.eye(D)))
print(f"pallas_jacobi: sweeps {int(np.asarray(sw))} abs_err {err:.2e} orth {orth:.2e}")

def timeit(f, n=5):
    r = f(); np.asarray(jax.tree.leaves(r)[0])
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); r=f(); np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter()-t0)
    return min(ts)

t_p = timeit(lambda: pallas_jacobi_eigh(Ab, max_sweeps=10, tol=1e-6))
t_e = timeit(lambda: jnp.linalg.eigh(Ab))
print(f"pallas {t_p*1e3:.2f} ms vs eigh {t_e*1e3:.2f} ms")
