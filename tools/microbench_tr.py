"""Micro-benchmarks for the trust-region subproblem primitives on TPU.

Times the candidate batched linear-algebra kernels the Newton-TR driver
could be built on (ops/newton.py tr_solver options), at the production
batch shape (S, D, D) = (512, 41, 41) f32:

  * jnp.linalg.eigh at D=41 (the current "eig" solver's refresh cost)
  * jnp.linalg.eigh at small Krylov dims (GLTR candidate)
  * jnp.linalg.cholesky (+ triangular solves) at D=41 (More-Sorensen-with-
    Cholesky candidate)
  * batched matvec chains (Lanczos / CG step cost)

Over the tunneled TPU a host sync costs ~50 ms, so each op is CHAINED
CHAIN times inside one jit (each iteration consumes the previous result)
and the reported time is (wall - one sync) / CHAIN.

Usage: python tools/microbench_tr.py [S] [D]
"""

import sys
import time

import numpy as np

CHAIN = 16


def timed(make_fn, *args, repeats=5):
    """make_fn(x, *rest) -> same-shaped-as-x result; chained CHAIN times."""
    import jax

    @jax.jit
    def chained(x, *rest):
        def body(x, _):
            return make_fn(x, *rest), None
        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x

    out = chained(*args)
    np.asarray(jax.block_until_ready(out)).ravel()[:1]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(chained(*args))).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def spd(rng, S, D):
    A = rng.normal(size=(S, D, D)).astype(np.float32)
    return A @ np.swapaxes(A, 1, 2) / D + 0.1 * np.eye(D, dtype=np.float32)


def main():
    import jax
    import jax.numpy as jnp

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 41

    rng = np.random.default_rng(0)
    H = jax.device_put(spd(rng, S, D))

    def renorm(X):
        # keep chained iterates bounded without changing the op's cost class
        return X / (1.0 + jnp.abs(X[..., :1, :1]))

    def op_eigh(X, H):
        w, Q = jnp.linalg.eigh(H + 1e-6 * X[..., :1, :1] * 0)
        return renorm(Q * w[..., None, :] + X * 1e-9)

    def op_chol(X, H):
        L = jnp.linalg.cholesky(H + 1e-9 * jnp.abs(X))
        return renorm(L)

    def op_chol_solve(X, H):
        L = jnp.linalg.cholesky(H + 1e-9 * jnp.abs(X))
        y = jax.scipy.linalg.solve_triangular(L, X[..., :1], lower=True)
        p = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans="T")
        return renorm(X + p * 1e-9)

    def op_matvec(X, H):
        v = jnp.einsum("sij,sj->si", H, X[..., 0])
        v = v / (1e-30 + jnp.linalg.norm(v, axis=-1, keepdims=True))
        return X + v[..., None] * 1e-9

    results = {
        f"eigh(D={D})": timed(op_eigh, H, H),
        f"cholesky(D={D})": timed(op_chol, H, H),
        f"chol+2solves(D={D})": timed(op_chol_solve, H, H),
        f"matvec(D={D})": timed(op_matvec, H, H),
    }
    for Dk in (8, 16, 24):
        Hk = jax.device_put(spd(rng, S, Dk))
        results[f"eigh(D={Dk})"] = timed(op_eigh, Hk, Hk)

    print(f"S={S} backend={jax.default_backend()} chain={CHAIN}")
    for k, v in results.items():
        print(f"  {k:24s} {v * 1e3:8.3f} ms/op")


if __name__ == "__main__":
    main()
