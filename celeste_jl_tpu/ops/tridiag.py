"""Batched symmetric eigensolver via tridiagonal reduction (LAPACK-style).

XLA's TPU `eigh` on (512, 41, 41) f32 costs ~33 ms in-graph — over half the
wall time of a batched Newton-TR fit. This is the classic xSYTRD/xSTEBZ/
xSTEIN pipeline rebuilt from TPU-friendly primitives, all fixed-shape:

  1. Householder tridiagonalization — D-2 masked reflections applied as
     rank-2 updates (a scan of matvec + outer products);
  2. eigenvalues by bisection with Sturm counts — ALL D eigenvalues bisected
     simultaneously (the Sturm recurrence is one scan over the diagonal,
     vectorized across the D targets and the batch);
  3. eigenvectors by BLOCK inverse iteration: all D shifted tridiagonal
     systems solved at once (Thomas-algorithm scans, vectorized over
     shifts), with modified Gram-Schmidt INTERLEAVED between passes — the
     orthogonalization inside the iteration is what makes clustered
     eigenvalues work (a rank-5-plus-noise spectrum reconstructs to ~6e-6
     in f32; orthogonalizing only at the end collapses every cluster).

Measured on TPU v5e, (512, 41, 41) f32 batch: 2.1x faster than
jnp.linalg.eigh standalone, eigenvalues to ~1e-6 relative, orthogonality
~1.4e-6. Matmul-bearing steps run at Precision.HIGHEST (TPU f32 matmuls
default to bf16 accumulation, which destroys the orthogonal factors).

Unlike ops/jacobi.py this needs no even-D padding and no warm basis, so it
is a drop-in replacement for eigh in the trust-region refresh
(ops/newton.py tr_solver="tridiag").
"""

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def householder_tridiag(H):
    """(D, D) symmetric -> (d (D,), e (D-1,), Q (D, D)) with
    Q^T H Q = tridiag(d, e). Static-shape masked reflections; vmap to
    batch."""
    D = H.shape[0]
    dtype = H.dtype
    eps = jnp.asarray(1e-30, dtype)
    idx = jnp.arange(D)

    def step(carry, k):
        A, Q = carry
        col = jnp.take(A, k, axis=1)
        mask = (idx > k).astype(dtype)
        x = col * mask
        x0 = jnp.sum(jnp.where(idx == k + 1, x, 0.0))
        nx = jnp.sqrt(jnp.sum(x * x))
        sgn = jnp.where(x0 >= 0, 1.0, -1.0)
        v = x - (-sgn * nx) * (idx == k + 1).astype(dtype)
        vn = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(vn > eps, v / jnp.maximum(vn, eps), 0.0)
        Av = jnp.einsum("ij,j->i", A, v, precision=HIGHEST)
        w = Av - v * jnp.einsum("i,i->", v, Av, precision=HIGHEST)
        A = A - 2.0 * jnp.outer(v, w) - 2.0 * jnp.outer(w, v)
        Q = Q - 2.0 * jnp.outer(
            jnp.einsum("ij,j->i", Q, v, precision=HIGHEST), v)
        return (A, Q), None

    (A, Q), _ = jax.lax.scan(step, (H, jnp.eye(D, dtype=dtype)),
                             jnp.arange(D - 2))
    return jnp.diagonal(A), jnp.diagonal(A, offset=1), Q


def _sturm_count(d, e, x):
    """Eigenvalues of tridiag(d, e) strictly below each x (...,)."""
    dtype = d.dtype
    eps = jnp.asarray(1e-30, dtype)
    e2 = jnp.concatenate([jnp.zeros((1,), dtype), e * e])

    def step(carry, i):
        q, cnt = carry
        safe = jnp.where(jnp.abs(q) > eps, q,
                         jnp.where(q >= 0, eps, -eps))
        q = d[i] - x - e2[i] / safe
        return (q, cnt + (q < 0)), None

    q0 = jnp.full_like(x, 1e30)
    c0 = jnp.zeros(x.shape, jnp.int32)
    (_, cnt), _ = jax.lax.scan(step, (q0, c0), jnp.arange(d.shape[0]))
    return cnt


def eigvals_sturm(d, e, iters=50):
    """All D eigenvalues of tridiag(d, e), ascending, by simultaneous
    bisection (Gershgorin bracket, `iters` halvings)."""
    D = d.shape[0]
    dtype = d.dtype
    r = jnp.concatenate([jnp.abs(e), jnp.zeros((1,), dtype)]) \
        + jnp.concatenate([jnp.zeros((1,), dtype), jnp.abs(e)])
    lo = jnp.full((D,), jnp.min(d - r) - 1.0, dtype)
    hi = jnp.full((D,), jnp.max(d + r) + 1.0, dtype)
    ks = jnp.arange(D, dtype=jnp.int32)

    def bis(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = _sturm_count(d, e, mid) > ks
        return (jnp.where(below, lo, mid), jnp.where(below, mid, hi)), None

    (lo, hi), _ = jax.lax.scan(bis, (lo, hi), None, length=iters)
    return 0.5 * (lo + hi)


def _tridiag_solve_block(d, e, w, B):
    """Solve (T - w_j I) v_j = B[:, j] for all shifts j at once.
    d (D,), e (D-1,), w (D,), B (D, D) -> V (D, D). Thomas algorithm with a
    tiny-pivot guard (the shifts sit on eigenvalues by construction)."""
    D = d.shape[0]
    dtype = d.dtype
    eps = jnp.asarray(1e-20, dtype)
    ep = jnp.concatenate([e, jnp.zeros((1,), dtype)])

    def guard(x):
        return jnp.where(jnp.abs(x) > eps, x, jnp.where(x >= 0, eps, -eps))

    def fwd(carry, i):
        cp, dp = carry
        li = jnp.where(i > 0, e[jnp.maximum(i - 1, 0)], 0.0)
        denom = guard(d[i] - w - li * cp)
        cpi = ep[i] / denom
        dpi = (B[i] - li * dp) / denom
        return (cpi, dpi), (cpi, dpi)

    z = jnp.zeros((D,), dtype)
    _, (cps, dps) = jax.lax.scan(fwd, (z, z), jnp.arange(D))

    def back(vnext, i):
        vi = dps[i] - cps[i] * vnext
        return vi, vi

    _, vs = jax.lax.scan(back, z, jnp.arange(D - 1, -1, -1))
    return vs[::-1]


def _mgs(V):
    """Modified Gram-Schmidt over columns (masked scan, fixed shapes)."""
    D = V.shape[0]
    cols = jnp.arange(D)

    def step(Vc, j):
        v = Vc[:, j]
        mask = (cols < j).astype(V.dtype)
        coeffs = jnp.einsum("ij,i->j", Vc, v, precision=HIGHEST) * mask
        v = v - jnp.einsum("ij,j->i", Vc, coeffs, precision=HIGHEST)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        return Vc.at[:, j].set(v), None

    V, _ = jax.lax.scan(step, V, cols)
    return V


# fixed random block for inverse iteration (any dense generic block works;
# fixed so results are deterministic)
_B0_CACHE = {}


def _rand_block(D, dtype):
    key = (D, jnp.dtype(dtype).name)
    if key not in _B0_CACHE:
        _B0_CACHE[key] = np.random.default_rng(1234).normal(
            size=(D, D)).astype(np.float64)
    return jnp.asarray(_B0_CACHE[key], dtype)


def tridiag_eigh(H, bisect_iters=50, inv_iters=3):
    """Full spectral decomposition of symmetric (D, D) H.

    Returns (w (D,) ascending, Q (D, D)) with H ~ Q diag(w) Q^T. vmap to
    batch. Accuracy ~1e-6 relative in f32 (incl. clustered spectra)."""
    d, e, Qh = householder_tridiag(H)
    w = eigvals_sturm(d, e, iters=bisect_iters)
    dtype = H.dtype
    D = H.shape[0]
    shift = w + (jnp.abs(w) + 1.0) * jnp.asarray(
        1e-6 if dtype == jnp.float32 else 1e-12, dtype)
    V = _rand_block(D, dtype)
    for _ in range(inv_iters):
        V = _tridiag_solve_block(d, e, shift, V)
        V = V / jnp.maximum(jnp.linalg.norm(V, axis=0, keepdims=True),
                            1e-30)
        V = _mgs(V)
    return w, jnp.einsum("ij,jk->ik", Qh, V, precision=HIGHEST)
