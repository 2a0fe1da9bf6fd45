"""Batched symmetric eigensolver: systolic (round-robin) Jacobi as matmuls.

XLA's TPU `eigh` costs ~33 ms in-graph for (512, 41, 41) f32 — over half the
wall time of a batched Newton-TR fit (one eigh per Hessian refresh, profile
in tools/xplane_summary.py output). A cyclic Jacobi sweep is D-1 rounds of
D/2 disjoint 2x2 rotations; with the Brent–Luk round-robin ordering every
round has the SAME adjacent-pair layout and the SAME inter-round
permutation, so one `lax.scan` whose body is two batched (D, D) matmuls
diagonalizes without any scatters or data-dependent indexing — pure MXU
work.

The payoff is warm starting: across Hessian refreshes of one Newton fit the
Hessian changes by one trust-region cycle, so diagonalizing in the PREVIOUS
refresh's eigenbasis leaves a nearly-diagonal matrix — 1-3 sweeps instead of
the 7-8 a cold start needs (or the fixed large cost of eigh). The sweep loop
is tolerance-based, so the cost adapts to how far the basis drifted.

All rotations/accumulations run at Precision.HIGHEST: TPU (and oneDNN CPU)
f32 matmuls default to bf16-precision accumulation, which breaks the
orthogonal accumulation (orthogonality error ~1e-2 after a few sweeps,
measured) — with HIGHEST the eigenvalues match eigh to ~4e-6 relative.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


def _round_robin_perm(n):
    """Static inter-round position permutation for the circle method.

    Positions hold pairs at (2k, 2k+1). Element at layout position j after
    the rotation came from position perm[j]; applying it n-1 times makes
    every unordered pair adjacent exactly once (asserted).
    """
    A = list(range(n))

    def layout(arr):
        pos = [0] * n
        for k in range(n // 2):
            pos[2 * k] = arr[k]
            pos[2 * k + 1] = arr[n - 1 - k]
        return pos

    L0 = layout(A)
    L1 = layout([A[0]] + [A[-1]] + A[1:-1])
    inv0 = {e: i for i, e in enumerate(L0)}
    perm = [inv0[e] for e in L1]

    # verify the schedule covers all pairs
    L = list(L0)
    seen = set()
    for _ in range(n - 1):
        for k in range(n // 2):
            a, b = L[2 * k], L[2 * k + 1]
            seen.add((min(a, b), max(a, b)))
        L = [L[p] for p in perm]
    assert len(seen) == n * (n - 1) // 2, "round-robin schedule incomplete"
    return np.asarray(perm)


def _schedule_constants(n, dtype):
    """(perm matrix (n,n), cos basis (n/2,n,n), sin basis (n/2,n,n))."""
    perm = _round_robin_perm(n)
    P = np.zeros((n, n), dtype)
    for j, src in enumerate(perm):
        P[src, j] = 1.0
    K = n // 2
    BC = np.zeros((K, n, n), dtype)
    BS = np.zeros((K, n, n), dtype)
    for k in range(K):
        BC[k, 2 * k, 2 * k] = 1.0
        BC[k, 2 * k + 1, 2 * k + 1] = 1.0
        BS[k, 2 * k, 2 * k + 1] = 1.0
        BS[k, 2 * k + 1, 2 * k] = -1.0
    return P, BC, BS


def _offdiag_norm(M):
    # explicit diagonal mask: sum(M^2) - sum(diag^2) cancels catastrophically
    # in f32 when the diagonal dominates (it does, near convergence)
    off = M * (1.0 - jnp.eye(M.shape[-1], dtype=M.dtype))
    return jnp.sqrt(jnp.sum(off * off, axis=(-1, -2)))


@partial(jax.jit, static_argnames=("tol", "max_sweeps"))
def jacobi_eigh(H, Q0=None, tol=1e-6, max_sweeps=10):
    """Diagonalize symmetric H (..., D, D), D even, warm-startable.

    Q0: optional previous orthogonal basis (..., D, D) — H is first rotated
    into it, so a basis from a nearby matrix leaves little off-diagonal mass
    and the sweep loop exits after 1-3 sweeps.

    Returns (w (..., D) unsorted eigenvalues, Q (..., D, D) with
    H ~ Q diag(w) Q^T, sweeps). Accuracy ~1e-6 relative (f32).
    """
    D = H.shape[-1]
    assert D % 2 == 0, "pad to even D (pad_to_even)"
    dtype = H.dtype
    Pm, BC, BS = _schedule_constants(D, np.float32 if dtype == jnp.float32
                                     else np.float64)
    Pj = jnp.asarray(Pm, dtype)
    BCj = jnp.asarray(BC, dtype)
    BSj = jnp.asarray(BS, dtype)

    if Q0 is None:
        M = H
        Q = jnp.broadcast_to(jnp.eye(D, dtype=dtype), H.shape)
    else:
        M = jnp.einsum("...ji,...jk,...kl->...il", Q0, H, Q0,
                       precision=HIGHEST)
        Q = Q0

    ref = jnp.sqrt(jnp.sum(H * H, axis=(-1, -2)))

    def one_round(carry, _):
        M, Q = carry
        d = jnp.diagonal(M, axis1=-2, axis2=-1)
        app, aqq = d[..., 0::2], d[..., 1::2]
        apq = jnp.diagonal(M, offset=1, axis1=-2, axis2=-1)[..., 0::2]
        live = jnp.abs(apq) > 1e-30
        tau = (aqq - app) / (2.0 * jnp.where(live, apq, 1.0))
        # sign(0) = 0 would zero a live rotation at tau == 0 (a_pp == a_qq)
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(live, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        R = (jnp.einsum("...k,kuv->...uv", c, BCj, precision=HIGHEST)
             + jnp.einsum("...k,kuv->...uv", s, BSj, precision=HIGHEST))
        A = jnp.einsum("...uv,vw->...uw", R, Pj, precision=HIGHEST)
        M = jnp.einsum("...ji,...jk,...kl->...il", A, M, A,
                       precision=HIGHEST)
        Q = jnp.einsum("...ij,...jk->...ik", Q, A, precision=HIGHEST)
        return (M, Q), None

    def sweep(M, Q):
        (M, Q), _ = jax.lax.scan(one_round, (M, Q), None, length=D - 1)
        return M, Q

    def cond(carry):
        M, Q, i = carry
        return (i < max_sweeps) & jnp.any(_offdiag_norm(M) > tol * ref)

    def body(carry):
        M, Q, i = carry
        M, Q = sweep(M, Q)
        return (M, Q, i + 1)

    M, Q, sweeps = jax.lax.while_loop(cond, body, (M, Q, jnp.asarray(0)))
    return jnp.diagonal(M, axis1=-2, axis2=-1), Q, sweeps


def pad_to_even(H, g=None):
    """Pad (..., D, D) to even D+1 with a decoupled large positive diagonal
    entry (a Gershgorin upper bound, so it never becomes the bottom
    eigenvalue and the trust-region solve ignores it: its g component is 0).
    Returns (H_padded, g_padded or None)."""
    D = H.shape[-1]
    if D % 2 == 0:
        return H, g
    bound = jnp.max(jnp.sum(jnp.abs(H), axis=-1), axis=-1) * 2.0 + 1.0
    Hp = jnp.pad(H, [(0, 0)] * (H.ndim - 2) + [(0, 1), (0, 1)])
    Hp = Hp.at[..., D, D].set(bound)
    if g is None:
        return Hp, None
    gp = jnp.pad(g, [(0, 0)] * (g.ndim - 1) + [(0, 1)])
    return Hp, gp


@partial(jax.jit, static_argnames=("tol", "max_sweeps", "ns_reform"))
def vjacobi_eigh(H, Q0=None, tol=1e-6, max_sweeps=12, ns_reform=True):
    """Systolic Jacobi with VECTOR (reshape) rotations instead of matmuls.

    jacobi_eigh's per-round cost is three batched (D, D) HIGHEST-precision
    matmuls whose 42-wide operands use ~11% of the 128-wide MXU (measured
    ~8 ms/sweep at (512, 41, 41); the round is compute-light, the matmul
    formulation pads it onto the systolic array anyway). Here a round is
    pure VPU work: rows then columns rotated pairwise via (..., K, 2, D)
    reshapes, then the static round-robin permutation applied to both
    axes with a fixed gather — no matmul in the round at all.

    f32 accuracy: 2x2 rotations are individually backward-stable but ~40
    rounds/sweep accumulate ~sqrt(rounds) * eps * ||H|| in Q's
    orthogonality (measured 1e-5 after 10 sweeps, which caps eigenvalue
    accuracy at ~40 eps * ||H||; XLA's eigh reaches ~0.2 eps * ||H||).
    ns_reform restores LAPACK-grade accuracy with MXU work OUTSIDE the
    rounds: after each sweep, one Newton-Schulz step re-orthogonalizes Q
    (Q <- Q(3I - Q'Q)/2) and the working matrix is RE-FORMED from the
    original (M <- Q'H0Q), resetting the accumulation (prototyped worst
    |dw| 2.2e-5 over wide-spectrum 8-decade Hessians at 10 sweeps —
    LAPACK f32 parity; 5e-3 without).

    Returns (w unsorted, Q, sweeps). Warm-startable via Q0.
    """
    D = H.shape[-1]
    assert D % 2 == 0, "pad to even D (pad_to_even)"
    K = D // 2
    dtype = H.dtype
    perm = jnp.asarray(_round_robin_perm(D))
    eye = jnp.eye(D, dtype=dtype)

    if Q0 is None:
        M = H
        Q = jnp.broadcast_to(eye, H.shape)
    else:
        M = jnp.einsum("...ji,...jk,...kl->...il", Q0, H, Q0,
                       precision=HIGHEST)
        Q = Q0

    ref = jnp.sqrt(jnp.sum(H * H, axis=(-1, -2)))
    batch = H.shape[:-2]

    def one_round(carry, _):
        M, Q = carry
        d = jnp.diagonal(M, axis1=-2, axis2=-1)
        app, aqq = d[..., 0::2], d[..., 1::2]
        apq = jnp.diagonal(M, offset=1, axis1=-2, axis2=-1)[..., 0::2]
        live = jnp.abs(apq) > 1e-30
        tau = (aqq - app) / (2.0 * jnp.where(live, apq, 1.0))
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(live, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)       # (..., K)
        s = t * c

        # rows: (..., D, D) -> (..., K, 2, D), rotate the pair axis
        M2 = M.reshape(*batch, K, 2, D)
        cm, sm = c[..., None], s[..., None]
        top = cm * M2[..., 0, :] - sm * M2[..., 1, :]
        bot = sm * M2[..., 0, :] + cm * M2[..., 1, :]
        M = jnp.stack([top, bot], axis=-2).reshape(*batch, D, D)
        # cols: (..., D, D) -> (..., D, K, 2)
        M3 = M.reshape(*batch, D, K, 2)
        cc, sc = c[..., None, :], s[..., None, :]
        left = cc * M3[..., 0] - sc * M3[..., 1]
        right = sc * M3[..., 0] + cc * M3[..., 1]
        M = jnp.stack([left, right], axis=-1).reshape(*batch, D, D)
        # Q accumulates the same column rotations
        Q3 = Q.reshape(*batch, D, K, 2)
        ql = cc * Q3[..., 0] - sc * Q3[..., 1]
        qr = sc * Q3[..., 0] + cc * Q3[..., 1]
        Q = jnp.stack([ql, qr], axis=-1).reshape(*batch, D, D)

        # static inter-round permutation on both axes (cols of Q)
        M = jnp.take(jnp.take(M, perm, axis=-1), perm, axis=-2)
        Q = jnp.take(Q, perm, axis=-1)
        return (M, Q), None

    def sweep(M, Q):
        (M, Q), _ = jax.lax.scan(one_round, (M, Q), None, length=D - 1)
        if ns_reform:
            QtQ = jnp.einsum("...ji,...jk->...ik", Q, Q, precision=HIGHEST)
            Q = jnp.einsum("...ij,...jk->...ik", Q, 1.5 * eye - 0.5 * QtQ,
                           precision=HIGHEST)
            M = jnp.einsum("...ji,...jk,...kl->...il", Q, H, Q,
                           precision=HIGHEST)
        return M, Q

    def cond(carry):
        M, Q, i = carry
        return (i < max_sweeps) & jnp.any(_offdiag_norm(M) > tol * ref)

    def body(carry):
        M, Q, i = carry
        M, Q = sweep(M, Q)
        return (M, Q, i + 1)

    M, Q, sweeps = jax.lax.while_loop(cond, body, (M, Q, jnp.asarray(0)))
    return jnp.diagonal(M, axis1=-2, axis2=-1), Q, sweeps
