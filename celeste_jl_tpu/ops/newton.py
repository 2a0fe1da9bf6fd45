"""Batched Newton trust-region maximizer, JAX-native.

Replaces Optim.jl's NewtonTrustRegion driver (ElboMaximize.jl:95-108,
228-242). Design constraints for TPU:
  * fixed shapes — the trust-region subproblem is solved nearly-exactly via a
    (D, D) eigendecomposition + fixed-iteration bisection (Moré–Sorensen),
    which XLA batches cleanly under vmap;
  * one lax.while_loop per fit — under vmap this becomes a masked loop that
    exits when *all* lanes converge, the "per-source convergence divergence"
    strategy from SURVEY.md §7;
  * the Hessian is ~90x the cost of the gradient under AD (41 forward
    tangents over the reverse pass), so the loop refreshes it (and its
    eigendecomposition) only every `hess_every` steps; the in-between
    trust-region steps reuse the stale curvature with fresh gradients.
    Lagged-Hessian Newton takes ~2x the steps of exact Newton at ~1/6 the
    per-step cost, and — unlike SR1/BFGS curvature updates, which were
    tried and landed in visibly worse basins on multimodal star/galaxy
    fits — it follows the exact-Newton trajectory closely. Exact-Newton
    behavior at hess_every=1.

Defaults mirror the reference: initial_delta=1.0, delta_hat=1e9, eta=0.1,
rho bounds 0.25/0.75, xtol=1e-7, ftol=1e-6, gtol=1e-8, <=max_iters
Hessian refreshes (the reference's <=50 Newton iterations,
ElboMaximize.jl:99).
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class NewtonConfig(NamedTuple):
    max_iters: int = 50
    initial_delta: float = 1.0
    delta_hat: float = 1e9
    eta: float = 0.1
    rho_lower: float = 0.25
    rho_upper: float = 0.75
    xtol_abs: float = 1e-7
    ftol_rel: float = 1e-6
    gtol_abs: float = 1e-8
    # hess_every=6 is the measured knee: 8+ is ~12% faster on the bench but
    # already flips star/galaxy classifications on multimodal
    # overlapping-source fits (tests/test_infer.py, p_star 0.995 -> 0.005
    # at he=8); 6 tracks exact-Newton trajectories.
    bisect_iters: int = 48
    hess_every: int = 6
    # TR subproblem solver, all nearly-exact Moré-Sorensen in an eigenbasis
    # except "cg":
    #   "eig"    — XLA eigh per Hessian refresh (~33 ms in-graph per
    #              (512, 41, 41) f32 on TPU — over half of fit wall time);
    #   "tridiag"— own LAPACK-style batched eigensolver (ops/tridiag.py):
    #              Householder reduction + simultaneous Sturm bisection +
    #              block inverse iteration. 2.1x faster than eigh standalone
    #              and f64-exact, but measured SLOWER end-to-end in the f32
    #              fit (262 vs 535 fits/s): on the fit's wide-spectrum
    #              Hessians the f32 bisection's ABSOLUTE eigenvalue error
    #              swamps the small eigenvalues the trust region pivots on,
    #              and mean iterations go 58 -> 243. Kept for
    #              moderate-condition problems;
    #   "jacobi" — systolic Jacobi diagonalization warm-started from the
    #              PREVIOUS refresh's eigenbasis (ops/jacobi.py). Measured
    #              SLOWER than "eig" on the headline bench (326 vs 540
    #              fits/s): during a fit the Hessian drifts enough per
    #              trust-region cycle that 4-8 sweeps (~8 ms each) are
    #              needed, not the 1-3 a small perturbation needs. Kept as
    #              an option for problems with slowly-varying curvature;
    #   "cg"     — Steihaug truncated CG (matvecs only). Boundary truncation
    #              lands measurably worse optima on these multimodal fits
    #              (median -1.5 ELBO/source, and it cannot follow negative
    #              curvature out of the wrong star/galaxy basin), kept for
    #              well-conditioned interior-dominated problems.
    tr_solver: str = "eig"
    cg_iters: int = 41
    jacobi_tol: float = 1e-6
    jacobi_max_sweeps: int = 12


class NewtonState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    delta: jnp.ndarray
    iters: jnp.ndarray       # total TR steps attempted
    f_calls: jnp.ndarray
    hess_calls: jnp.ndarray
    converged: jnp.ndarray


def _solve_tr_eig(gq, w, delta, bisect_iters=48):
    """TR subproblem in the eigenbasis: argmin gq.p + 0.5 p'diag(w)p,
    ||p|| <= delta. w need not be sorted (the Jacobi path's is not).
    Returns (p_eig, predicted_reduction >= 0)."""
    D = gq.shape[0]
    bottom = jnp.argmin(w)
    lam_min = w[bottom]
    eps = jnp.asarray(1e-12, gq.dtype)

    def pnorm(lam):
        return jnp.linalg.norm(gq / (w + lam))

    # Interior Newton step if H is PD and the full step fits in the region.
    safe_w = jnp.where(w > eps, w, 1.0)
    p_newton = -(gq / safe_w)
    newton_norm = jnp.linalg.norm(p_newton)
    interior = (lam_min > eps) & (newton_norm <= delta)

    # Otherwise find lam > max(0, -lam_min) with ||p(lam)|| = delta.
    lo = jnp.maximum(0.0, -lam_min) + eps
    hi = jnp.maximum(lo * 2.0 + 1.0,
                     jnp.linalg.norm(gq) / jnp.maximum(delta, eps)
                     + jnp.maximum(0.0, -lam_min) + 1.0)

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        too_big = pnorm(mid) > delta   # need larger lam
        lo = jnp.where(too_big, mid, lo)
        hi = jnp.where(too_big, hi, mid)
        return (lo, hi), None

    (lo_f, hi_f), _ = jax.lax.scan(bisect, (lo, hi), None,
                                   length=bisect_iters)
    lam = 0.5 * (lo_f + hi_f)
    p_boundary = -(gq / (w + lam))

    # Hard case: ||p(lam)|| < delta even at lam -> -lam_min because gq has no
    # component along the bottom eigenvector. Move along it to the boundary.
    bnorm = jnp.linalg.norm(p_boundary)
    tau = jnp.sqrt(jnp.maximum(delta ** 2 - bnorm ** 2, 0.0))
    hard = (bnorm < 0.9 * delta) & (lam_min < eps)
    e0 = jax.nn.one_hot(bottom, D, dtype=gq.dtype)  # bottom eigvec, eig basis
    p = jnp.where(interior, p_newton,
                  jnp.where(hard, p_boundary + tau * e0, p_boundary))
    pred = -(gq @ p + 0.5 * p @ (w * p))
    return p, jnp.maximum(pred, 0.0)


def solve_tr_subproblem(g, H, delta, bisect_iters=48):
    """argmin_p g.p + 0.5 p'Hp  s.t. ||p|| <= delta (nearly exact).

    Returns (p, predicted_reduction) with predicted_reduction >= 0.
    """
    w, Q = jnp.linalg.eigh(H)
    p_eig, pred = _solve_tr_eig(Q.T @ g, w, delta, bisect_iters)
    return Q @ p_eig, pred


def _steihaug_cg(g, H, delta, iters):
    """TR subproblem via Steihaug truncated CG: approx argmin g.p + 0.5 p'Hp,
    ||p|| <= delta, using only H matvecs (no factorization — batched eigh /
    cholesky of (S, D, D) are the slowest ops on TPU by far).

    Exits (masked, fixed iteration count for XLA) on: negative curvature or
    step past the boundary -> move to the boundary along the current
    direction; residual below the superlinear forcing tolerance
    min(0.5, sqrt(||g||)) * ||g||. Returns (p, predicted_reduction >= 0).
    """
    dtype = g.dtype
    eps = jnp.asarray(1e-30, dtype)
    gnorm = jnp.linalg.norm(g)
    # Much tighter forcing than the classic min(0.5, sqrt(||g||)): the D
    # matvecs are nearly free on TPU, and loose CG steps make the outer
    # ftol convergence check fire early on weak progress (worse optima).
    tol = jnp.minimum(1e-2, jnp.sqrt(gnorm)) * gnorm

    p0 = jnp.zeros_like(g)
    done0 = gnorm < eps

    def boundary_tau(p, d):
        """Positive root of ||p + tau d||^2 = delta^2 (d != 0, ||p|| < delta)."""
        a = jnp.maximum(d @ d, eps)
        b = 2.0 * (p @ d)
        c = p @ p - delta ** 2
        disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
        return (-b + disc) / (2.0 * a)

    def step(carry, _):
        p, r, d, done = carry
        Hd = H @ d
        dHd = d @ Hd
        rr = r @ r
        alpha = rr / jnp.where(jnp.abs(dHd) > eps, dHd, 1.0)
        p_try = p + alpha * d

        hit = ((dHd <= 0.0) | (jnp.linalg.norm(p_try) >= delta)) & (~done)
        p_bnd = p + boundary_tau(p, d) * d
        p_new = jnp.where(hit, p_bnd, p_try)

        r_new = r + alpha * Hd
        rr_new = r_new @ r_new
        beta = rr_new / jnp.maximum(rr, eps)
        d_new = -r_new + beta * d

        conv = jnp.sqrt(rr_new) < tol
        p_out = jnp.where(done, p, p_new)
        r_out = jnp.where(done, r, r_new)
        d_out = jnp.where(done, d, d_new)
        return (p_out, r_out, d_out, done | hit | conv), None

    (p, _, _, _), _ = jax.lax.scan(step, (p0, g, -g, done0), None,
                                   length=iters)
    pred = -(g @ p + 0.5 * p @ (H @ p))
    return p, jnp.maximum(pred, 0.0)


def minimize_newton_tr(fgh: Callable, x0: jnp.ndarray,
                       config: NewtonConfig = NewtonConfig(),
                       fg: Optional[Callable] = None,
                       delta0: Optional[jnp.ndarray] = None,
                       converged0: Optional[jnp.ndarray] = None):
    """Minimize fgh's value with (lagged-Hessian) trust-region Newton.

    fgh(x) -> (f, g, H); fg(x) -> (f, g) — a cheaper evaluator used for the
    config.hess_every-1 steps between Hessian refreshes (defaults to
    discarding fgh's H). Returns final NewtonState. vmap over x0 (and any
    closure data of fgh/fg) for batched fits.

    delta0 / converged0: warm-resume state — pass a previous run's final
    trust-region radius and converged flag to continue an interrupted fit
    (the staged-compaction driver, vi/optimize.fit_sources_compacted);
    already-converged lanes then stay frozen instead of re-running cycles.
    """
    if fg is None:
        def fg(x):
            f, g, _ = fgh(x)
            return f, g

    f0, g0 = fg(x0)
    dtype = x0.dtype
    state0 = NewtonState(
        x=x0, f=f0, g=g0,
        delta=(jnp.asarray(config.initial_delta, dtype) if delta0 is None
               else jnp.asarray(delta0, dtype)),
        iters=jnp.asarray(0, jnp.int32),
        f_calls=jnp.asarray(1, jnp.int32),
        hess_calls=jnp.asarray(0, jnp.int32),
        converged=(jnp.asarray(False) if converged0 is None
                   else jnp.asarray(converged0)),
    )

    def tr_step(st: NewtonState, curv):
        """One TR step with the (possibly stale) Hessian curvature object
        curv — (w, Q) eigendecomposition for the "eig"/"jacobi" solvers
        (Q possibly padded one dim past D), H itself for "cg" — and the
        fresh gradient in st. No-op on converged lanes."""
        if config.tr_solver == "cg":
            p, pred = _steihaug_cg(st.g, curv, st.delta, config.cg_iters)
        else:
            w, Q = curv
            D = st.g.shape[0]
            g = st.g if Q.shape[0] == D else jnp.pad(st.g, (0, Q.shape[0] - D))
            p_eig, pred = _solve_tr_eig(Q.T @ g, w, st.delta,
                                        config.bisect_iters)
            p = (Q @ p_eig)[:D]
        x_new = st.x + p
        f_new, g_new = fg(x_new)

        rho = jnp.where(pred > 0.0, (st.f - f_new) / pred, -1.0)
        # Guard NaNs/Infs in the trial point — including its gradient:
        # accepting a finite-f point with non-finite g would wedge every
        # subsequent subproblem.
        bad = (~jnp.isfinite(f_new)) | (~jnp.all(jnp.isfinite(g_new)))
        rho = jnp.where(bad, -1.0, rho)
        accept = (rho >= config.eta) & (~st.converged)

        pnorm = jnp.linalg.norm(p)
        delta = jnp.where(
            rho < config.rho_lower, st.delta * 0.25,
            jnp.where((rho > config.rho_upper) & (pnorm >= 0.99 * st.delta),
                      jnp.minimum(2.0 * st.delta, config.delta_hat),
                      st.delta))
        delta = jnp.where(st.converged, st.delta, delta)

        x = jnp.where(accept, x_new, st.x)
        f = jnp.where(accept, f_new, st.f)
        g = jnp.where(accept, g_new, st.g)

        x_conv = accept & (jnp.max(jnp.abs(p)) < config.xtol_abs)
        f_conv = accept & (jnp.abs(f_new - st.f)
                           < config.ftol_rel * jnp.abs(st.f))
        g_conv = jnp.max(jnp.abs(g)) < config.gtol_abs
        tiny_tr = delta < 1e-14
        converged = st.converged | x_conv | f_conv | g_conv | tiny_tr

        return NewtonState(
            x=x, f=f, g=g, delta=delta,
            iters=st.iters + jnp.where(st.converged, 0, 1),
            f_calls=st.f_calls + jnp.where(st.converged, 0, 1),
            hess_calls=st.hess_calls, converged=converged)

    def steps(st, curv):
        st, _ = jax.lax.scan(lambda s, _: (tr_step(s, curv), None), st,
                             None, length=max(config.hess_every, 1))
        return st

    def cond(st: NewtonState):
        return (~st.converged) & (st.hess_calls < config.max_iters)

    if config.tr_solver == "jacobi":
        from .jacobi import jacobi_eigh, pad_to_even

        Dp = x0.shape[0] + (x0.shape[0] % 2)
        Q0 = jnp.eye(Dp, dtype=dtype)

        def cycle_j(carry):
            """Same refresh-then-steps cycle, but the eigendecomposition is
            a warm-started Jacobi diagonalization in the previous refresh's
            basis (carried across cycles) instead of a fresh XLA eigh."""
            st, Q = carry
            f, g, H = fgh(st.x)
            Hp, _ = pad_to_even(H)
            w, Q, _ = jacobi_eigh(Hp, Q, tol=config.jacobi_tol,
                                  max_sweeps=config.jacobi_max_sweeps)
            st = st._replace(f=f, g=g, hess_calls=st.hess_calls + 1)
            return steps(st, (w, Q)), Q

        st, _ = jax.lax.while_loop(lambda c: cond(c[0]), cycle_j,
                                   (state0, Q0))
        return st

    if config.tr_solver == "tridiag":
        from .tridiag import tridiag_eigh
        decompose = tridiag_eigh
    else:
        decompose = jnp.linalg.eigh

    def cycle(st: NewtonState):
        """Refresh the exact Hessian at st.x, then hess_every TR steps
        reusing it with fresh gradients."""
        f, g, H = fgh(st.x)
        curv = H if config.tr_solver == "cg" else decompose(H)
        st = st._replace(f=f, g=g, hess_calls=st.hess_calls + 1)
        return steps(st, curv)

    return jax.lax.while_loop(cond, cycle, state0)
