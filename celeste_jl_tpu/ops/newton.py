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
    # bisect_iters: iterations on the TR secular equation per step;
    # `secular` picks the iteration: "bisect" = pure bisection on the
    # bracket (1 dot product + a compare per iteration) or "newton" =
    # safeguarded Newton (quadratic convergence, fewer iterations needed).
    # MEASURED on the TPU v5e headline bench (1024 lanes, identical seeds):
    # bisect/48 552.1 fits/s vs newton/16 482.4 vs newton/8 479.2 — the
    # round-2 bisect->newton swap was an UNBENCHED 11% regression
    # (554.7 -> 494.1, BENCH_r01/r02) now reverted. The chain-length
    # argument was wrong on hardware: the secular-Newton body's extra dot
    # products and divisions cost more than 3x a bisection per iteration,
    # and its cost barely falls from 16 to 8 iterations (482 -> 479), so
    # the scan is throughput-bound on body cost, not length. Fit
    # trajectories at bisect/48 are bit-identical to round 1
    # (mean_newton_iters 58.404 on the bench, the r01 value).
    bisect_iters: int = 48
    secular: str = "bisect"
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
    #   "pjacobi"— ops/pallas_eigh.py: systolic Jacobi with the 41 rounds
    #              of each sweep VMEM-resident in a Pallas kernel (rounds
    #              are tiny VPU work; the XLA formulations pay per-round
    #              dispatch/HBM instead), plus per-sweep Newton-Schulz +
    #              re-formation at HIGHEST to reset f32 rotation noise.
    #              MEASURED on the v5e headline bench: 877 fits/s at
    #              jacobi_max_sweeps=4 vs 553 for "eig" (the XLA eigh
    #              custom call was 49% of fit device time), same
    #              trajectory quality (58.1 vs 58.4 mean iters; ELBO
    #              parity mean-zero, near-tie basin swaps only). Falls
    #              back to XLA eigh for f64/CPU (the parity platform).
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
    #              well-conditioned interior-dominated problems;
    #   "chol"   — More-Sorensen via batched Cholesky factorizations
    #              (ms_iters safeguarded-Newton iterations on the secular
    #              equation per TR step). Batched (512, 41, 41) cholesky
    #              measures ~30x cheaper than eigh on TPU
    #              (tools/microbench_tr.py). Near-exact like "eig"
    #              (boundary solutions DO follow negative curvature) except
    #              the exact hard case, where it returns the
    #              interior-limited step without the eigenvector
    #              correction. ms_iters=8 measurably under-resolves lam on
    #              the star/galaxy fits (lands a worse basin, is_star 0.60
    #              vs 0.99 on the single-star recovery test); 10-12 match
    #              "eig" fit quality — hence the 12 default. Measured
    #              SLOWER than "eig" on the headline bench either way:
    #              187 fits/s at hess_every=6 (12 factorizations/step lose
    #              to one eigh amortized over 6 steps) and 242 fits/s at
    #              hess_every=1/ms_iters=6 (exact-Newton halves iterations
    #              to ~31 but pays a fresh analytic Hessian per step) vs
    #              540 for "eig". Kept for problems whose Hessian refresh
    #              is cheap relative to eigh.
    tr_solver: str = "eig"
    # Objective gradient evaluator used by vi/optimize.maximize (threaded
    # here so the per-platform default flip and the A/B env knobs reach
    # every driver the same way as tr_solver):
    #   "ad"       — jax.value_and_grad through the 2D tile render;
    #   "analytic" — closed-form gradient via the degree-<=2 pixel-moment
    #                subset of the analytic-Hessian engine
    #                (vi/optimize._analytic_lik_value_grad): one render
    #                + 12 weighted moment reductions instead of a full
    #                reverse pass. f64-exact vs AD
    #                (tests/test_analytic_grad.py).
    # Measured on the v5e headline bench (BENCH_GRAD=analytic, 1024
    # sources, pjacobi): 668.4 vs 877 fits/s at near-identical
    # trajectories (mean iters 56.9 vs 58.1) — the analytic fg pass's
    # extra moment reductions cost more than XLA's fused reverse pass
    # saves, and the cheap fg eval runs ~6x per Hessian refresh
    # (hess_every=6), so the one-pass fgh refresh cannot recoup it.
    # "ad" therefore stays the default on every platform; "analytic"
    # is kept as the independently-derived gradient cross-check and
    # for problems dominated by refresh cost (hess_every=1).
    grad_mode: str = "ad"
    cg_iters: int = 41
    ms_iters: int = 12
    jacobi_tol: float = 1e-6
    # 4 for "pjacobi" (the measured knee: 3 sweeps degrades the basis
    # enough to add TR iterations and near-tie flips; 5+ buys nothing,
    # tools/quality_pjacobi.py); the warm-started XLA "jacobi" needs more
    jacobi_max_sweeps: int = 12
    # TR subproblem execution for the eig-family solvers:
    #   "xla"    — _solve_tr_eig per lane: the 48-iteration secular
    #              bisection is a lax.scan whose trips each pay an XLA
    #              loop round trip (profiled at ~2.2 ms/TR step on the
    #              1024-lane fit, benchmark/profile_results.md);
    #   "pallas" — ops/pallas_tr.py runs the whole subproblem (interior
    #              check, bisection, hard case) inside one VMEM-resident
    #              kernel per batch. Only takes effect with
    #              secular="bisect"; CPU/f64 batches fall back to the
    #              host path inside the custom_vmap rule either way.
    # Round-4 measurement: a wash (920.2 vs 922.2 fits/s, BIT-identical
    # trajectories) — the scan trips hid behind the refresh evaluator's
    # DMA traffic. Round 5: with refresh_kernel="pallas" that traffic is
    # gone and the TR kernel is a real win (1015.1 vs 969.8 fits/s same
    # session) — parallel/run auto-selects it on TPU (CELESTE_TR_KERNEL
    # overrides); the config default stays "xla" for CPU parity runs.
    tr_kernel: str = "xla"
    # Analytic-Hessian REFRESH evaluator (vi/optimize._analytic_lik_fgh):
    #   "xla"    — per-band _band_lik_terms; XLA materializes the
    #              per-component fields and flattened pixel fields in HBM
    #              between fusions (the profiled ~700 ms copy-start DMA
    #              family per 1024-lane launch, profile_results.md);
    #   "pallas" — ops/pallas_refresh.py: the whole render -> Poisson-bound
    #              -> moment-contraction pixel pass VMEM-resident per
    #              (source, band) row; only the ~(70 + 15C) contracted
    #              outputs reach HBM. f64-exact vs the XLA path up to
    #              summation order (tests/test_pallas_refresh.py).
    # parallel/run auto-selects "pallas" on TPU (CELESTE_REFRESH_KERNEL
    # overrides); CPU/f64 parity runs keep "xla".
    refresh_kernel: str = "xla"


class NewtonState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    delta: jnp.ndarray
    iters: jnp.ndarray       # total TR steps attempted
    f_calls: jnp.ndarray
    hess_calls: jnp.ndarray
    converged: jnp.ndarray


def _solve_tr_eig(gq, w, delta, bisect_iters=48, secular="bisect"):
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

    # Otherwise find lam > max(0, -lam_min) with ||p(lam)|| = delta, by
    # either pure bisection (default; cheapest scan body — see the
    # NewtonConfig.bisect_iters measurement note) or safeguarded Newton on
    # the secular equation 1/delta - 1/||p(lam)|| = 0 (More-Sorensen /
    # Nocedal-Wright Alg. 4.3 in the eigenbasis).
    lo = jnp.maximum(0.0, -lam_min) + eps
    hi = jnp.maximum(lo * 2.0 + 1.0,
                     jnp.linalg.norm(gq) / jnp.maximum(delta, eps)
                     + jnp.maximum(0.0, -lam_min) + 1.0)

    if secular == "bisect":
        # round-1 behavior: pure bisection on the bracket (linear
        # convergence, but each iteration is one dot product and the
        # serialized chain vectorizes identically across lanes)
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
    else:
        def newton_it(carry, _):
            lo, hi, lam = carry
            q = gq / (w + lam)
            n2 = q @ q                       # ||p(lam)||^2
            n = jnp.sqrt(n2)
            too_big = n > delta              # need larger lam
            lo = jnp.where(too_big, lam, lo)
            hi = jnp.where(too_big, hi, lam)
            s3 = q @ (q / (w + lam))         # sum gq^2/(w+lam)^3 > 0
            step = (n / jnp.maximum(delta, eps) - 1.0) * n2 \
                / jnp.maximum(s3, eps)
            nxt = lam + step
            mid = 0.5 * (lo + hi)
            # INCLUSIVE bracket acceptance: once converged, step underflows
            # to 0 and nxt == lam == one bracket edge (the edge was just
            # set to lam above) — a strict test would bounce the converged
            # iterate back to the midpoint and return an unconverged lam.
            good = jnp.isfinite(nxt) & (nxt >= lo) & (nxt <= hi)
            return (lo, hi, jnp.where(good, nxt, mid)), None

        (_, _, lam), _ = jax.lax.scan(newton_it, (lo, hi, 0.5 * (lo + hi)),
                                      None, length=bisect_iters)
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


def solve_tr_subproblem(g, H, delta, bisect_iters=48, secular="bisect"):
    """argmin_p g.p + 0.5 p'Hp  s.t. ||p|| <= delta (nearly exact).

    Returns (p, predicted_reduction) with predicted_reduction >= 0.
    """
    w, Q = jnp.linalg.eigh(H)
    p_eig, pred = _solve_tr_eig(Q.T @ g, w, delta, bisect_iters, secular)
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


def _solve_tr_chol(g, H, delta, ms_iters=8, lam0=None):
    """TR subproblem via More-Sorensen with Cholesky: find lam >= 0 with
    H + lam I PD and ||p(lam)|| = delta (or the interior Newton step), by a
    safeguarded Newton iteration on the secular equation
    1/||p(lam)|| = 1/delta, bisecting on the bracket when a factorization
    fails (lam < -lam_min surfaces as NaNs in L) or Newton leaves it.

    Fixed ms_iters iterations (XLA-friendly); each costs one batched
    cholesky + three triangular solves. lam0: optional warm-start shift
    from the previous TR step against the same (stale) H — with it, 2-3
    iterations typically re-converge lam. Returns
    (p, predicted_reduction, lam_final).
    """
    from jax.scipy.linalg import solve_triangular

    dtype = g.dtype
    D = g.shape[0]
    I = jnp.eye(D, dtype=dtype)
    eps = jnp.asarray(1e-12, dtype)
    delta = jnp.maximum(delta, eps)

    # Gershgorin: chol(H + lam I) is guaranteed to succeed for
    # lam > lam_G >= -lam_min(H); lam* itself is below lam_G + ||g||/delta.
    diag = jnp.diagonal(H)
    off = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)
    lam_G = jnp.maximum(jnp.max(off - diag), 0.0)
    lam_G1 = lam_G * 1.001 + jnp.asarray(1e-6, dtype)
    lam_max = lam_G + jnp.linalg.norm(g) / delta + 1.0

    # Power-iteration underestimate of -lam_min(H) (Rayleigh quotient of
    # lam_G1 I - H, which never exceeds its top eigenvalue): start the lam
    # search at the critical shift instead of 0 when H is indefinite —
    # matvecs are ~free next to a factorization. The start vector mixes g
    # with a fixed deterministic perturbation so the hard case (g nearly
    # orthogonal to the bottom eigenvector) still converges.
    gn = jnp.linalg.norm(g)
    v0 = g / (gn + eps) + 0.5 * jnp.cos(jnp.arange(D, dtype=dtype))
    Bv = lambda v: lam_G1 * v - H @ v

    def _pw(v, _):
        w = Bv(v)
        return w / (jnp.linalg.norm(w) + eps), None

    v, _ = jax.lax.scan(_pw, v0 / (jnp.linalg.norm(v0) + eps), None,
                        length=8)
    lam_lo0 = jnp.maximum(v @ Bv(v) - lam_G1, 0.0)

    def body(carry, _):
        lam, lam_lo, lam_hi, p_best, ok_ever = carry
        L = jnp.linalg.cholesky(H + lam * I)
        ok = jnp.all(jnp.isfinite(L))
        Ls = jnp.where(ok, L, I)

        y = solve_triangular(Ls, g, lower=True)
        p = -solve_triangular(Ls, y, lower=True, trans=1)
        pn = jnp.linalg.norm(p)
        q = solve_triangular(Ls, p, lower=True)
        qn2 = jnp.maximum(q @ q, eps)

        # Newton step on 1/delta - 1/||p(lam)|| (increasing & concave in
        # lam): monotone quadratic from below for the boundary case, drives
        # lam -> 0 for the interior case.
        lam_newton = lam + (pn * pn / qn2) * (pn - delta) / delta

        too_long = ok & (pn > delta)
        lam_lo_n = jnp.where(too_long | (~ok), jnp.maximum(lam_lo, lam),
                             lam_lo)
        lam_hi_n = jnp.where(ok & (pn <= delta), jnp.minimum(lam_hi, lam),
                             lam_hi)
        # Safeguards when Newton leaves the bracket (possible only from
        # above, or right after failures): a failure with no success yet
        # jumps to the guaranteed-factorizable Gershgorin point; otherwise
        # bisect GEOMETRICALLY — lam* is log-scale-distributed and the
        # bracket top starts at lam_max, so arithmetic midpoints waste the
        # iteration budget.
        geo = jnp.sqrt(jnp.maximum(lam_lo_n, 1e-6 * lam_hi_n) * lam_hi_n)
        in_bracket = ok & (lam_newton > lam_lo_n) & (lam_newton < lam_hi_n)
        jump_G = (~ok) & (lam_hi_n > lam_G1)
        lam_next = jnp.where(in_bracket, lam_newton,
                             jnp.where(jump_G, lam_G1, geo))
        # Interior optimum: lam = 0 factorization succeeded with a short
        # step — stay at 0 (lam_hi pins to 0, geo stays 0).
        p_best_n = jnp.where(ok, p, p_best)
        return (lam_next, lam_lo_n, lam_hi_n, p_best_n, ok_ever | ok), None

    lam_start = lam_lo0 * 1.05
    if lam0 is not None:
        # Warm start from the previous step's shift, clipped into the
        # bracket; the safeguards recover if the previous shift is stale.
        lam_start = jnp.clip(jnp.asarray(lam0, dtype), lam_start,
                             lam_max * 0.999)
    (lam_f, _, _, p, ok_ever), _ = jax.lax.scan(
        body, (lam_start, lam_lo0, lam_max, jnp.zeros_like(g),
               jnp.asarray(False)),
        None, length=ms_iters)

    # Clip a final over-long step to the boundary; a never-factorized lane
    # (cannot happen inside the Gershgorin bracket, but guard anyway)
    # returns p = 0 -> pred = 0 -> the driver rejects and shrinks delta.
    pn = jnp.linalg.norm(p)
    p = jnp.where(pn > delta, p * (delta / jnp.maximum(pn, eps)), p)
    p = jnp.where(ok_ever, p, jnp.zeros_like(p))
    pred = -(g @ p + 0.5 * p @ (H @ p))
    return p, jnp.maximum(pred, 0.0), lam_f


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

    tr_eig_fn = None
    if (config.tr_kernel == "pallas" and config.secular == "bisect"
            and config.tr_solver not in ("cg", "chol")):
        from .pallas_tr import make_tr_eig
        tr_eig_fn = make_tr_eig(_solve_tr_eig, config.bisect_iters)

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

    def tr_step(st: NewtonState, curv, lam=None):
        """One TR step with the (possibly stale) Hessian curvature object
        curv — (w, Q) eigendecomposition for the "eig"/"jacobi" solvers
        (Q possibly padded one dim past D), H itself for "cg"/"chol" — and
        the fresh gradient in st. No-op on converged lanes. lam: the
        "chol" solver's warm-started shift, threaded through the steps;
        returns (state, lam)."""
        if config.tr_solver == "cg":
            p, pred = _steihaug_cg(st.g, curv, st.delta, config.cg_iters)
        elif config.tr_solver == "chol":
            p, pred, lam = _solve_tr_chol(st.g, curv, st.delta,
                                          config.ms_iters, lam0=lam)
        else:
            w, Q = curv
            D = st.g.shape[0]
            g = st.g if Q.shape[0] == D else jnp.pad(st.g, (0, Q.shape[0] - D))
            if tr_eig_fn is not None:
                p_eig, pred = tr_eig_fn(Q.T @ g, w, st.delta)
            else:
                p_eig, pred = _solve_tr_eig(Q.T @ g, w, st.delta,
                                            config.bisect_iters,
                                            config.secular)
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
            hess_calls=st.hess_calls, converged=converged), lam

    def steps(st, curv, lam=None):
        lam = jnp.asarray(0.0, dtype) if lam is None else lam
        (st, lam), _ = jax.lax.scan(
            lambda c, _: (tr_step(c[0], curv, c[1]), None), (st, lam),
            None, length=max(config.hess_every, 1))
        return st, lam

    def cond(st: NewtonState):
        return (~st.converged) & (st.hess_calls < config.max_iters)

    if config.tr_solver == "pjacobi":
        from .jacobi import pad_to_even
        from .pallas_eigh import make_eigh_tr

        eigh_tr = make_eigh_tr(tol=config.jacobi_tol,
                               max_sweeps=config.jacobi_max_sweeps)
        Dp = x0.shape[0] + (x0.shape[0] % 2)
        Q0 = jnp.eye(Dp, dtype=dtype)

        def cycle_p(carry):
            """Refresh-then-steps cycle with the Pallas systolic-Jacobi
            eigensolver (ops/pallas_eigh.py), warm-started from the
            previous refresh's basis. Under fit_sources' vmap the
            custom_vmap rule routes the whole batch through one kernel."""
            st, Q = carry
            f, g, H = fgh(st.x)
            Hp, _ = pad_to_even(H)
            w, Q = eigh_tr(Hp, Q)
            st = st._replace(f=f, g=g, hess_calls=st.hess_calls + 1)
            return steps(st, (w, Q))[0], Q

        st, _ = jax.lax.while_loop(lambda c: cond(c[0]), cycle_p,
                                   (state0, Q0))
        return st

    if config.tr_solver in ("jacobi", "vjacobi"):
        from .jacobi import jacobi_eigh, pad_to_even, vjacobi_eigh

        eigh_fn = (vjacobi_eigh if config.tr_solver == "vjacobi"
                   else jacobi_eigh)
        Dp = x0.shape[0] + (x0.shape[0] % 2)
        Q0 = jnp.eye(Dp, dtype=dtype)

        def cycle_j(carry):
            """Same refresh-then-steps cycle, but the eigendecomposition is
            a warm-started Jacobi diagonalization in the previous refresh's
            basis (carried across cycles) instead of a fresh XLA eigh."""
            st, Q = carry
            f, g, H = fgh(st.x)
            Hp, _ = pad_to_even(H)
            w, Q, _ = eigh_fn(Hp, Q, tol=config.jacobi_tol,
                              max_sweeps=config.jacobi_max_sweeps)
            st = st._replace(f=f, g=g, hess_calls=st.hess_calls + 1)
            return steps(st, (w, Q))[0], Q

        st, _ = jax.lax.while_loop(lambda c: cond(c[0]), cycle_j,
                                   (state0, Q0))
        return st

    if config.tr_solver == "tridiag":
        from .tridiag import tridiag_eigh
        decompose = tridiag_eigh
    else:
        decompose = jnp.linalg.eigh

    def cycle(carry):
        """Refresh the exact Hessian at st.x, then hess_every TR steps
        reusing it with fresh gradients. The second carry element is the
        "chol" solver's warm-started shift (a threaded scalar; unused by
        the other solvers)."""
        st, lam = carry
        f, g, H = fgh(st.x)
        curv = H if config.tr_solver in ("cg", "chol") else decompose(H)
        st = st._replace(f=f, g=g, hess_calls=st.hess_calls + 1)
        return steps(st, curv, lam)

    st, _ = jax.lax.while_loop(lambda c: cond(c[0]), cycle,
                               (state0, jnp.asarray(0.0, dtype)))
    return st
