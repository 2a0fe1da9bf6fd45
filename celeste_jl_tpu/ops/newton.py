"""Batched Newton trust-region maximizer, JAX-native.

Replaces Optim.jl's NewtonTrustRegion driver (ElboMaximize.jl:95-108,
228-242). Design constraints for TPU:
  * fixed shapes — the trust-region subproblem is solved nearly-exactly via a
    (D, D) eigendecomposition + fixed-iteration bisection (Moré–Sorensen),
    which XLA batches cleanly under vmap;
  * one lax.while_loop per fit — under vmap this becomes a masked loop that
    exits when *all* lanes converge, the "per-source convergence divergence"
    strategy from SURVEY.md §7;
  * the objective must return (value, gradient, Hessian) at a point; the
    caller supplies it (e.g. jax.value_and_grad + jax.hessian of the ELBO).

Defaults mirror the reference: initial_delta=1.0, delta_hat=1e9, eta=0.1,
rho bounds 0.25/0.75, xtol=1e-7, ftol=1e-6, gtol=1e-8, <=50 iterations.
"""

from functools import partial
from typing import Callable, NamedTuple

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
    bisect_iters: int = 64


class NewtonState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    H: jnp.ndarray
    delta: jnp.ndarray
    iters: jnp.ndarray
    f_calls: jnp.ndarray
    converged: jnp.ndarray


def solve_tr_subproblem(g, H, delta, bisect_iters=64):
    """argmin_p g.p + 0.5 p'Hp  s.t. ||p|| <= delta (nearly exact).

    Returns (p, predicted_reduction) with predicted_reduction >= 0.
    """
    D = g.shape[0]
    w, Q = jnp.linalg.eigh(H)
    gq = Q.T @ g
    lam_min = w[0]
    eps = jnp.asarray(1e-12, g.dtype)

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
                     jnp.linalg.norm(g) / jnp.maximum(delta, eps)
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
    p_boundary_eig = -(gq / (w + lam))

    # Hard case: ||p(lam)|| < delta even at lam -> -lam_min because gq has no
    # component along the bottom eigenvector. Move along it to the boundary.
    bnorm = jnp.linalg.norm(p_boundary_eig)
    tau = jnp.sqrt(jnp.maximum(delta ** 2 - bnorm ** 2, 0.0))
    hard = (bnorm < 0.9 * delta) & (lam_min < eps)
    e0 = jnp.zeros(D, g.dtype).at[0].set(1.0)  # bottom eigvec in eig basis
    p_eig = jnp.where(hard, p_boundary_eig + tau * e0, p_boundary_eig)

    p = jnp.where(interior, Q @ p_newton, Q @ p_eig)
    pred = -(g @ p + 0.5 * p @ (H @ p))
    return p, jnp.maximum(pred, 0.0)


def minimize_newton_tr(fgh: Callable, x0: jnp.ndarray,
                       config: NewtonConfig = NewtonConfig()):
    """Minimize fgh's value with trust-region Newton.

    fgh(x) -> (f, g, H). Returns final NewtonState. vmap over x0 (and any
    closure data of fgh) for batched fits.
    """
    f0, g0, H0 = fgh(x0)
    dtype = x0.dtype
    state0 = NewtonState(
        x=x0, f=f0, g=g0, H=H0,
        delta=jnp.asarray(config.initial_delta, dtype),
        iters=jnp.asarray(0, jnp.int32),
        f_calls=jnp.asarray(1, jnp.int32),
        converged=jnp.asarray(False),
    )

    def cond(st: NewtonState):
        return (~st.converged) & (st.iters < config.max_iters)

    def body(st: NewtonState):
        p, pred = solve_tr_subproblem(st.g, st.H, st.delta,
                                      config.bisect_iters)
        x_new = st.x + p
        f_new, g_new, H_new = fgh(x_new)

        rho = jnp.where(pred > 0.0, (st.f - f_new) / pred, -1.0)
        # Guard NaNs/Infs in the trial point — including its derivatives:
        # accepting a finite-f point with non-finite g/H would wedge every
        # subsequent subproblem.
        bad = (~jnp.isfinite(f_new)) | (~jnp.all(jnp.isfinite(g_new))) \
            | (~jnp.all(jnp.isfinite(H_new)))
        rho = jnp.where(bad, -1.0, rho)
        accept = rho >= config.eta

        pnorm = jnp.linalg.norm(p)
        delta = jnp.where(
            rho < config.rho_lower, st.delta * 0.25,
            jnp.where((rho > config.rho_upper) & (pnorm >= 0.99 * st.delta),
                      jnp.minimum(2.0 * st.delta, config.delta_hat),
                      st.delta))

        x = jnp.where(accept, x_new, st.x)
        f = jnp.where(accept, f_new, st.f)
        g = jnp.where(accept, g_new, st.g)
        H = jnp.where(accept, H_new, st.H)

        x_conv = accept & (jnp.max(jnp.abs(p)) < config.xtol_abs)
        f_conv = accept & (jnp.abs(f_new - st.f)
                           < config.ftol_rel * jnp.abs(st.f))
        g_conv = jnp.max(jnp.abs(g)) < config.gtol_abs
        tiny_tr = delta < 1e-14
        converged = x_conv | f_conv | g_conv | tiny_tr

        return NewtonState(x=x, f=f, g=g, H=H, delta=delta,
                           iters=st.iters + 1, f_calls=st.f_calls + 1,
                           converged=converged)

    return jax.lax.while_loop(cond, body, state0)
