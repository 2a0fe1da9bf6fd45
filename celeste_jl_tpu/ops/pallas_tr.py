"""Batched trust-region subproblem in the eigenbasis as one Pallas kernel.

Per TR step the fit solves, per lane, argmin gq.p + 0.5 p'diag(w)p subject
to ||p|| <= delta (ops/newton._solve_tr_eig): an interior-step check, a
48-iteration bisection on the secular equation, and the hard-case ridge.
Under XLA that bisection is a lax.scan whose 48 trips each cost a
while-loop round trip on (B, 42) operands — the device profile
(benchmark/profile_results.md) shows the TR step loop at ~133 ms per
1024-lane launch, mostly this serial chain: tiny VPU work, big trip
overhead. The whole subproblem state is (4-5) x (42, 128) f32 per lane
block ~= 100 KB — the textbook Pallas case again (ops/pallas_eigh.py):
keep gq/w/bounds VMEM-resident and run all 48 bisection iterations inside
one kernel invocation, so the serial chain costs VPU-op latency instead
of XLA loop-trip latency.

Layout: lanes ride the MINOR axis — blocks are (D, L) with D the (padded,
42) eigenbasis dimension on the sublane axis and L=128 lanes; per-lane
scalars (delta, reductions) are (1, L) rows. All reductions are along the
free sublane axis. The math matches _solve_tr_eig term for term (same
bisection bracket updates, same hard-case tau) so trajectories agree to
f32 roundoff; the f64/CPU parity path never routes here.

`make_tr_eig` wraps the kernel in jax.custom_batching.custom_vmap exactly
like pallas_eigh.make_eigh_tr: the per-lane call inside ops/newton.tr_step
falls back to the host _solve_tr_eig; under fit_sources' vmap the whole
batch routes through one kernel on TPU/f32.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


def _tr_kernel(gq_ref, w_ref, delta_ref, p_ref, pred_ref, *, iters):
    """One (D, L) lane block: interior check, `iters` bisection rounds on
    the secular equation, hard-case ridge, predicted reduction."""
    dtype = gq_ref.dtype
    gq = gq_ref[...]                       # (D, L)
    w = w_ref[...]
    delta = delta_ref[...]                 # (1, L)
    D = gq.shape[0]
    eps = jnp.asarray(1e-12, dtype)

    w_min = jnp.min(w, axis=0, keepdims=True)              # (1, L)
    row = jax.lax.broadcasted_iota(jnp.int32, gq.shape, 0)
    # First index attaining the minimum (mirrors argmin's tie rule).
    idx = jnp.min(jnp.where(w == w_min, row, D), axis=0, keepdims=True)
    e0 = (row == idx).astype(dtype)                        # bottom eigvec

    safe_w = jnp.where(w > eps, w, 1.0)
    p_newton = -(gq / safe_w)
    newton_norm = jnp.sqrt(jnp.sum(p_newton * p_newton, axis=0,
                                   keepdims=True))
    interior = (w_min > eps) & (newton_norm <= delta)

    gnorm = jnp.sqrt(jnp.sum(gq * gq, axis=0, keepdims=True))
    lo = jnp.maximum(0.0, -w_min) + eps
    hi = jnp.maximum(lo * 2.0 + 1.0,
                     gnorm / jnp.maximum(delta, eps)
                     + jnp.maximum(0.0, -w_min) + 1.0)

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        q = gq / (w + mid)
        n = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True))
        too_big = n > delta                 # need larger lam
        lo = jnp.where(too_big, mid, lo)
        hi = jnp.where(too_big, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    lam = 0.5 * (lo + hi)

    p_boundary = -(gq / (w + lam))
    bnorm = jnp.sqrt(jnp.sum(p_boundary * p_boundary, axis=0,
                             keepdims=True))
    tau = jnp.sqrt(jnp.maximum(delta * delta - bnorm * bnorm, 0.0))
    hard = (bnorm < 0.9 * delta) & (w_min < eps)
    p = jnp.where(interior, p_newton,
                  jnp.where(hard, p_boundary + tau * e0, p_boundary))
    pred = -(jnp.sum(gq * p, axis=0, keepdims=True)
             + 0.5 * jnp.sum(p * (w * p), axis=0, keepdims=True))
    p_ref[...] = p
    pred_ref[...] = jnp.maximum(pred, 0.0)


def tr_eig_batched(gq, w, delta, iters, interpret=False):
    """(B, D) gq/w + (B,) delta -> (p (B, D), pred (B,)) via the kernel.

    Pads lanes to a multiple of 128 with harmless values (gq=0, w=1,
    delta=1 -> interior zero step)."""
    from functools import partial

    from jax.experimental.pallas import tpu as pltpu

    B, D = gq.shape
    pad = (-B) % LANES
    if pad:
        gq = jnp.concatenate([gq, jnp.zeros((pad, D), gq.dtype)], 0)
        w = jnp.concatenate([w, jnp.ones((pad, D), w.dtype)], 0)
        delta = jnp.concatenate([delta, jnp.ones((pad,), delta.dtype)], 0)
    Bp = gq.shape[0]
    gqt = jnp.transpose(gq)                 # (D, Bp)
    wt = jnp.transpose(w)
    dt = delta[None, :]                     # (1, Bp)
    grid = (Bp // LANES,)
    spec = pl.BlockSpec((D, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    p, pred = pl.pallas_call(
        partial(_tr_kernel, iters=iters),
        grid=grid,
        in_specs=[spec, spec, sspec],
        out_specs=[spec, sspec],
        out_shape=[jax.ShapeDtypeStruct((D, Bp), gq.dtype),
                   jax.ShapeDtypeStruct((1, Bp), gq.dtype)],
        interpret=interpret,
    )(gqt, wt, dt)
    return jnp.transpose(p)[:B], pred[0, :B]


def make_tr_eig(host_solve, bisect_iters):
    """custom_vmap'd (gq (D,), w (D,), delta ()) -> (p (D,), pred ()).

    host_solve: the per-lane reference implementation
    (ops/newton._solve_tr_eig with secular="bisect"), used unbatched and
    on non-TPU/non-f32 batches; under vmap on TPU/f32 the whole batch
    routes through tr_eig_batched. Passed in (rather than imported) to
    keep this module free of an ops.newton import cycle."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def tr_eig(gq, w, delta):
        return host_solve(gq, w, delta, bisect_iters, "bisect")

    @tr_eig.def_vmap
    def _rule(axis_size, in_batched, gq, w, delta):
        gb, wb, db = in_batched
        if not gb:
            gq = jnp.broadcast_to(gq, (axis_size,) + gq.shape)
        if not wb:
            w = jnp.broadcast_to(w, (axis_size,) + w.shape)
        if not db:
            delta = jnp.broadcast_to(delta, (axis_size,) + delta.shape)
        # Nested vmaps re-enter this rule with extra leading batch dims
        # (gq (..., B, D)); flatten them to one batch axis for the kernel
        # and restore on the way out (ADVICE r4: the bare (B, D) unpack
        # crashed instead of handling it).
        lead = gq.shape[:-1]
        if gq.ndim > 2:
            gq = gq.reshape(-1, gq.shape[-1])
            w = w.reshape(-1, w.shape[-1])
            delta = delta.reshape(-1)
        # Narrow batches keep the host scan: the kernel wins at wide
        # widths (1015.1 vs 969.8 fits/s at B=1024) but its per-step
        # launch overhead loses on the fused field schedule's ~32-lane
        # class steps (see ops/pallas_refresh.py MIN_ROWS note; the same
        # hot-cache field A/B covers both kernels).
        min_b = int(__import__("os").environ.get(
            "CELESTE_TR_KERNEL_MIN_LANES", "256"))
        if (gq.dtype != jnp.float32 or gq.shape[0] < min_b
                or jax.default_backend() != "tpu"):
            p, pred = jax.vmap(
                lambda a, b, d: host_solve(a, b, d, bisect_iters,
                                           "bisect"))(gq, w, delta)
        else:
            p, pred = tr_eig_batched(gq, w, delta, bisect_iters)
        p = p.reshape(lead + p.shape[-1:])
        pred = pred.reshape(lead)
        return (p, pred), (True, True)

    return tr_eig
