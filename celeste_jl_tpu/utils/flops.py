"""Model-FLOP accounting: convert fits/s into achieved FLOP/s and MFU.

The reference's only utilization metric is its pixel-visit counters
(ParallelRun.jl:399-415). Here the per-fit USEFUL work is priced in FLOPs so
throughput numbers can be judged against the chip's peak:

    F_fit ~= f_calls * F_fg  +  refreshes * (F_H + F_eigh + F_tr)

where F_fg is one ELBO value+gradient evaluation, F_H the analytic
likelihood Hessian + KL Hessian + free-space chain rule, F_eigh the (41,41)
eigendecomposition, and F_tr the hess_every trust-region secular solves per
refresh. The per-component costs come from XLA's OWN cost analysis of
single-lane jitted probes (compiled.cost_analysis()["flops"]) — not a hand
op-count — cached per (tile, bands) per process; if the backend does not
report flops the probes fall back to constants calibrated on XLA:CPU at
tile 32 (within a few % across tiles: the per-pixel terms dominate).

"Useful" means the math a perfectly-ragged single-source fit would do:
padding lanes, masked-out pixels, and while_loop over-run for converged
lanes are all EXCLUDED (they are counted separately by telemetry's
padded_visits). So MFU here = science-FLOP/s / chip peak — the honest
headroom number, folding in both kernel inefficiency and padding waste.

Peak FLOP/s is looked up by jax device_kind; the table lists the bf16
MXU peak (the TPU fast path this framework targets — the f32 fit path's
matmuls lower to bf16-accumulated passes by default on TPU). Unknown
devices report mfu = None rather than a made-up denominator.
"""

from functools import lru_cache

import numpy as np

# bf16 (MXU) peak dense FLOP/s per chip, by jax device_kind substring.
# Sources: public TPU spec sheets (per-chip, not per-core).
PEAK_FLOPS_BY_KIND = (
    ("v6e", 918e12),
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5e", 197e12),
    ("v5 lite", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)

# Calibrated fallbacks (XLA:CPU cost analysis, tile 32, 5 bands, f32):
# per-(pixel*band) coefficients of the dominant linear terms plus the
# (41,41) eigh. Used only when the live backend's cost_analysis does not
# report "flops".
_FG_PER_PXB = 1516.0      # ELBO value + gradient (reverse mode)
_H_PER_PXB = 6369.0       # analytic likelihood Hessian blocks + chain rule
_EIGH_FLOPS = 35301.0     # jnp.linalg.eigh on (41, 41)
_TR_STEP_FLOPS = 3.0e4    # eigenbasis secular solve + bookkeeping per step


def _dummy_patch(P, B=5, K=2, dtype=np.float32):
    """Minimal SkyPatch with the right shapes for cost probes."""
    from ..models.patches import SkyPatch

    z = lambda *s: np.zeros(s, dtype)
    psf = np.zeros((B, K, 6), dtype)
    psf[:, :, 0] = 0.5          # weights
    psf[:, :, 3] = 1.0          # var diagonals
    psf[:, :, 5] = 1.0
    jac = np.broadcast_to(np.eye(2, dtype=dtype), (B, 2, 2)).copy()
    return SkyPatch(pixels=z(B, P, P), mask=np.ones((B, P, P), bool),
                    sky=np.full((B, P, P), 0.1, dtype),
                    iota=np.ones((B, P, P), dtype),
                    offset=np.zeros((B, 2), np.int32), wcs_jacobian=jac,
                    world_center=np.full((B, 2), P / 2.0, dtype),
                    pixel_center=np.full((B, 2), P / 2.0, dtype), psf=psf)


def _flops_of(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    f = (c or {}).get("flops")
    return float(f) if f and np.isfinite(f) and f > 0 else None


@lru_cache(maxsize=None)
def fit_flop_components(P, B=5):
    """(F_fg, F_H, F_eigh) model FLOPs per lane per call at tile P, B bands,
    from XLA cost analysis of single-lane probes on the live backend
    (fallback: calibrated constants). Cached per process."""
    try:
        import jax
        import jax.numpy as jnp

        from ..ops import bijectors
        from ..vi import optimize as O
        from ..vi.elbo import elbo

        patch = jax.tree.map(jnp.asarray, _dummy_patch(P, B))
        from ..vi.init import generic_init_source
        vp = jnp.asarray(generic_init_source(np.full(2, P / 2.0)),
                         jnp.float32)
        bounds = O._make_bounds(vp[0:2])
        free0 = bijectors.to_free(bijectors.enforce(vp, bounds), bounds)

        def neg(free):
            return -elbo(bijectors.to_bound(free, bounds), patch)

        F_fg = _flops_of(jax.jit(jax.value_and_grad(neg)), free0)
        F_H = _flops_of(jax.jit(
            lambda fr: O._analytic_lik_hessian(fr, bounds, patch,
                                               None, None)), free0)
        F_eigh = _flops_of(jax.jit(jnp.linalg.eigh),
                           jnp.eye(41, dtype=jnp.float32))
    except Exception:
        F_fg = F_H = F_eigh = None
    n = float(P * P * B)
    return (F_fg if F_fg else _FG_PER_PXB * n,
            F_H if F_H else _H_PER_PXB * n,
            F_eigh if F_eigh else _EIGH_FLOPS)


def fit_flop_components_analytic(P, B=5):
    """(F_fg, F_H, F_eigh) from the calibrated constants only — no probe
    compiles, safe to call at trace time (the fused program's in-graph
    accounting) and in per-launch telemetry hot paths."""
    n = float(P * P * B)
    return (_FG_PER_PXB * n, _H_PER_PXB * n, _EIGH_FLOPS)


def fit_flops(iters, f_calls, P, B=5, hess_every=6, use_probes=False):
    """Model FLOPs of fits with the given per-fit TR step / f-call counts
    (scalars or arrays; returns the summed total). refreshes is derived as
    ceil(iters / hess_every) — the driver refreshes the Hessian once per
    hess_every TR steps (ops/newton.minimize_newton_tr). use_probes=True
    prices components with the live backend's XLA cost analysis (compiles
    three small probes once per (P, B)); default is the calibrated
    constants (within a few % at tile 32)."""
    comp = fit_flop_components if use_probes else fit_flop_components_analytic
    F_fg, F_H, F_eigh = comp(int(P), int(B))
    iters = np.asarray(iters, np.float64)
    f_calls = np.asarray(f_calls, np.float64)
    refreshes = np.ceil(iters / max(hess_every, 1))
    per_fit = (f_calls * F_fg
               + refreshes * (F_H + F_eigh)
               + iters * _TR_STEP_FLOPS)
    return float(per_fit.sum())


def peak_flops(device=None):
    """Peak bf16 FLOP/s of the chip, or None if unknown."""
    try:
        import jax
        kind = (device or jax.devices()[0]).device_kind.lower()
    except Exception:
        return None
    for sub, peak in PEAK_FLOPS_BY_KIND:
        if sub in kind:
            return peak
    return None


def mfu(total_flops, wall_s, device=None):
    """(achieved_flops_per_s, mfu_fraction_or_None)."""
    achieved = total_flops / wall_s if wall_s > 0 else 0.0
    peak = peak_flops(device)
    return achieved, (achieved / peak if peak else None)
