"""Constrained <-> unconstrained reparameterization of the 44-dim vp.

Replaces ConstraintTransforms.jl + Transform.jl: one bijector, derivatives
free via JAX (no hand-built TransformDerivatives / dual-number plumbing).

Free layout (41,): 26 box params (bound indices 0..25 in canonical order —
the reference's box-constraint order coincides with the canonical layout,
deterministic_vi/ElboMaximize.jl:63-93) followed by simplex-free params for
is_star (1) and the two k columns (7 + 7).

Box:     bound = lower + (upper - lower) * sigmoid(free / scale)
Simplex: softmax of [free / scale, 0] with a floor:
         bound = (1 - n*lower) * softmax + lower
(ConstraintTransforms.jl:66-126 semantics.)
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

IS_STAR_FLOOR = 0.005
K_FLOOR = 0.01 / 8
N_BOX = 26
N_FREE = 41


class BoxBounds(NamedTuple):
    lower: jnp.ndarray  # (26,)
    upper: jnp.ndarray  # (26,)
    scale: jnp.ndarray  # (26,)


def default_box_bounds(pos, loc_width=1e-4, loc_scale=1.0):
    """Box bounds for one source with position-box centered on `pos` (2,).
    Values match elbo_constraints (ElboMaximize.jl:63-93)."""
    pos = np.asarray(pos, dtype=np.float64)
    lower = np.empty(N_BOX)
    upper = np.empty(N_BOX)
    scale = np.ones(N_BOX)
    lower[0:2] = pos - loc_width
    upper[0:2] = pos + loc_width
    scale[0:2] = loc_scale
    lower[2], upper[2] = 1e-2, 0.99      # gal_frac_dev
    lower[3], upper[3] = 1e-2, 0.99      # gal_axis_ratio
    lower[4], upper[4] = -10.0, 10.0     # gal_angle
    lower[5], upper[5] = 0.10, 70.0      # gal_radius_px
    lower[6:8], upper[6:8] = -1.0, 10.0  # flux_loc
    lower[8:10], upper[8:10] = 1e-4, 0.10   # flux_scale
    lower[10:18], upper[10:18] = -10.0, 10.0  # color_mean
    lower[18:26], upper[18:26] = 1e-4, 1.0    # color_var
    return BoxBounds(jnp.asarray(lower), jnp.asarray(upper), jnp.asarray(scale))


def simplex_to_bound(free, floor):
    """free (n-1,) -> bound (n,): floored softmax of [free, 0].

    The max subtraction includes the implicit 0 logit: with only
    max(free), a uniformly very negative `free` overflows exp(-m) and
    poisons the whole simplex with NaN (same value mathematically).
    """
    n = free.shape[0] + 1
    m = jnp.maximum(jnp.max(free), 0.0)
    e = jnp.exp(free - m)
    last = jnp.exp(-m)
    total = jnp.sum(e) + last
    p = jnp.concatenate([e, last[None]]) / total
    return (1.0 - n * floor) * p + floor


def simplex_to_free(bound, floor):
    n = bound.shape[0]
    u = (bound - floor) / (1.0 - n * floor)
    return jnp.log(u[:-1]) - jnp.log(u[-1])


def to_bound(free, bounds: BoxBounds):
    """free (41,) -> vp (44,)."""
    box = bounds.lower + (bounds.upper - bounds.lower) * \
        jnp.reciprocal(1.0 + jnp.exp(-free[:N_BOX] / bounds.scale))
    is_star = simplex_to_bound(free[26:27], IS_STAR_FLOOR)
    k0 = simplex_to_bound(free[27:34], K_FLOOR)
    k1 = simplex_to_bound(free[34:41], K_FLOOR)
    return jnp.concatenate([box, is_star, k0, k1])


def to_free(vp, bounds: BoxBounds):
    """vp (44,) -> free (41,)."""
    frac = (vp[:N_BOX] - bounds.lower) / (bounds.upper - bounds.lower)
    box = -jnp.log(1.0 / frac - 1.0) * bounds.scale
    is_star = simplex_to_free(vp[26:28], IS_STAR_FLOOR)
    k0 = simplex_to_free(vp[28:36], K_FLOOR)
    k1 = simplex_to_free(vp[36:44], K_FLOOR)
    return jnp.concatenate([box, is_star, k0, k1])


def _margin(vp, eps):
    """Projection margin that survives `lower + eps * width` rounding in
    vp's dtype. 1e-10 is fine in f64 but rounds away in f32, and a
    bound-saturated vp (an OPTIMIZED vp re-fed as a warm start — joint-VI
    iterations, staged compaction — often sits exactly on a bound, e.g.
    is_star at its 0.005 floor) then maps to ±inf free params."""
    if eps is not None:
        return eps
    return 1e-10 if jnp.result_type(vp) == jnp.float64 else 1e-5


def _enforce_simplex(bound, floor, eps):
    n = bound.shape[0]
    bound = jnp.clip(bound, floor + eps, 1.0 - eps)
    total = jnp.sum(bound)
    rescale = (1.0 - n * floor) / (total - n * floor)
    return floor + eps + rescale * (bound - floor)


def enforce(vp, bounds: BoxBounds, eps=None):
    """Project vp strictly inside the constraint set
    (ConstraintTransforms.jl:225-291). eps defaults to a dtype-aware margin
    (see _margin)."""
    eps = _margin(vp, eps)
    width = bounds.upper - bounds.lower
    box = jnp.clip(vp[:N_BOX], bounds.lower + eps * width,
                   bounds.upper - eps * width)
    is_star = _enforce_simplex(vp[26:28], IS_STAR_FLOOR, eps)
    k0 = _enforce_simplex(vp[28:36], K_FLOOR, eps)
    k1 = _enforce_simplex(vp[36:44], K_FLOOR, eps)
    return jnp.concatenate([box, is_star, k0, k1])
