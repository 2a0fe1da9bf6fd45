"""Shared constants and jitted helpers of the parallel schedulers.

Split out of parallel/run.py (which had grown to ~2000 lines) so the fused
device programs (parallel/fused.py), the class packers (parallel/packing.py),
and the host drivers (parallel/run.py) can share them without cycles.
"""

import math

import jax

from ..vi.elbo import elbo, source_moment_grids

# Patch tile sizes sources bucket into. The default ladder doubles, so a
# source just past a bucket boundary wastes up to 4x of its tile on
# masked-out pixels (mask-fill measured 0.236 on the 8-field farm,
# tools/util_decompose.py). CELESTE_TILE_BUCKETS="16,24,32,48,64,96,128"
# A/Bs a finer ladder: better mask fill, but more (class, bucket)
# sub-launches per schedule step and more compiled shapes.
import os as _os

TILE_BUCKETS = tuple(
    int(x) for x in _os.environ.get("CELESTE_TILE_BUCKETS",
                                    "16,32,64,128").split(","))
MAX_PATCH_RADIUS = 25.0

# Basin-acceptance margin for every better-ELBO reduction (dual-init lanes,
# restart keep_better, the fused program's restart accept): a challenger
# basin replaces the incumbent only when it wins by this RELATIVE margin.
# Rationale: two fits of the same source at different launch widths agree
# only to ~launch-width-dependent f64 rounding amplified by ~50 chaotic TR
# steps (measured ~1e-9 relative on near-tied basins); a strict `>` then
# makes the final catalog depend on padding/chunking. Genuine basin gaps are
# orders of magnitude larger (hundreds of nats on ELBOs of ~1e4-1e6), so the
# margin costs no accuracy while making the reduction packing-invariant.
BASIN_MARGIN_REL = 1e-8


def _beats(challenger, incumbent):
    """True where `challenger` ELBO beats `incumbent` by more than the
    relative rounding-noise margin (works on numpy and jax arrays)."""
    return challenger > incumbent + BASIN_MARGIN_REL * abs(incumbent)


def is_production_run():
    """In production, per-source/per-launch failures are logged and skipped;
    in development they raise (ParallelRun.jl:419 CELESTE_PROD semantics)."""
    import os
    return os.environ.get("CELESTE_PROD", "") not in ("", "0", "false")


def _tile_for_radius(radius):
    need = int(2 * math.ceil(radius) + 6)
    for P in TILE_BUCKETS:
        if P >= need:
            return P
    return TILE_BUCKETS[-1]


def _next_pow2(n):
    return 1 << max(0, (n - 1).bit_length())


def pad_floor(n_targets):
    """Pad floor (in lanes) for fit launches, as a function of the box's
    target count. On TPU lanes are width-parallel: a 32-lane floor keeps
    the compile-key set tiny and pads cost ~nothing, capped by the target
    count's pow2 so tiny boxes never launch wider than their population.
    On CPU — the accuracy/parity platform, where a vmapped while_loop
    computes EVERY lane at EVERY iteration serially — each pad lane costs
    a full fit: a GalSim single-source scene spent 110-124 s busy on a
    2-real/30-pad P=128 launch (utilization 2.4%) before this became
    platform-aware, so CPU launches pad only to the lane count's pow2."""
    if jax.default_backend() == "cpu":
        return 1
    return min(32, _next_pow2(max(n_targets, 1)))


@jax.jit
def _render_neighbor_bg(nb_vps, nb_mask, patches):
    """Sum of neighbor E[G] and Var[G] images on each target's patch.

    nb_vps: (W, NB, 44); nb_mask: (W, NB) float; patches: SkyPatch leading W.
    Returns (bg_E_G, bg_var_G) each (W, B, P, P).
    """
    def per_source(nbv, nbm, patch):
        E, V = jax.vmap(lambda vp: source_moment_grids(vp, patch))(nbv)
        w = nbm[:, None, None, None]
        return (E * w).sum(0), (V * w).sum(0)

    return jax.vmap(per_source)(nb_vps, nb_mask, patches)


@jax.jit
def _elbo_values(vps, patches, bg_E, bg_V):
    """Batched forward ELBO at fixed params — one eval per lane, used to
    re-evaluate restart incumbents against the current background."""
    if bg_E is None:
        return jax.vmap(lambda v, p: elbo(v, p))(vps, patches)
    return jax.vmap(lambda v, p, bE, bV: elbo(v, p, bE, bV))(
        vps, patches, bg_E, bg_V)
