"""Top-level inference driver (ParallelRun.jl rebuilt TPU-first).

The reference schedules per-source Newton fits across CPU threads with a
Cyclades conflict-graph partition and a spin-lock work queue
(ParallelRun.jl:135-397). Here the same serial-equivalence guarantee maps to
*waves*: within each Cyclades batch, wave w holds the w-th source of every
connected component — no two sources in a wave conflict, so the whole wave is
one batched `fit_sources` launch (vmap lanes replace threads). Sources are
bucketed by patch tile size so every launch has static shapes; neighbor
sources enter each fit as stop-gradient background brightness rendered from
the freshest variational parameters (the reference's inactive-source path,
elbo_objective.jl:33-41).
"""

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..detection.detect import detect_sources
from ..models.image import CatalogEntry
from ..models.patches import make_patches_batched, stack_patches
from ..models.psf import get_psf_width
from ..ops.newton import NewtonConfig
from ..utils import log as Log
from ..utils import telemetry
from ..utils.config import Config
from ..vi.elbo import elbo, source_moment_grids
from ..vi.init import catalog_init_source, generic_init_source
from ..vi.optimize import (FitResult, fit_sources,
                           fit_sources_compacted, maximize)
from .partition import partition_cyclades_dynamic

TILE_BUCKETS = (16, 32, 64, 128)
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


@dataclass
class OptimizedSource:
    """Result record for one fitted source (ParallelRun.jl:425-430)."""
    init_pos: np.ndarray       # (2,) world coords at initialization
    vs: np.ndarray             # (44,) optimized variational params
    elbo: float
    converged: bool
    is_sky_bad: bool


def choose_patch_radius(ce: CatalogEntry, img, width_scale=1.0,
                        max_radius=MAX_PATCH_RADIUS):
    """Radius (px) capturing ~90% of the source light or reaching 5% of sky
    noise, whichever is larger (imaged_sources.jl:197-223 semantics)."""
    psf_width = get_psf_width(img.psf, width_scale=width_scale)
    obj_width = (0.0 if ce.is_star
                 else width_scale * ce.gal_radius_px / 0.67) + psf_width
    flux = (ce.star_fluxes if ce.is_star else ce.gal_fluxes)[img.band]
    flux = max(float(flux), 1e-6)
    eps = float(img.sky_at(img.H // 2, img.W // 2))
    pdf_90 = math.exp(-0.5 * 1.64 ** 2) / (math.sqrt(2 * math.pi) * obj_width)
    pdf_target = min(pdf_90, eps / (20.0 * flux))
    rhs = math.log(pdf_target) + 0.5 * math.log(2 * math.pi) \
        + math.log(obj_width)
    radius_req = math.sqrt(max(-2.0 * obj_width ** 2 * rhs, 0.0))
    return min(radius_req, max_radius)


def patch_radii(catalog, images, config: Config):
    """Per-source radius: max over images, floored at config.min_radius_pix."""
    return np.array([
        max(config.min_radius_pix,
            max(choose_patch_radius(ce, img) for img in images))
        for ce in catalog])


def find_neighbors(catalog, radii, images):
    """neighbor_map: source index -> indices whose patch boxes overlap in any
    image (imaged_sources.jl:232-244).

    Candidate pairs come from a Chebyshev-metric KDTree ball query at the
    maximal radius sum (O(S log S + pairs)), then each candidate is checked
    with its own per-pair radius sum — replaces round 1's O(S^2 * N) Python
    double loop, which alone cost seconds per 512-source field."""
    from scipy.spatial import cKDTree

    S = len(catalog)
    radii = np.asarray(radii, dtype=np.float64)
    nb = {s: [] for s in range(S)}
    if S < 2:
        return nb
    pairs = set()
    r_max2 = 2.0 * radii.max()
    for img in images:
        centers = np.stack([np.asarray(img.world_to_pix(ce.pos), np.float64)
                            for ce in catalog])  # (S, 2)
        tree = cKDTree(centers)
        for i, j in tree.query_pairs(r=r_max2, p=np.inf):
            if (i, j) in pairs:
                continue
            if np.all(np.abs(centers[i] - centers[j]) <= radii[i] + radii[j]):
                pairs.add((i, j))
    for i, j in pairs:
        nb[i].append(j)
        nb[j].append(i)
    for s in nb:
        nb[s].sort()
    return nb


def detection_active_boxes(catalog, det_boxes, images, dilate=0.2,
                           min_half=5.0):
    """Per-source per-image active boxes from the detection bounding boxes:
    dilate each box 20% and enclose a ±5 px minimum box around the source
    center (detection.jl:152-167 dilate_box + box_around_point +
    enclose_boxes). Returns ((S, B, 4) 1-based inclusive bounds,
    (S,) required active radius = max distance from center to a box edge).

    Images with no detection for a source get the minimum box — the
    reference's no-detection fallback (detection.jl:163-167)."""
    S, B = len(catalog), len(images)
    out = np.zeros((S, B, 4))
    req = np.zeros(S)
    centers = np.stack([
        np.asarray(img.world_to_pix(
            np.stack([np.asarray(ce.pos, np.float64) for ce in catalog])))
        for img in images], axis=1)      # (S, B, 2)
    for i in range(S):
        for j in range(B):
            ctr = centers[i, j]
            xlo, xhi = ctr[0] - min_half, ctr[0] + min_half
            ylo, yhi = ctr[1] - min_half, ctr[1] + min_half
            bx = det_boxes[i].get(j) if det_boxes is not None else None
            if bx is not None:
                xmin, xmax, ymin, ymax = bx
                dx = round(dilate * (xmax - xmin + 1) / 2.0)
                dy = round(dilate * (ymax - ymin + 1) / 2.0)
                xlo, xhi = min(xlo, xmin - dx), max(xhi, xmax + dx)
                ylo, yhi = min(ylo, ymin - dy), max(yhi, ymax + dy)
            out[i, j] = (xlo, xhi, ylo, yhi)
            req[i] = max(req[i], xhi - ctr[0], ctr[0] - xlo,
                         yhi - ctr[1], ctr[1] - ylo)
    return out, req


def _tile_for_radius(radius):
    need = int(2 * math.ceil(radius) + 6)
    for P in TILE_BUCKETS:
        if P >= need:
            return P
    return TILE_BUCKETS[-1]


def _next_pow2(n):
    return 1 << max(0, (n - 1).bit_length())


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


class InferenceState:
    """Host-side state for one sky box: catalog, per-source patches (bucketed
    by tile size), variational params, neighbor map."""

    def __init__(self, catalog, images, config: Config,
                 target_sources=None, max_neighbors=8, active_boxes=None):
        self.catalog = catalog
        self.images = images
        self.config = config
        S = len(catalog)
        self.targets = (list(range(S)) if target_sources is None
                        else list(target_sources))
        # active_boxes: detection-footprint masks — either the
        # ((S, B, 4) boxes, (S,) required radius) pair returned by
        # detection_active_boxes, or just the boxes (radius then falls back
        # to half the box extent). None = flux-based radius boxes.
        if active_boxes is not None:
            if isinstance(active_boxes, tuple):
                self.active_boxes, req = active_boxes
            else:
                self.active_boxes = np.asarray(active_boxes, float)
                req = np.maximum(
                    (self.active_boxes[:, :, 1]
                     - self.active_boxes[:, :, 0]) / 2.0,
                    (self.active_boxes[:, :, 3]
                     - self.active_boxes[:, :, 2]) / 2.0).max(axis=1)
            # tile/conflict radius must cover the active box
            self.radii = np.maximum(np.asarray(req, float),
                                    config.min_radius_pix)
        else:
            self.active_boxes = None
            self.radii = patch_radii(catalog, images, config)
        self.neighbor_map = find_neighbors(catalog, self.radii, images)
        self.max_neighbors = max_neighbors

        self.tile = np.array([_tile_for_radius(r) for r in self.radii])
        # patches are built lazily, only for sources that actually get
        # fitted (a sub-box target set can be much smaller than the
        # detected catalog); _stacked caches the device-stacked group
        # tensors across sweeps (they are immutable — re-stacking and
        # re-uploading tens of MB per launch per sweep is pure waste).
        self._patches = {}
        self._pixel_counts = {}
        self._stacked = {}
        # per-source local PSFs from the spatially-varying psfmap
        # (model/imaged_sources.jl:97-107); lazily batch-fitted on first
        # patch build, None when no image carries a psfmap.
        self._patch_psfs = None
        self._has_psfmap = any(img.meta and img.meta.get("psfmap") is not None
                               for img in images)

        # init_sources semantics (DeterministicVI.jl:94-103): catalog init
        # everywhere, generic re-init for optimization targets.
        self.vps = np.stack([catalog_init_source(ce) for ce in catalog])
        for s in self.targets:
            self.vps[s] = generic_init_source(catalog[s].pos)

        # fixed-shape neighbor tables: keep the up-to-max_neighbors nearest
        self.nb_idx = np.zeros((S, max_neighbors), dtype=np.int64)
        self.nb_mask = np.zeros((S, max_neighbors))
        for s in range(S):
            nbs = self.neighbor_map[s]
            if len(nbs) > max_neighbors:
                d = [np.linalg.norm(np.asarray(catalog[s].pos)
                                    - np.asarray(catalog[n].pos))
                     for n in nbs]
                nbs = [nbs[k] for k in np.argsort(d)[:max_neighbors]]
            for k, n in enumerate(nbs):
                self.nb_idx[s, k] = n
                self.nb_mask[s, k] = 1.0

        self.elbos = np.full(S, -np.inf)
        self.converged = np.zeros(S, dtype=bool)
        self.iters = np.zeros(S, dtype=np.int64)

    def patch_psf(self, s):
        """(B, K, 6) local PSF for source s, or None when no image has a
        psfmap. All targets' PSFs are batch-fitted on first use — one
        vmapped Newton launch per band (models/psf_fit.fit_patch_psfs)
        instead of the reference's per-patch loop."""
        if not self._has_psfmap:
            return None
        if self._patch_psfs is None:
            from ..models.psf_fit import fit_patch_psfs
            positions = [self.catalog[t].pos for t in self.targets]
            table = fit_patch_psfs(self.images, positions)
            self._patch_psfs = {t: table[i]
                                for i, t in enumerate(self.targets)}
        return self._patch_psfs.get(s)

    def build_patches(self, sources, tile=None):
        """Batch-build any missing patches for `sources`: one vectorized
        gather per (tile, band) via make_patches_batched instead of a
        per-source Python loop (round 1's ~30 ms/source staging cost —
        the field-scale host bottleneck, benchmark/field_results.md)."""
        groups = {}
        for s in dict.fromkeys(sources):
            t = int(self.tile[s]) if tile is None else int(tile)
            if (s, t) not in self._patches:
                groups.setdefault(t, []).append(s)
        for t, ss in groups.items():
            psfs = (np.stack([self.patch_psf(s) for s in ss])
                    if self._has_psfmap else None)
            boxes = (self.active_boxes[np.asarray(ss)]
                     if self.active_boxes is not None else None)
            plist = make_patches_batched(
                self.images, [self.catalog[s].pos for s in ss],
                self.radii[np.asarray(ss)], t, psfs=psfs,
                active_boxes=boxes)
            for s, p in zip(ss, plist):
                self._patches[(s, t)] = p
                self._pixel_counts[(s, t)] = int(p.mask.sum())

    def patch(self, s, tile=None):
        """Per-source SkyPatch, built on first use and cached. `tile`
        overrides the source's bucket tile size (the fused joint schedule
        stages every class at one shared tile)."""
        tile = int(self.tile[s]) if tile is None else int(tile)
        key = (s, tile)
        if key not in self._patches:
            self.build_patches([s], tile=tile)
        return self._patches[key]

    def stacked_patches(self, idx_p):
        """Device-stacked SkyPatch for a padded group, cached across
        sweeps (host telemetry pixel counts ride along so no device mask
        ever needs transferring back)."""
        key = tuple(idx_p)
        if key not in self._stacked:
            self.build_patches(idx_p)
            patches = stack_patches([self.patch(s) for s in idx_p])
            counts = np.array([self._pixel_counts[(s, int(self.tile[s]))]
                               for s in idx_p])
            self._stacked[key] = (patches, counts)
        return self._stacked[key]

    # -- mid-box checkpointing (finer than the reference's box-level
    #    resume, main.jl:50-56): the mutable fit state round-trips through
    #    one npz; catalog/patches are rebuilt deterministically.

    def save(self, path, cursor=0):
        import os
        tmp = f"{path}.tmp.npz"  # np.savez appends .npz unless present
        np.savez(tmp, vps=self.vps, elbos=self.elbos,
                 converged=self.converged, iters=self.iters,
                 cursor=np.int64(cursor))
        os.replace(tmp, path)

    def restore(self, path):
        """Load fit state; returns the stored cursor (resume position)."""
        d = np.load(path)
        assert d["vps"].shape == self.vps.shape, "catalog mismatch"
        self.vps = d["vps"]
        self.elbos = d["elbos"]
        self.converged = d["converged"]
        self.iters = d["iters"]
        return int(d["cursor"])

    def dispatch_group(self, idx, newton_config: NewtonConfig, use_bg=True,
                       bg_vps=None, fresh_init=False, keep_better=False,
                       dual_init=False):
        """Dispatch one batched launch over sources `idx` (same tile size),
        padded to a power of two, WITHOUT waiting for the device. Returns a
        pending record for finish_group, or None. Neighbor background is
        rendered from `bg_vps` (default: the live, freshest self.vps —
        snapshotted at dispatch time by the device upload).

        fresh_init: fit from generic_init_source instead of the warm vps —
        the restart pass against stale-background basin lock-in (see
        one_node_joint_infer).
        keep_better: only accept lanes whose new ELBO beats the incumbent's.
        The incumbent's ELBO is RE-EVALUATED against the launch's own
        neighbor background inside the same launch (one forward eval per
        lane), so the comparison is exact even when neighbors moved since
        the stored ELBO was computed.
        dual_init: each source rides TWO lanes of the same launch — lane i
        from the warm vps, lane n+i from generic_init_source — and
        finish_group keeps the better-ELBO basin per source. The isolated
        targets' replacement for the sweep schedule's restart pass: both
        lanes see the same static background so the comparison is exact,
        and two lanes cost strictly less than the sweeps + restart passes
        (>= 4 warm-lane fits) these sources would otherwise ride.
        """
        n = len(idx)
        if n == 0:
            return None
        # pad to a power of two, floored (for fields of 32+ targets) at 32:
        # launch shapes are compile keys, and the small late color classes
        # otherwise mint a fresh program per distinct tiny size — padding
        # them up to one shared shape costs cheap idle lanes and makes a
        # farm worker's program cache saturate after the first box or two.
        floor = min(32, _next_pow2(max(len(self.targets), 1)))
        n_lanes = 2 * n if dual_init else n
        pad = max(_next_pow2(n_lanes), floor)
        idx_p = list(idx) * (2 if dual_init else 1) \
            + [idx[0]] * (pad - n_lanes)
        t0 = telemetry.now()
        patches, pixel_counts = self.stacked_patches(idx_p)
        if fresh_init:
            vp0 = jnp.asarray(np.stack(
                [generic_init_source(self.catalog[s].pos) for s in idx_p]))
        elif dual_init:
            warm = self.vps[idx_p]  # fancy indexing: a copy, safe to edit
            warm[n:n_lanes] = np.stack(
                [generic_init_source(self.catalog[s].pos) for s in idx])
            vp0 = jnp.asarray(warm)
        else:
            vp0 = jnp.asarray(self.vps[idx_p])
        # Large waves get the staged-compaction driver (per-lane exact, see
        # vi/optimize.fit_sources_compacted) — the all-lane-converged tail
        # costs most when the batch is wide. Small waves stay single-launch
        # (the extra stage-boundary sync outweighs the tail).
        fit = fit_sources if pad < 256 else partial(
            fit_sources_compacted, stage1_refreshes=10)
        inc = None
        try:
            if use_bg:
                src = self.vps if bg_vps is None else bg_vps
                nb_vps = jnp.asarray(src[self.nb_idx[idx_p]])
                nb_mask = jnp.asarray(self.nb_mask[idx_p])
                bg_E, bg_V = _render_neighbor_bg(nb_vps, nb_mask, patches)
                res = fit(vp0, patches, bg_E, bg_V, config=newton_config)
                if keep_better:
                    # incumbent ELBOs against the same background -> the
                    # keep_better comparison in finish_group is exact
                    inc = _elbo_values(jnp.asarray(self.vps[idx_p]),
                                       patches, bg_E, bg_V)
            else:
                res = fit(vp0, patches, config=newton_config)
                if keep_better:
                    inc = _elbo_values(jnp.asarray(self.vps[idx_p]),
                                       patches, None, None)
        except Exception as exc:
            # Production semantics: log the failed launch and keep the
            # sources at their previous state (ParallelRun.jl:390-396,
            # :589-595 catch-log-continue; dev mode rethrows).
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            return None
        return dict(idx=idx, n=n, n_lanes=n_lanes, pad=pad, res=res, t0=t0,
                    inc=inc, pixel_counts=pixel_counts,
                    keep_better=keep_better,
                    pixels_per_lane_total=int(np.prod(patches.mask.shape[1:])),
                    tile=int(patches.pixels.shape[-1]),
                    bands=int(patches.pixels.shape[-3]),
                    hess_every=newton_config.hess_every,
                    label=f"n={n} pad={pad} P{patches.pixels.shape[-1]}")

    def finish_group(self, pending):
        """Block on a dispatched launch and apply its results to the host
        state. Separate from dispatch_group so that the conflict-free groups
        of one color class can all be in flight at once — device compute,
        host prep, and device->host transfers overlap instead of paying one
        full round trip per tile bucket (material over a tunneled TPU)."""
        if pending is None:
            return
        idx, n, res = pending["idx"], pending["n"], pending["res"]
        nl = pending.get("n_lanes", n)
        try:
            vp = np.asarray(res.vp)[:nl]
            elbo = np.asarray(res.elbo)[:nl]
            conv = np.asarray(res.converged)[:nl]
            iters = np.asarray(res.iters)[:nl]
            f_calls = np.asarray(res.f_calls)
        except Exception as exc:
            # Runtime failures of an async launch surface at the transfer.
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            return
        telemetry.record_launch_wall(pending["t0"], pending["label"])
        if nl != n:
            # dual_init reduction: lane i (warm) vs lane n+i (generic init)
            # of the same source — keep the better basin (by the rounding
            # margin, see _beats). Same objective, same static background.
            fresh = _beats(elbo[n:nl], elbo[:n])
            vp = np.where(fresh[:, None], vp[n:nl], vp[:n])
            elbo = np.where(fresh, elbo[n:nl], elbo[:n])
            conv = np.where(fresh, conv[n:nl], conv[:n])
            iters = iters[:n] + iters[n:nl]
        idxa = np.asarray(idx)
        if pending["keep_better"]:
            # Exact acceptance: compare against the incumbent's ELBO
            # re-evaluated under this launch's own neighbor background
            # (dispatch_group), not the possibly-stale stored value; the
            # stored ELBO of rejected lanes is refreshed to the re-eval.
            ref = np.asarray(pending["inc"])[:n]
            take = _beats(elbo, ref)
            self.elbos[idxa[~take]] = ref[~take]
            idxa = idxa[take]
            vp, elbo, conv = vp[take], elbo[take], conv[take]
        self.vps[idxa] = vp
        self.elbos[idxa] = elbo
        self.converged[idxa] = conv
        self.iters[np.asarray(idx)] += iters
        telemetry.record_fit_launch(
            nl, pending["pad"] - nl,
            pixels_per_lane_real=pending["pixel_counts"][:nl],
            pixels_per_lane_total=pending["pixels_per_lane_total"],
            f_calls=f_calls, tile=pending["tile"], bands=pending["bands"],
            hess_every=pending["hess_every"])

    def fit_group(self, idx, newton_config: NewtonConfig, use_bg=True,
                  bg_vps=None, fresh_init=False, keep_better=False):
        """Dispatch one group and wait for it (see dispatch_group)."""
        self.finish_group(self.dispatch_group(
            idx, newton_config, use_bg=use_bg, bg_vps=bg_vps,
            fresh_init=fresh_init, keep_better=keep_better))


@partial(jax.jit, static_argnames=("n_sweeps", "n_restart", "config", "mesh"))
def _fused_joint_program(vps, elbos, conv, iters, buckets, c_real,
                                  n_sweeps, n_restart, config: NewtonConfig,
                                  mesh=None):
    """The ENTIRE joint-VI schedule as one XLA program, with per-tile-bucket lane grids.

    One shared tile size makes every lane pay the LARGEST source's pixel
    cost: one 64px source among a thousand 16/32px sources quadruples (or
    16x-es) the whole schedule's per-lane work — measured 56 fits/s at 6%
    utilization on the 8-field benchmark. Here each class-step is split by
    tile bucket, mirroring the host-driven path's per-(class, bucket)
    launches exactly: all sources of a class are mutually conflict-free,
    so the split preserves the serial order (sweep, class) bit-for-bit.

    `buckets` is a tuple (static; unrolled in the loop body) of per-bucket
    dicts: patches (T_t, B, P_t, P_t) leaves, lane_src/lane_pat/lane_valid
    (C, W_t), nb_idx/nb_mask (C, W_t, NB), fresh_vp0 (C, W_t, 44),
    pix_counts (C, W_t), has (C,) bool — whether class c has any real lane
    in this bucket. Empty (class, bucket) groups skip their sub-fit via
    lax.cond (a real runtime branch, not masking), so classes that don't
    span every bucket cost nothing extra."""
    n_steps = c_real * (n_sweeps + n_restart)
    f32 = jnp.zeros((), jnp.promote_types(buckets[0]["pix_counts"].dtype,
                                          jnp.float32))

    def bucket_step(bk, c, is_restart, carry):
        vps, elbos, conv, iters, rv, tv, ri, ss, fl = carry
        lane_total = float(np.prod(bk["patches"].mask.shape[1:]))
        # model-FLOP pricing constants for this bucket's tile (host-static;
        # the analytic variant so tracing never compiles probes)
        from ..utils.flops import _TR_STEP_FLOPS, fit_flop_components_analytic
        P_t = int(bk["patches"].mask.shape[-1])
        B_t = int(bk["patches"].mask.shape[-3])
        F_fg, F_H, F_eigh = fit_flop_components_analytic(P_t, B_t)
        take = lambda t: jax.lax.dynamic_index_in_dim(t, c, keepdims=False)
        src = take(bk["lane_src"])
        pc = jax.tree.map(lambda t: t[take(bk["lane_pat"])], bk["patches"])
        vm = take(bk["lane_valid"])
        nbi, nbm = take(bk["nb_idx"]), take(bk["nb_mask"])
        fv0, cnt = take(bk["fresh_vp0"]), take(bk["pix_counts"])

        vp0 = jnp.where(is_restart, fv0, vps[src])
        if mesh is None:
            bg_E, bg_V = _render_neighbor_bg(vps[nbi], nbm, pc)
            res = jax.vmap(lambda v, p, bE, bV: maximize(
                v, p, bE, bV, config=config))(vp0, pc, bg_E, bg_V)
            inc = jax.vmap(lambda v, p, bE, bV: elbo(v, p, bE, bV))(
                vps[src], pc, bg_E, bg_V)
        else:
            from jax.sharding import PartitionSpec as PS

            from .mesh import SRC_AXIS

            lane = PS(SRC_AXIS)

            def _shard_fit(vps_r, nbi_l, nbm_l, pc_l, vp0_l, vinc_l):
                bg_E, bg_V = _render_neighbor_bg(vps_r[nbi_l], nbm_l, pc_l)
                res_l = jax.vmap(
                    lambda v, p, bE, bV: maximize(v, p, bE, bV,
                                                  config=config))(
                    vp0_l, pc_l, bg_E, bg_V)
                inc_l = jax.vmap(lambda v, p, bE, bV: elbo(v, p, bE, bV))(
                    vinc_l, pc_l, bg_E, bg_V)
                return res_l, inc_l

            res, inc = jax.shard_map(
                _shard_fit, mesh=mesh,
                in_specs=(PS(), lane, lane,
                          jax.tree.map(lambda _: lane, pc), lane, lane),
                out_specs=(FitResult(vp=lane, elbo=lane, iters=lane,
                                     f_calls=lane, converged=lane,
                                     delta=lane, free=lane), lane),
                check_vma=False)(vps, nbi, nbm, pc, vp0, vps[src])

        ref = jnp.where(is_restart, inc, elbos[src])
        accept = jnp.logical_not(is_restart) | _beats(res.elbo, ref)
        pick = lambda new, old: jnp.where(
            accept[:, None] if new.ndim == 2 else accept, new, old)
        vps = vps.at[src].set(pick(res.vp, vps[src]))
        elbos = elbos.at[src].set(pick(res.elbo, ref))
        conv = conv.at[src].set(pick(res.converged, conv[src]))
        real = vm > 0
        iters = iters.at[src].add(jnp.where(real, res.iters, 0))
        fc = res.f_calls.astype(cnt.dtype)
        rv = rv + jnp.sum(jnp.where(real, cnt * fc, 0.0))
        tv = tv + lane_total * jnp.sum(fc)
        ri = ri + jnp.sum(jnp.where(real, res.iters, 0)).astype(rv.dtype)
        # serialized depth: the step's while_loop runs every lane until the
        # SLOWEST lane converges — max-lane iters is what the device pays
        ss = ss + jnp.max(res.iters).astype(rv.dtype)
        # useful model FLOPs of the real lanes (utils/flops.py fit model)
        refreshes = jnp.ceil(res.iters / max(config.hess_every, 1))
        lane_fl = (fc * F_fg + refreshes.astype(fc.dtype) * (F_H + F_eigh)
                   + res.iters.astype(fc.dtype) * _TR_STEP_FLOPS)
        fl = fl + jnp.sum(jnp.where(real, lane_fl, 0.0))
        return (vps, elbos, conv, iters, rv, tv, ri, ss, fl)

    def body(step, carry):
        c = step % c_real
        is_restart = step >= c_real * n_sweeps
        for bk in buckets:  # static unroll: one sub-fit per tile size
            carry = jax.lax.cond(
                jax.lax.dynamic_index_in_dim(bk["has"], c, keepdims=False),
                lambda cr, bk=bk: bucket_step(bk, c, is_restart, cr),
                lambda cr: cr, carry)
        return carry

    return jax.lax.fori_loop(
        0, n_steps, body,
        (vps, elbos, conv, iters, f32, f32, f32, f32, f32))


@partial(jax.jit, static_argnames=("config", "mesh", "fresh", "resolve"))
def _fused_wide_pass(vps, elbos, conv, iters, wide, config: NewtonConfig,
                     mesh=None, fresh=True, resolve=True):
    """One FULL-BUDGET pass over ALL constrained sources at once — a fresh
    generic-init basin PROBE (fresh=True) or a warm refit (fresh=False) —
    as ONE wide launch per tile bucket against a background FROZEN at
    entry, keep-better acceptance per lane.

    Why wide instead of per-class Gauss-Seidel steps: a full-budget
    class-serial fresh-restart pass is latency-bound on serial depth
    (C x buckets x ~50-iteration sub-fits at W 8-64) vs 2-3 s for the
    SAME number of full-budget fits in one 512-lane launch. Lane width is
    nearly free on the TPU; serial depth is everything.

    resolve: True accepts, per conflicting neighborhood, only the
    best-gain lane (ties to the lower id) — the accepted set is an
    independent set of the conflict graph, so each accepted source's
    neighborhood provably did not move during the pass (exact greedy
    parallel coordinate descent). The DEFAULT schedule uses
    resolve=False for its single probe pass and class-serial GS sweeps
    for the polish: measured on the GalSim three_sources_all_overlap
    scene, resolving the probe starves basin escapes behind neighbors'
    routine gains (re-broke the radius-16 types), while NOT resolving
    repeated warm passes lets overlapping sources slosh shared flux
    (three unresolved radius-40 polish passes left every source 14-18
    nats stale). See _fused_joint_dispatch for the full schedule.

    `wide` is a tuple of per-bucket dicts: patches (T_t, B, P_t, P_t)
    leaves plus flat (W_t,)-shaped lane_src/lane_pat/lane_valid/
    pix_counts, (W_t, NB) nb_idx/nb_mask, and (W_t, 44) fresh_vp0."""
    from ..utils.flops import _TR_STEP_FLOPS, fit_flop_components_analytic

    f32 = jnp.zeros((), jnp.promote_types(wide[0]["pix_counts"].dtype,
                                          jnp.float32))
    rv = tv = ri = ss = fl = f32
    snapshot = vps  # buckets are disjoint: later scatters never feed bg

    # phase 1: fit every bucket against the frozen snapshot
    fitted = []
    gain_tbl = jnp.full(vps.shape[0], -jnp.inf, dtype=elbos.dtype)
    for bw in wide:
        src = bw["lane_src"]
        pc = jax.tree.map(lambda t: t[bw["lane_pat"]], bw["patches"])
        vp0 = bw["fresh_vp0"] if fresh else snapshot[src]
        if mesh is None:
            bg_E, bg_V = _render_neighbor_bg(snapshot[bw["nb_idx"]],
                                             bw["nb_mask"], pc)
            res = jax.vmap(lambda v, p, bE, bV: maximize(
                v, p, bE, bV, config=config))(vp0, pc, bg_E, bg_V)
            inc = jax.vmap(lambda v, p, bE, bV: elbo(v, p, bE, bV))(
                snapshot[src], pc, bg_E, bg_V)
        else:
            from jax.sharding import PartitionSpec as PS

            from .mesh import SRC_AXIS

            lane = PS(SRC_AXIS)

            def _shard_fit(vps_r, nbi_l, nbm_l, pc_l, vp0_l, vinc_l):
                bg_E, bg_V = _render_neighbor_bg(vps_r[nbi_l], nbm_l, pc_l)
                res_l = jax.vmap(
                    lambda v, p, bE, bV: maximize(v, p, bE, bV,
                                                  config=config))(
                    vp0_l, pc_l, bg_E, bg_V)
                inc_l = jax.vmap(lambda v, p, bE, bV: elbo(v, p, bE, bV))(
                    vinc_l, pc_l, bg_E, bg_V)
                return res_l, inc_l

            res, inc = jax.shard_map(
                _shard_fit, mesh=mesh,
                in_specs=(PS(), lane, lane,
                          jax.tree.map(lambda _: lane, pc), lane, lane),
                out_specs=(FitResult(vp=lane, elbo=lane, iters=lane,
                                     f_calls=lane, converged=lane,
                                     delta=lane, free=lane), lane),
                check_vma=False)(snapshot, bw["nb_idx"], bw["nb_mask"],
                                 pc, vp0, snapshot[src])
        improving = _beats(res.elbo, inc)
        gain = jnp.where(improving, res.elbo - inc, -jnp.inf)
        # pad lanes duplicate their bucket's first source with identical
        # inputs, so their gains are bit-identical to the real lane's and
        # the duplicate-index scatter is deterministic. `improving` must
        # NOT be masked by lane_valid: that writes -inf from pad lanes vs
        # the true gain from the real lane, and XLA's duplicate-update
        # winner is implementation-defined — when -inf wins, the first
        # source's improving probe is silently rejected (and the winner
        # changes with pad width, breaking mesh/single-device exactness).
        # lane_valid masking belongs only in the telemetry sums below.
        gain_tbl = gain_tbl.at[src].set(gain)
        fitted.append((res, inc))

    # phase 2: accept per neighborhood only the best-gain lane (ties to
    # the lower source id); everyone else keeps their snapshot state but
    # their stored ELBO refreshes to the incumbent re-eval under this
    # pass's background (finish_group keep_better semantics)
    for bw, (res, inc) in zip(wide, fitted):
        src = bw["lane_src"]
        gi = gain_tbl[src]                                  # (W,)
        gn = gain_tbl[bw["nb_idx"]]                         # (W, NB)
        nbm = bw["nb_mask"] > 0
        ii = src.astype(bw["nb_idx"].dtype)[:, None]
        blocked = jnp.any(nbm & ((gn > gi[:, None])
                                 | ((gn == gi[:, None])
                                    & (bw["nb_idx"] < ii))), axis=1)
        # resolve=False (the PROBE): accept every improving lane — basin
        # escapes are rare and blocking one behind a neighbor's routine
        # gain defers it to warm polish passes that cannot jump basins
        # (measured: conflict-resolving the probe re-broke the radius-16
        # three_sources scene that plain-Jacobi probing types correctly).
        accept = (gi > -jnp.inf) & (jnp.logical_not(blocked) | (not resolve))
        pick = lambda new, old: jnp.where(
            accept[:, None] if new.ndim == 2 else accept, new, old)
        vps = vps.at[src].set(pick(res.vp, snapshot[src]))
        elbos = elbos.at[src].set(pick(res.elbo, inc))
        conv = conv.at[src].set(pick(res.converged, conv[src]))
        real = bw["lane_valid"] > 0
        cnt = bw["pix_counts"]
        P_t = int(bw["patches"].mask.shape[-1])
        B_t = int(bw["patches"].mask.shape[-3])
        F_fg, F_H, F_eigh = fit_flop_components_analytic(P_t, B_t)
        lane_total = float(np.prod(bw["patches"].mask.shape[1:]))
        iters = iters.at[src].add(jnp.where(real, res.iters, 0))
        fc = res.f_calls.astype(cnt.dtype)
        rv = rv + jnp.sum(jnp.where(real, cnt * fc, 0.0))
        tv = tv + lane_total * jnp.sum(fc)
        ri = ri + jnp.sum(jnp.where(real, res.iters, 0)).astype(rv.dtype)
        ss = ss + jnp.max(res.iters).astype(rv.dtype)
        refreshes = jnp.ceil(res.iters / max(config.hess_every, 1))
        lane_fl = (fc * F_fg + refreshes.astype(fc.dtype) * (F_H + F_eigh)
                   + res.iters.astype(fc.dtype) * _TR_STEP_FLOPS)
        fl = fl + jnp.sum(jnp.where(real, lane_fl, 0.0))
    return (vps, elbos, conv, iters, rv, tv, ri, ss, fl)


def _fused_joint_dispatch(states, classes, newton_config, n_sweeps,
                          n_restart, mesh=None, budget_bytes=4 << 30,
                          restart_config=None, polish_config=None,
                          n_polish=2):
    """Host staging + ASYNC dispatch of _fused_joint_program over ONE OR
    MORE fields.

    Fields never conflict, so several fields' sources can ride the SAME
    class index side by side — cross-field lateral class merging, the
    occupancy win a single sparse field cannot reach (reference analog:
    box-level task farm, contrib/nersc/infer.sl:30, where each box only
    ever occupied one thread pool). `classes` uses MERGED source ids:
    field f's source s has id offset_f + s (offsets by cumulative catalog
    length). Pads classes to one (C, W) lane grid at one shared tile size,
    uploads each unique target patch once, and enqueues the whole schedule
    as a single launch. JAX dispatch is async: this returns a handle while
    the device crunches; `_fused_joint_finish(handle)` blocks and applies
    the results back to every field's state. Returns None if the staging
    would not fit `budget_bytes` of device memory (caller falls back to
    per-field scheduling)."""
    offsets = np.cumsum([0] + [len(st.catalog) for st in states])
    S_tot = int(offsets[-1])

    def owner(m):
        f = int(np.searchsorted(offsets, m, side="right") - 1)
        return f, m - int(offsets[f])

    n_targets = sum(len(st.targets) for st in states)
    tile_of = {}
    for f, st in enumerate(states):
        o = int(offsets[f])
        for s in st.targets:
            tile_of[o + s] = int(st.tile[s])
    tiles = sorted({tile_of[m] for cls in classes for m in cls})
    # Floor the padded class count: empty classes are runtime-gated
    # (has[c]=False skips the sub-fit via lax.cond) so they cost nothing,
    # but 4-vs-5 real classes otherwise pads C to 4 vs 8 — a fresh
    # multi-minute XLA compile per box-group layout in a farm run.
    C = max(_next_pow2(len(classes)), 8)
    S_pad = _next_pow2(S_tot)
    B = len(states[0].images)

    # per-bucket widths + staging budget (each bucket stages at ITS tile)
    grp = {t: [[m for m in cls if tile_of[m] == t] for cls in classes]
           for t in tiles}
    uniq_t, W_t, T_t = {}, {}, {}
    est_bytes = 0
    for t in tiles:
        uniq_t[t] = sorted({m for g in grp[t] for m in g})
        n_t = len(uniq_t[t])
        W = max(32 if n_t >= 32 else _next_pow2(n_t),
                _next_pow2(max((len(g) for g in grp[t] if g), default=1)))
        if mesh is not None:
            from .mesh import SRC_AXIS
            W = max(W, _next_pow2(mesh.shape[SRC_AXIS]))
        W_t[t] = W
        T_t[t] = _next_pow2(n_t)
        est_bytes += T_t[t] * B * t * t * 4 * 4
    if est_bytes > budget_bytes:
        Log.info(f"fused joint: staging ~{est_bytes >> 20} MiB exceeds the "
                 "budget; using the host-driven schedule")
        return None

    counts_by_src = {}
    fresh_by_src = np.zeros((S_tot, 44))

    # merged neighbor tables: offset each field's indices (no cross-field
    # edges exist); merged mutable state by concatenation
    NB = states[0].nb_idx.shape[1]
    nb_idx = np.zeros((S_tot, NB), dtype=np.int64)
    nb_mask = np.zeros((S_tot, NB))
    vps = np.zeros((S_pad, 44), dtype=states[0].vps.dtype)
    elbos = np.full(S_pad, -np.inf, dtype=np.float64)
    convs = np.zeros(S_pad, dtype=bool)
    for f, st in enumerate(states):
        o = int(offsets[f])
        sl = slice(o, o + len(st.catalog))
        nb_idx[sl] = st.nb_idx + o
        nb_mask[sl] = st.nb_mask
        vps[sl] = st.vps
        elbos[sl] = st.elbos
        convs[sl] = st.converged

    buckets, wide = [], []
    for t in tiles:
        uniq = uniq_t[t]
        pat_row = {m: i for i, m in enumerate(uniq)}
        W = W_t[t]

        # batch-build each field's bucket-t patches at tile t
        by_field = {}
        for m in uniq:
            f, s = owner(m)
            by_field.setdefault(f, []).append(s)
        for f, ss in by_field.items():
            states[f].build_patches(ss, tile=t)

        def patch_of(m, t=t):
            f, s = owner(m)
            return states[f].patch(s, tile=t)

        pad_rows = [uniq[0]] * (T_t[t] - len(uniq))
        stacked = stack_patches([patch_of(m) for m in uniq + pad_rows])

        for m in uniq:
            f, s = owner(m)
            counts_by_src[m] = states[f]._pixel_counts[(s, t)]
            fresh_by_src[m] = generic_init_source(states[f].catalog[s].pos)

        # lanes: pad each (class, bucket) group with its own first member
        # (duplicate lanes scatter bit-identical values); empty groups
        # carry uniq[0] but never execute (has[c] gates the sub-fit).
        lanes, has = [], []
        for g in grp[t]:
            fill = g[0] if g else uniq[0]
            lanes.append(list(g) + [fill] * (W - len(g)))
            has.append(bool(g))
        for _ in range(C - len(classes)):
            lanes.append([uniq[0]] * W)
            has.append(False)
        lane_src = np.asarray(lanes, dtype=np.int32)
        lane_valid = np.zeros((C, W), dtype=np.float32)
        for i, g in enumerate(grp[t]):
            lane_valid[i, :len(g)] = 1.0
        buckets.append({
            "patches": stacked,
            "lane_src": lane_src,
            "lane_pat": np.asarray([[pat_row[m] for m in row]
                                    for row in lanes], dtype=np.int32),
            "lane_valid": lane_valid,
            "nb_idx": nb_idx[lane_src],
            "nb_mask": nb_mask[lane_src],
            "fresh_vp0": fresh_by_src[lane_src],
            "pix_counts": np.asarray(
                [[counts_by_src[m] for m in row] for row in lanes],
                dtype=np.float32),
            "has": np.asarray(has, dtype=bool),
        })

        # wide probe/polish lane tables: ALL of this bucket's sources in
        # one flat lane row, padded with the first source exactly like
        # dispatch_group (duplicate lanes scatter bit-identical values;
        # same pad rule incl. the >=32-lane floor so the host-path mirror
        # compiles the same launch widths — tests/test_infer.py exactness)
        floor_w = min(32, _next_pow2(max(n_targets, 1)))
        W_w = max(_next_pow2(len(uniq)), floor_w)
        if mesh is not None:
            from .mesh import SRC_AXIS
            W_w = max(W_w, _next_pow2(mesh.shape[SRC_AXIS]))
        row_w = uniq + [uniq[0]] * (W_w - len(uniq))
        src_w = np.asarray(row_w, dtype=np.int32)
        valid_w = np.zeros(W_w, dtype=np.float32)
        valid_w[:len(uniq)] = 1.0
        wide.append({
            "patches": stacked,
            "lane_src": src_w,
            "lane_pat": np.asarray([pat_row[m] for m in row_w],
                                   dtype=np.int32),
            "lane_valid": valid_w,
            "nb_idx": nb_idx[src_w],
            "nb_mask": nb_mask[src_w],
            "fresh_vp0": fresh_by_src[src_w],
            "pix_counts": np.asarray([counts_by_src[m] for m in row_w],
                                     dtype=np.float32),
        })

    # Split whenever a restart is requested and a probe/polish config is
    # given — matching one_node_joint_infer's host path, which runs the
    # probe+2-polish schedule unconditionally under restart_final. (The
    # split must NOT additionally require restart_config != newton_config:
    # CELESTE_STEP_CAP/_SECULAR/_BISECT overrides can make the capped step
    # config equal the caller's config, and the fused/host bit-exactness
    # pair would then silently run different restart schedules.)
    split = n_restart > 0 and restart_config is not None
    label = (f"fused F={len(states)} C={len(classes)}/{C} "
             + " ".join(f"P{t}:W={W_t[t]}" for t in tiles)
             + f" steps={len(classes) * (n_sweeps + n_restart)}"
             + (f" +probe(wide)+{max(n_polish, 0)}polish" if split else ""))
    t0 = telemetry.now()
    bkt = tuple(buckets)
    c_r = jnp.asarray(len(classes), jnp.int32)
    state0 = (jnp.asarray(vps), jnp.asarray(elbos), jnp.asarray(convs),
              jnp.zeros(S_pad, jnp.int32))
    n_wide = 0
    if split:
        # Split schedule, chained async programs (each consumes the
        # previous one's device outputs — no host round trips):
        #   1. warm Gauss-Seidel sweeps over the conflict-free classes at
        #      the capped per-step budget (newton_config = the caller's
        #      step config: newton/16 secular, 15-iter cap);
        #   2. ONE WIDE fresh-probe pass at the FULL budget
        #      (restart_config, bisect/48) — the basin escape for warm
        #      lock-in: every constrained source refits from generic init
        #      in one launch per bucket against the frozen end-of-sweep
        #      background, conflict-resolved keep-better acceptance
        #      (_fused_wide_pass);
        #   3. TWO full-budget Gauss-Seidel POLISH SWEEPS (the same
        #      class-serial program as 1, at restart_config): the last
        #      time a source was fit its neighbors kept moving afterwards,
        #      so end-of-schedule states are optimal only under STALE
        #      backgrounds (measured 14-26 nats short with star/galaxy
        #      flips on three_sources_all_overlap). The polish must be
        #      conflict-SCHEDULED, not wide: a wide/Jacobi polish SLOSHES
        #      (three radius-40 passes left every source 14-18 nats stale
        #      — overlapping sources re-fit the same shared flux
        #      simultaneously), and conflict-RESOLVED wide acceptance
        #      (best-gain-per-neighborhood independent sets) starves the
        #      recovering lanes behind their neighbors' gains — both
        #      variants were measured to re-break the scene that two GS
        #      rounds type correctly (rounds 3-4 refine <2 nats).
        # The probe/polish must run the bisect/48 trajectories: the
        # newton/16 secular polish stays in the stale galaxy basin
        # (-28916 nats, p_star 0.005) while bisect/48 escapes to the star
        # basin (-28907, p_star 0.995) — the round-2 artifact predates the
        # per-step newton/16 swap, which is why it typed the scene
        # correctly.
        cur = _fused_joint_program(
            *state0, bkt, c_r, n_sweeps=n_sweeps, n_restart=0,
            config=newton_config, mesh=mesh)
        probe = _fused_wide_pass(*cur[:4], tuple(wide),
                                 config=restart_config, mesh=mesh,
                                 fresh=True, resolve=False)
        phases = [cur, probe]
        if n_polish > 0:
            phases.append(_fused_joint_program(
                *probe[:4], bkt, c_r, n_sweeps=n_polish, n_restart=0,
                config=polish_config or restart_config, mesh=mesh))
        out = phases[-1][:4] + tuple(
            sum(t) for t in zip(*(p[4:] for p in phases)))
        n_wide = 1 + max(n_polish, 0)
    else:
        out = _fused_joint_program(
            *state0, bkt, c_r, n_sweeps=n_sweeps,
            n_restart=n_restart, config=newton_config, mesh=mesh)
    return {"out": out, "states": states, "offsets": offsets,
            "touched": sorted({m for cls in classes for m in cls}),
            "n_fits": sum(len(cls) for cls in classes)
            * (n_sweeps + (0 if n_wide else n_restart) + n_wide),
            "t0": t0, "label": label}


def _fused_joint_finish(handle):
    """Block on a _fused_joint_dispatch launch and apply its results back
    to every field's InferenceState (+ telemetry). Only the rows the
    schedule actually fit (`touched`) are written: isolated targets are
    fit by a SEPARATE concurrent launch (_fit_isolated_multi) whose host
    results must not be clobbered by the staged (pre-fit) values riding
    along in the fused output table."""
    try:
        out = jax.block_until_ready(handle["out"])
    except Exception as exc:
        # Production semantics: a failed fused launch (e.g. a device error
        # surfacing at the transfer) keeps every field at its previous
        # state instead of aborting the farm run (ParallelRun.jl:390-396).
        if not is_production_run():
            raise
        Log.exception(exc)
        telemetry.counters.failures += len(handle["touched"])
        return
    telemetry.record_launch_wall(handle["t0"], handle["label"])
    states, offsets = handle["states"], handle["offsets"]
    vps_o, elbos_o, conv_o, iters_o, rv, tv, ri, ss, fl = out
    touched = np.asarray(handle["touched"], dtype=np.int64)
    vps_o, elbos_o = np.asarray(vps_o), np.asarray(elbos_o)
    conv_o, iters_o = np.asarray(conv_o), np.asarray(iters_o)
    for f, st in enumerate(states):
        o, S = int(offsets[f]), len(st.catalog)
        rows = touched[(touched >= o) & (touched < o + S)]
        loc = rows - o
        st.vps[loc] = vps_o[rows]
        st.elbos[loc] = elbos_o[rows]
        st.converged[loc] = conv_o[rows]
        st.iters[loc] += iters_o[rows]
    telemetry.counters.sources_fit += handle["n_fits"]
    telemetry.counters.newton_iters += int(ri)
    telemetry.counters.serial_steps += int(ss)
    telemetry.counters.pixel_visits += int(rv)
    telemetry.counters.padded_visits += int(max(float(tv) - float(rv), 0.0))
    telemetry.counters.model_flops += float(fl)


def _capped_step_config(newton_config: NewtonConfig, config: Config):
    """Per-class-step Hessian-refresh budget for the JOINT schedules'
    WARM SWEEPS (Config.joint_step_refreshes; CELESTE_STEP_CAP overrides
    for A/B). The restart probe and polish passes do NOT use this config —
    they run the caller's full newton_config (bisect/48, max_iters=50):
    see _fused_joint_dispatch's split schedule.

    A batched class-step runs every lane until the slowest lane converges;
    one never-converging straggler otherwise burns the full single-fit cap
    (max_iters, the reference's 50) on each of its (sweeps + restart)
    steps — measured 4x the fused multi-field schedule's wall. Truncated
    lanes resume next sweep from their current vp with re-centered
    position bounds, so total optimization opportunity stays
    sweeps x cap + restart cap. Applied identically to the fused and
    host-driven paths (the bit-exactness pair, tests/test_infer.py)."""
    import os

    try:
        cap = int(os.environ.get("CELESTE_STEP_CAP", "0"))
    except ValueError:
        Log.info("CELESTE_STEP_CAP is not an integer; ignoring")
        cap = 0
    cap = cap or config.joint_step_refreshes
    if cap and cap < newton_config.max_iters:
        newton_config = newton_config._replace(max_iters=cap)
    # The TR secular solver's optimum is LAUNCH-WIDTH-DEPENDENT (both
    # measured on the v5e): wide launches (the 1024-lane bench, the
    # compacted isolated fits) are throughput-bound, where 48 cheap
    # bisections beat 16 secular-Newton iterations (552 vs 482 fits/s);
    # the fused joint schedule's narrow per-(class, bucket) sub-fits
    # (W ~ 32-128) are latency-bound on the serialized scan, where the 3x
    # shorter Newton chain wins (8-field farm run: 53.7 device fits/s at
    # newton/16 in round 2 vs 39.3 at bisect/48). So the per-step config
    # switches to newton/16 here while everything wide keeps the
    # bisect/48 default. CELESTE_STEP_SECULAR / CELESTE_STEP_BISECT
    # override for A/Bs.
    secular = os.environ.get("CELESTE_STEP_SECULAR", "newton")
    try:
        bisect_iters = int(os.environ.get("CELESTE_STEP_BISECT", "16"))
    except ValueError:
        bisect_iters = 16
    return newton_config._replace(secular=secular,
                                  bisect_iters=bisect_iters)


def _polish_config(restart_cfg: NewtonConfig, config: Config):
    """(polish NewtonConfig, polish sweep count) for the joint split
    schedule. The polish keeps the probe's TR solver (bisect/48 — the
    basin-fidelity choice) but caps its per-class-step Hessian-refresh
    budget at Config.polish_refreshes: polish lanes are warm starts
    already optimized under near-final backgrounds, so the cap only
    bounds what a never-converging straggler can burn per step (the
    full-budget polish was measured 26-30x the capped schedule's wall
    with NO accuracy gain, benchmark/field_results.md round 3-4).
    CELESTE_POLISH_CAP / CELESTE_POLISH_SWEEPS override for A/Bs."""
    import os

    try:
        cap = int(os.environ.get("CELESTE_POLISH_CAP", "-1"))
    except ValueError:
        Log.info("CELESTE_POLISH_CAP is not an integer; ignoring")
        cap = -1
    if cap < 0:
        cap = config.polish_refreshes
    cfg = restart_cfg
    if cap and cap < cfg.max_iters:
        cfg = cfg._replace(max_iters=cap)
    try:
        n = int(os.environ.get("CELESTE_POLISH_SWEEPS", "-1"))
    except ValueError:
        Log.info("CELESTE_POLISH_SWEEPS is not an integer; ignoring")
        n = -1
    if n < 0:
        n = config.polish_sweeps
    return cfg, n


def _waves(components):
    """Round-robin the sources of each connected component: wave w = the
    w-th source of every CC. No two sources in a wave conflict."""
    out, w = [], 0
    while True:
        wave = [c[w] for c in components if len(c) > w]
        if not wave:
            return out
        out.append(wave)
        w += 1


def color_classes(targets, neighbor_map, rng=None, tile=None):
    """Greedy coloring of the conflict graph: a partition of `targets` into
    conflict-free classes, each as WIDE as possible.

    The reference's Cyclades component-waves give the same safety guarantee
    (conflicting sources never run concurrently) but terrible launch width
    on TPU: a chain of k overlapping sources serializes into k near-empty
    waves. Greedy coloring needs only ~(max degree + 1) classes, and sparse
    sky fields have small degree — measured on a 128-source field
    end-to-end: 60 -> 20 launches and 252 -> 145 s (1.7x). Between classes
    each fit still reads the freshest neighbor vps, so the
    serial-equivalence argument of Cyclades (partition.jl:85-236) carries
    over unchanged.

    Class sizes are BALANCED: only conflicted sources are pinned to
    distinct classes; the (typically majority) conflict-free sources can go
    anywhere, and each is placed where it least grows the padded-launch
    cost (launches pad to a power of two per tile bucket, so a greedy
    class-0 dump pads the first class up a power while the tail classes
    pad up to the 32-lane floor — pure idle lanes both ways). `tile`:
    optional {source: tile_size} so balancing happens within the per-class
    per-bucket groups one_node_joint_infer actually launches.
    """
    rng = rng or np.random.default_rng(42)
    order = list(targets)
    rng.shuffle(order)
    tile_of = (lambda s: tile[s]) if tile is not None else (lambda s: 0)

    constrained = [s for s in order if neighbor_map.get(s)]
    free = [s for s in order if not neighbor_map.get(s)]

    def pad_cost(n):
        return 0 if n == 0 else max(_next_pow2(n), 32)

    color = {}
    # per-(color, tile) group sizes
    sizes = []

    def grow(c, s):
        color[s] = c
        while c >= len(sizes):
            sizes.append({})
        t = tile_of(s)
        sizes[c][t] = sizes[c].get(t, 0) + 1

    def placement_cost(c, s):
        """(padded-lane increase, resulting group size) of adding s to c —
        prefer fills that stay within the current power-of-two pad, then
        smaller groups."""
        n = sizes[c].get(tile_of(s), 0) if c < len(sizes) else 0
        return (pad_cost(n + 1) - pad_cost(n), n)

    for s in constrained:
        used = {color[n] for n in neighbor_map.get(s, ()) if n in color}
        cands = [c for c in range(len(sizes)) if c not in used]
        if not cands:
            grow(len(sizes), s)
        else:
            grow(min(cands, key=lambda c: placement_cost(c, s)), s)
    if not sizes:
        sizes.append({})
    for s in free:
        grow(min(range(len(sizes)), key=lambda c: placement_cost(c, s)), s)

    classes = [[] for _ in range(len(sizes))]
    for s in order:
        classes[color[s]].append(s)
    # widest first: the big classes amortize launch overhead best
    classes.sort(key=len, reverse=True)
    return classes


# Measured per-TR-step device cost of a batched sub-fit (tools/knee_probe.py
# across a (W lanes, P tile) grid on the real chip, solo):
#
#     wall / serialized step  ~=  W * (16.5 us + P^2 * 7 ns)
#
# LINEAR in lane count W with an affine per-lane cost in tile pixels — the
# while_loop body is throughput-bound at every measured width (32..2048
# lanes), dominated by the amortized batched eigh plus the per-step
# renders. An earlier "per-step cost is width-independent (latency-bound)"
# reading came from host-contended measurements and drove a tile-pure
# minimum-class packer that regressed the 8-field farm run 53.7 -> 38.6
# device fits/s (benchmark/multifield_results.md); idle lanes are NOT free.
LANE_STEP_US_FLOOR = 16.5
LANE_STEP_NS_PER_PX = 7.0


def _lane_step_cost(t):
    """Measured per-TR-step cost (us) of ONE lane at tile size t."""
    return LANE_STEP_US_FLOOR + max(t, 1) ** 2 * LANE_STEP_NS_PER_PX * 1e-3


def fused_color_classes(targets, neighbor_map, rng=None, tile=None):
    """Conflict-free classes minimizing the fused program's total
    LANE-STEP COST under the measured linear cost model (_lane_step_cost).

    The fused schedule runs, per (sweep | restart) pass, one sub-fit per
    (class, tile bucket) group, each padded to that bucket's power-of-two
    width W_t and running every lane until the slowest converges (or the
    per-class-step cap truncates). With per-step cost W * c(P), a pass
    costs ~ k * sum_t W_t * c(t) * steps — so the packer searches class
    counts k and keeps the smallest feasible

        cost(k) = k * sum_t width_t(t, k) * _lane_step_cost(t),

    where width_t is the padded per-(class, bucket) width at an even
    spread. Fewer classes is NOT cheaper once the max class pads up a
    power of two; more classes is NOT cheaper once every class pays the
    32-lane floor. Sparse sky overlap graphs (mean degree ~2-3) routinely
    admit k below max-degree+1 when classes may hold any non-conflicting
    source up to the cap.

    tile: optional {source: tile_size}. Per-(class, bucket) group sizes
    are capped at that bucket's padded width so a class cannot hoard the
    large-tile sources and widen the priciest lane grid."""
    rng = rng or np.random.default_rng(42)
    n = len(targets)
    tile_of = (lambda s: int(tile[s])) if tile is not None else (lambda s: 0)
    n_t = {}
    for s in targets:
        t = tile_of(s)
        n_t[t] = n_t.get(t, 0) + 1

    def width_t(t, k):
        floor = min(32, _next_pow2(max(n_t[t], 1)))
        return max(floor, _next_pow2(-(-n_t[t] // k)))

    def cost(k):
        return k * sum(width_t(t, k) * _lane_step_cost(t) for t in n_t)

    ks = sorted(range(1, n + 1), key=lambda k: (cost(k), k))
    for k in ks:
        classes = _try_color_capped(targets, neighbor_map, k,
                                    {t: width_t(t, k) for t in n_t},
                                    tile_of, rng)
        if classes is not None:
            return classes
    return color_classes(targets, neighbor_map, rng)  # unreachable fallback


def _try_color_capped(targets, neighbor_map, k, caps, tile_of, rng):
    """Greedy k-coloring of `targets` with per-(class, tile) group sizes
    capped at caps[t], highest-degree-first with a few shuffle retries.
    None if infeasible at this k."""
    for _ in range(4):
        order = list(targets)
        rng.shuffle(order)
        order.sort(key=lambda s: -len(neighbor_map.get(s, ())))
        classes = [[] for _ in range(k)]
        members = [set() for _ in range(k)]
        counts = [dict() for _ in range(k)]
        ok = True
        for s in order:
            nbs = neighbor_map.get(s, ())
            t = tile_of(s)
            cands = [c for c in range(k)
                     if counts[c].get(t, 0) < caps[t]
                     and not any(nb in members[c] for nb in nbs)]
            if not cands:
                ok = False
                break
            c = min(cands, key=lambda c: (counts[c].get(t, 0),
                                          len(classes[c])))
            classes[c].append(s)
            members[c].add(s)
            counts[c][t] = counts[c].get(t, 0) + 1
        if ok:
            return [c for c in classes if c]
    return None


def _wide_pass_host(st, union, newton_config, fresh, resolve=None):
    """Host-driven mirror of _fused_wide_pass: one wide keep-better launch
    per tile bucket over `union` against the frozen current vps, then
    conflict-resolved acceptance (best gain per neighborhood, ties to the
    lower id; resolve=False, the probe, accepts every improving lane)
    applied across ALL buckets at once. Bit-exact with the fused pass:
    same lane order (sorted union), same pad rule (dispatch_group), same
    gains, same blocking graph (the capped nb tables)."""
    if resolve is None:
        resolve = not fresh
    snap = st.vps.copy()
    pend = [st.dispatch_group(
        [s for s in union if st.tile[s] == P], newton_config,
        use_bg=True, bg_vps=snap, fresh_init=fresh, keep_better=True)
        for P in TILE_BUCKETS]
    recs, gain = [], {}
    for p in pend:
        if p is None:
            continue
        idx, n = p["idx"], p["n"]
        try:
            vp = np.asarray(p["res"].vp)[:n]
            el = np.asarray(p["res"].elbo)[:n]
            cv = np.asarray(p["res"].converged)[:n]
            it = np.asarray(p["res"].iters)[:n]
            fcalls = np.asarray(p["res"].f_calls)
        except Exception as exc:
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            continue
        telemetry.record_launch_wall(p["t0"], p["label"])
        inc = np.asarray(p["inc"])[:n]
        improving = _beats(el, inc)
        for k, s in enumerate(idx):
            gain[s] = float(el[k] - inc[k]) if improving[k] else -np.inf
        recs.append((p, idx, vp, el, cv, it, fcalls, inc))
    for p, idx, vp, el, cv, it, fcalls, inc in recs:
        take = np.zeros(len(idx), dtype=bool)
        for k, s in enumerate(idx):
            gi = gain[s]
            if gi == -np.inf:
                continue
            blocked = False
            if resolve:
                for j, nb in enumerate(st.nb_idx[s]):
                    if st.nb_mask[s, j] <= 0:
                        continue
                    gj = gain.get(int(nb), -np.inf)
                    if gj > gi or (gj == gi and int(nb) < s):
                        blocked = True
                        break
            take[k] = not blocked
        idxa = np.asarray(idx)
        st.elbos[idxa[~take]] = inc[~take]
        st.vps[idxa[take]] = vp[take]
        st.elbos[idxa[take]] = el[take]
        st.converged[idxa[take]] = cv[take]
        st.iters[idxa] += it
        telemetry.record_fit_launch(
            p["n_lanes"], p["pad"] - p["n_lanes"],
            pixels_per_lane_real=p["pixel_counts"][:p["n_lanes"]],
            pixels_per_lane_total=p["pixels_per_lane_total"],
            f_calls=fcalls, tile=p["tile"], bands=p["bands"],
            hess_every=p["hess_every"])


def one_node_joint_infer(catalog, images, target_sources=None,
                         config=Config(), batch_size=None,
                         newton_config=NewtonConfig(), max_neighbors=8,
                         seed=42, state=None, checkpoint_path=None,
                         restart_final=True, mesh=None, active_boxes=None):
    """Joint VI over all targets: num_joint_vi_iters sweeps over
    conflict-free classes of the overlap graph, each class one batched
    launch with neighbors as freshest-vp background. The schedule is a
    greedy graph coloring (see color_classes — same safety guarantee as the
    reference's Cyclades component waves, ParallelRun.jl:135-196, but with
    TPU-wide launches); pass batch_size to use the reference's Cyclades
    batch/wave schedule instead.

    checkpoint_path: optional npz path saved after every sweep/batch; if
    it exists, inference resumes from the stored cursor — mid-box
    elasticity the reference delegates to whole-box re-runs.

    restart_final: after the warm iterations, refit every target once more
    from a FRESH generic init against the converged neighbor backgrounds
    and keep whichever fit has the better ELBO (the basin PROBE: warm
    starts lock a source into the basin it chose while its neighbors were
    still unfit — a true star overlapping another star absorbs its light
    in iteration 1, flips to the galaxy basin, and no later warm-started
    Newton pass escapes; measured +492 nats and the correct type from the
    probe on the overlapping_stars GalSim scene), then POLISH every target
    warm-started at the same full budget: each class's last fit predates
    its neighbors' later moves, so the stored states are optimal only
    under stale backgrounds (measured 18-25 nats short with a star/galaxy
    flip on three_sources_all_overlap). Both passes run the caller's full
    newton_config (bisect/48), not the capped sweep config — see
    _fused_joint_dispatch. The reference's joint driver has the same
    lock-in and neither pass; this is a strict improvement."""
    import os

    step_config = _capped_step_config(newton_config, config)
    restart_cfg = newton_config  # full budget + bisect/48 for the probe
    polish_cfg, n_polish = _polish_config(restart_cfg, config)
    st = state or InferenceState(catalog, images, config, target_sources,
                                 max_neighbors, active_boxes=active_boxes)
    targets = st.targets
    tset = set(targets)
    nb_for_targets = {s: [n for n in st.neighbor_map[s] if n in tset]
                      for s in targets}
    rng = np.random.default_rng(seed)
    if batch_size is None:
        # TPU-default schedule: only CONSTRAINED targets (those sharing
        # pixels with another target) ride the sweep/restart schedule.
        # An isolated target's ELBO shares no term with any other target,
        # so re-fitting it every sweep and restarting it from the same
        # generic init it started from are identity operations — it is
        # fit ONCE, at full budget, in the widest compacted launch shape
        # (bench.py's machine) with its non-target neighbors as static
        # background. Sparse sky fields are mostly isolated targets, so
        # this removes most of the schedule's lane-steps outright.
        isolated = [s for s in targets if not nb_for_targets[s]]
        constrained = [s for s in targets if nb_for_targets[s]]
        sweeps = [color_classes(constrained, nb_for_targets, rng)
                  if constrained else []]
        Log.info(f"joint infer: {len(targets)} sources "
                 f"({len(isolated)} isolated), "
                 f"{len(sweeps[0])} conflict-free color classes")
    else:
        # reference schedule: Cyclades batches of `batch_size`, CC waves
        sweeps = [
            _waves(comps) for comps in partition_cyclades_dynamic(
                targets, nb_for_targets, batch_size=batch_size, rng=rng)]
        Log.info(f"joint infer: {len(targets)} sources, "
                 f"{len(sweeps)} Cyclades batches")

    cursor = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        cursor = st.restore(checkpoint_path)
        Log.info(f"joint infer: resuming at step {cursor}")

    def fit_isolated():
        # full-budget dual-init single fits through the SAME staging code
        # as the multi-field path (_fit_isolated_multi): per-tile-bucket
        # power-of-two chunks at the shared >=32-lane pad. Sharing the code
        # (and therefore the compiled launch widths) makes per-field and
        # merged multi-field runs bit-identical for isolated sources —
        # width-dependent f64 rounding over ~50 chaotic TR steps otherwise
        # flips near-tied star/galaxy basins between the two paths
        # (tests/test_multifield.py).
        _fit_isolated_multi([st], isolated, newton_config)

    # Fused schedule (the TPU default): the whole sweep/restart schedule is
    # one device launch (_fused_joint_program) instead of one launch per
    # (sweep, class, tile bucket) — identical update order, no per-launch
    # host round trips. The host-driven loop below remains for Cyclades
    # scheduling (batch_size), mid-box checkpointing, oversized stagings,
    # and CELESTE_FUSED=0.
    isolated_done = False
    if (batch_size is None and not checkpoint_path and targets
            and os.environ.get("CELESTE_FUSED", "1") != "0"):
        telemetry.counters.reset()
        try:
            # Dispatch the fused constrained-class schedule FIRST (async),
            # then stage + fit the isolated targets while it is in flight —
            # the joint_infer_fields ordering, which overlaps the isolated
            # launches' host staging with the fused program's device time.
            # Legal because an isolated target is never a neighbor of a
            # constrained target (a conflict edge would make both
            # constrained), so neither launch reads the other's updates.
            handle = None
            if constrained:
                # Default schedule = the width-capped lane-step-cost packer
                # (fused_color_classes, measured linear cost model:
                # k * sum_t W_t * lane_step_cost(t)). Packer choice is
                # accuracy-NEUTRAL (a 5-field A/B measured mean type
                # accuracy 0.911 capped vs 0.908 balanced vs 0.910
                # reference-style Cyclades waves — field draw variance
                # dominates, benchmark/field_results.md).
                # CELESTE_FUSED_PACK=0 restores the balanced host-path
                # classes (also what the bit-exactness test pins).
                if os.environ.get("CELESTE_FUSED_PACK", "1") not in ("0",):
                    fused_cls = fused_color_classes(
                        constrained, nb_for_targets,
                        np.random.default_rng(seed),
                        tile={s: int(st.tile[s]) for s in constrained})
                else:
                    fused_cls = sweeps[0]
                handle = _fused_joint_dispatch(
                    [st], fused_cls, step_config,
                    n_sweeps=config.num_joint_vi_iters,
                    n_restart=1 if restart_final else 0, mesh=mesh,
                    restart_config=restart_cfg,
                    polish_config=polish_cfg, n_polish=n_polish)
            fit_isolated()
            isolated_done = True
            if not constrained:
                telemetry.counters.report("joint infer (fused)")
                return _collect_results(st)
            if handle is not None:
                _fused_joint_finish(handle)
                telemetry.counters.report("joint infer (fused)")
                return _collect_results(st)
            # handle is None: the merged staging exceeded the device
            # budget — fall through to the host-driven schedule below
        except Exception as exc:
            if not is_production_run():
                raise
            Log.exception(exc)

    def fit_class(cls, **kw):
        # The tile-bucket groups of one class are mutually conflict-free:
        # dispatch them all, then collect — host prep and device->host
        # transfers overlap with device compute instead of paying one
        # blocking round trip per bucket.
        pend = [st.dispatch_group([s for s in cls if st.tile[s] == P],
                                  step_config, use_bg=True, **kw)
                for P in TILE_BUCKETS]
        for p in pend:
            st.finish_group(p)

    if not isolated_done:
        telemetry.counters.reset()
    if batch_size is None and not isolated_done and cursor == 0:
        fit_isolated()
    step = 0
    for it in range(config.num_joint_vi_iters):
        for groups in sweeps:
            step += 1
            if step <= cursor:
                continue
            for cls in groups:
                fit_class(cls)
            if checkpoint_path:
                st.save(checkpoint_path, cursor=step)
    if restart_final:
        # Full-budget (bisect/48) WIDE fresh-probe pass, then
        # Config.polish_sweeps capped Gauss-Seidel polish sweeps over the
        # conflict-free classes — the host-path mirror of
        # _fused_joint_dispatch's split schedule (see its docstring,
        # _fused_wide_pass, and _polish_config for the measured basin +
        # latency evidence).
        union = sorted({s for groups in sweeps for cls in groups
                        for s in cls})
        _wide_pass_host(st, union, restart_cfg, fresh=True, resolve=False)
        for _ in range(n_polish):
            for groups in sweeps:
                for cls in groups:
                    pend = [st.dispatch_group(
                        [s for s in cls if st.tile[s] == P], polish_cfg,
                        use_bg=True) for P in TILE_BUCKETS]
                    for p in pend:
                        st.finish_group(p)
    telemetry.counters.report("joint infer")
    return _collect_results(st)


def joint_infer_fields(fields, config=Config(),
                       newton_config=NewtonConfig(), max_neighbors=8,
                       seed=42, restart_final=True, mesh=None):
    """Joint VI over MULTIPLE independent fields/boxes as ONE fused launch.

    fields: list of dicts with keys `catalog`, `images`, and optionally
    `target_sources` / `active_boxes` (same meaning as one_node_joint_infer).
    Returns a list of per-field result lists.

    A single sparse field rarely fills the fused program's lanes (the
    128-source field benchmark runs W≈32 lanes vs the 512-lane batch
    bench). Fields never conflict, so their color classes merge LATERALLY:
    the width-capped packer runs on the union conflict graph with
    field-offset source ids and freely packs sources of different fields
    into the same class. Reference analog: the box-level task farm
    (contrib/nersc/infer.sl:30) × per-box thread scheduling
    (ParallelRun.jl:302-369) — which never shared a thread pool across
    boxes. Falls back to per-field one_node_joint_infer when the merged
    staging exceeds the device budget."""
    states, classes, isolated = _merged_states_classes(
        fields, config, max_neighbors, seed)
    step_config = _capped_step_config(newton_config, config)
    restart_cfg = newton_config  # full budget + bisect/48 for the probe
    polish_cfg, n_polish = _polish_config(restart_cfg, config)
    telemetry.counters.reset()
    if classes:
        handle = _fused_joint_dispatch(states, classes, step_config,
                                       restart_config=restart_cfg,
                                       polish_config=polish_cfg,
                                       n_polish=n_polish,
                                       n_sweeps=config.num_joint_vi_iters,
                                       n_restart=1 if restart_final else 0,
                                       mesh=mesh)
        if handle is None:
            return [one_node_joint_infer(
                f["catalog"], f["images"], f.get("target_sources"), config,
                newton_config=newton_config, max_neighbors=max_neighbors,
                seed=seed, restart_final=restart_final, mesh=mesh,
                active_boxes=f.get("active_boxes")) for f in fields]
        # the isolated launches are independent of the in-flight fused
        # schedule — they queue behind it on the device, no ordering needed
        _fit_isolated_multi(states, isolated, newton_config)
        _fused_joint_finish(handle)
    else:
        _fit_isolated_multi(states, isolated, newton_config)
    telemetry.counters.report("joint infer (fields, fused)")
    return [_collect_results(st) for st in states]


def _merged_states_classes(fields, config, max_neighbors, seed):
    """Per-field InferenceStates + merged-id conflict classes for one fused
    multi-field launch (the prepare step shared by joint_infer_fields and
    the pipelined driver). Targets with no target-neighbor are split out
    (third return value, merged ids): their fits are independent of the
    whole schedule (see one_node_joint_infer), so they go to one wide
    compacted launch (_fit_isolated_multi) instead of riding every
    sweep + restart step."""
    states = [InferenceState(f["catalog"], f["images"], config,
                             f.get("target_sources"), max_neighbors,
                             active_boxes=f.get("active_boxes"))
              for f in fields]
    assert len({len(st.images) for st in states}) <= 1, \
        "all fields must have the same number of bands"

    offsets = np.cumsum([0] + [len(st.catalog) for st in states])
    merged_targets, merged_nb, merged_tile = [], {}, {}
    for f, st in enumerate(states):
        o = int(offsets[f])
        tset = set(st.targets)
        for s in st.targets:
            merged_targets.append(o + s)
            merged_nb[o + s] = [o + n for n in st.neighbor_map[s]
                                if n in tset]
            merged_tile[o + s] = int(st.tile[s])

    isolated = [m for m in merged_targets if not merged_nb[m]]
    constrained = [m for m in merged_targets if merged_nb[m]]
    classes = (fused_color_classes(constrained, merged_nb,
                                   np.random.default_rng(seed),
                                   tile=merged_tile)
               if constrained else [])
    Log.info(f"joint infer (fields): {len(states)} fields, "
             f"{len(merged_targets)} sources ({len(isolated)} isolated), "
             f"{len(classes)} merged classes")
    return states, classes, isolated


def _pow2_chunks(seq, floor=32, cap=None):
    """Split a work list into power-of-two-sized chunks, largest first.
    Padding a just-over-a-power batch costs ~2x device work (516 lanes pad
    to 1024); 512 + a 32-padded tail costs ~1x and keeps the compile-key
    set to O(log n) distinct widths (which the bench programs already
    populate). Only valid for INDEPENDENT fits — chunks of one conflict
    class would still be conflict-free, but the isolated fits are the only
    caller that needs it."""
    out, i, n = [], 0, len(seq)
    while n - i >= floor:
        size = 1 << ((n - i).bit_length() - 1)
        if cap:
            size = min(size, cap)
        out.append(seq[i:i + size])
        i += size
    if i < n:
        out.append(seq[i:])
    return out


def _dual_chunk_cap(P):
    """Chunk-size cap for dual-init isolated launches: lanes double to 2n,
    so bound 2n x P^2 lane-pixels at ~2^21 — the widest P<=32 launches keep
    the bench's 1024-lane program shape while P=128 stagings stay inside
    the device/upload budget."""
    return max(32, (1 << 21) // (2 * P * P))


def _fit_isolated_multi(states, isolated, newton_config):
    """Fit merged isolated targets (no target-neighbors) across fields as
    ONE wide compacted launch per tile bucket — the widest-launch shape
    (bench.py's machine), at the FULL single-fit budget. Non-target
    neighbors still enter as fixed catalog-init background. Results are
    applied to each field's InferenceState."""
    if not isolated:
        return
    offsets = np.cumsum([0] + [len(st.catalog) for st in states])

    def owner(m):
        f = int(np.searchsorted(offsets, m, side="right") - 1)
        return f, m - int(offsets[f])

    by_tile = {}
    for m in isolated:
        f, s = owner(m)
        by_tile.setdefault(int(states[f].tile[s]), []).append((f, s))

    def dispatch(t, members):
        # dual-init lanes: lane i warm (catalog/current init), lane n+i
        # generic init — the basin probe the sweep schedule's restart pass
        # gave these sources, in one launch costing ~2 single fits vs the
        # >= 4 schedule passes replaced. finish keeps the better ELBO.
        n = len(members)
        nl = 2 * n
        pad = max(_next_pow2(nl), 32)  # 32-lane floor: stable compile keys
        members_p = members + members + [members[0]] * (pad - nl)
        by_field = {}
        for f, s in members_p:
            by_field.setdefault(f, []).append(s)
        for f, ss in by_field.items():
            states[f].build_patches(ss)
        patches = stack_patches([states[f].patch(s) for f, s in members_p])
        counts = np.array([states[f]._pixel_counts[(s, t)]
                           for f, s in members_p])
        vp0 = np.stack([states[f].vps[s] for f, s in members_p])
        vp0[n:nl] = np.stack(
            [generic_init_source(states[f].catalog[s].pos)
             for f, s in members])
        vp0 = jnp.asarray(vp0)
        nb_vps = jnp.asarray(np.stack(
            [states[f].vps[states[f].nb_idx[s]] for f, s in members_p]))
        nb_mask = jnp.asarray(np.stack(
            [states[f].nb_mask[s] for f, s in members_p]))
        t0 = telemetry.now()
        bg_E, bg_V = _render_neighbor_bg(nb_vps, nb_mask, patches)
        fit = fit_sources if pad < 256 else partial(
            fit_sources_compacted, stage1_refreshes=10)
        res = fit(vp0, patches, bg_E, bg_V, config=newton_config)
        return (members, n, pad, res, counts, t0,
                int(np.prod(patches.mask.shape[1:])),
                f"isolated n={n} pad={pad} P{t}")

    # Production semantics on both the dispatch and the transfer
    # (ParallelRun.jl:390-396 catch-log-continue parity, same as
    # dispatch_group/finish_group): a failed launch is logged and its
    # sources keep their previous state instead of aborting the whole
    # multi-field / pipelined farm run.
    pending = []
    for t, group in sorted(by_tile.items()):
        for members in _pow2_chunks(group, cap=_dual_chunk_cap(t)):
            try:
                pending.append(dispatch(t, members))
            except Exception as exc:
                if not is_production_run():
                    raise
                Log.exception(exc)
                telemetry.counters.failures += len(members)

    for members, n, pad, res, counts, t0, lane_total, label in pending:
        nl = 2 * n
        try:
            vp = np.asarray(res.vp)[:nl]
            elbo = np.asarray(res.elbo)[:nl]
            conv = np.asarray(res.converged)[:nl]
            iters = np.asarray(res.iters)[:nl]
        except Exception as exc:
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += n
            continue
        telemetry.record_launch_wall(t0, label)
        # keep the better basin per source (same objective + background);
        # margin acceptance (_beats) so near-ties stay in the warm basin
        # regardless of launch packing
        fresh = _beats(elbo[n:nl], elbo[:n])
        vp = np.where(fresh[:, None], vp[n:nl], vp[:n])
        elbo = np.where(fresh, elbo[n:nl], elbo[:n])
        conv = np.where(fresh, conv[n:nl], conv[:n])
        it_tot = iters[:n] + iters[n:nl]
        for i, (f, s) in enumerate(members):
            states[f].vps[s] = vp[i]
            states[f].elbos[s] = elbo[i]
            states[f].converged[s] = conv[i]
            states[f].iters[s] += it_tot[i]
        telemetry.record_fit_launch(
            nl, pad - nl, pixels_per_lane_real=counts[:nl],
            pixels_per_lane_total=lane_total,
            f_calls=np.asarray(res.f_calls),
            tile=int(label.rsplit("P", 1)[-1]),
            bands=len(states[0].images),
            hess_every=newton_config.hess_every)


def joint_infer_fields_pipelined(groups, config=Config(),
                                 newton_config=NewtonConfig(),
                                 max_neighbors=8, seed=42,
                                 restart_final=True, mesh=None):
    """Farm-worker pipeline over fused multi-field launches.

    `groups` is an ITERABLE of `fields` lists (each group = one fused
    launch, same schema as joint_infer_fields); yields one result list per
    group, in order. Each group's host work — pulling the next group from
    the (typically lazy) iterable, so the caller's image loading and
    detection too, plus patch gathers and lane staging here — overlaps the
    PREVIOUS group's in-flight device launch: JAX dispatch is async, so the
    chip crunches group k while the host stages k+1. This is the
    double-buffered box staging the round-1 field study identified as the
    remaining e2e bottleneck; reference analog: each farm worker loads its
    next box while threads fit the current one (ParallelRun.jl:302-369 x
    contrib/nersc/infer.sl box farm).

    Two groups' staging buffers are in flight at once, so the per-launch
    device budget is halved vs joint_infer_fields. A group that still
    exceeds it drains the pipeline and falls back to the sequential
    per-field path. Telemetry counters are NOT reset per group — reset
    before iterating for a per-farm report."""
    pending = None
    step_config = _capped_step_config(newton_config, config)
    restart_cfg = newton_config  # full budget + bisect/48 for the probe
    polish_cfg, n_polish = _polish_config(restart_cfg, config)

    def finish(p):
        handle, states, isolated = p
        _fit_isolated_multi(states, isolated, newton_config)
        if handle is not None:
            _fused_joint_finish(handle)
        return [_collect_results(st) for st in states]

    n_sweeps = config.num_joint_vi_iters
    n_restart = 1 if restart_final else 0
    for fields in groups:
        states, classes, isolated = _merged_states_classes(
            fields, config, max_neighbors, seed)
        handle = (_fused_joint_dispatch(states, classes, step_config,
                                        restart_config=restart_cfg,
                                        polish_config=polish_cfg,
                                        n_polish=n_polish,
                                        n_sweeps=n_sweeps,
                                        n_restart=n_restart, mesh=mesh,
                                        budget_bytes=2 << 30)
                  if classes else None)
        if classes and handle is None:
            if pending is not None:
                yield finish(pending)
                pending = None
            yield [one_node_joint_infer(
                f["catalog"], f["images"], f.get("target_sources"), config,
                newton_config=newton_config, max_neighbors=max_neighbors,
                seed=seed, restart_final=restart_final, mesh=mesh,
                active_boxes=f.get("active_boxes")) for f in fields]
            continue
        if pending is not None:
            yield finish(pending)
        pending = (handle, states, isolated)
    if pending is not None:
        yield finish(pending)


def one_node_single_infer(catalog, images, target_sources=None,
                          config=Config(), newton_config=NewtonConfig(),
                          max_neighbors=8, state=None, active_boxes=None):
    """Independent per-source fits with neighbors fixed at their catalog
    initialization (ParallelRun.jl:546-607 + process_source :468-498)."""
    st = state or InferenceState(catalog, images, config, target_sources,
                                 max_neighbors, active_boxes=active_boxes)
    # bg comes from the *initial* vps for every target, as in the
    # reference's per-source ElboArgs construction: snapshot first.
    vps0 = st.vps.copy()
    telemetry.counters.reset()
    # every fit reads only the vps0 snapshot — all buckets can be in flight
    pend = [st.dispatch_group([s for s in st.targets if st.tile[s] == P],
                              newton_config, use_bg=True, bg_vps=vps0)
            for P in TILE_BUCKETS]
    for p in pend:
        st.finish_group(p)
    telemetry.counters.report("single infer")
    return _collect_results(st)


def one_node_svi_infer(catalog, images, target_sources=None,
                       config=Config(), svi_config=None, max_neighbors=8,
                       state=None, active_boxes=None, seed=42):
    """Independent per-source fits by pixel-minibatch STOCHASTIC VI
    (vi/stochastic.fit_sources_svi) with neighbors fixed at their catalog
    initialization — the single_vi schedule with Adam-on-minibatches
    replacing Newton trust-region. The reference's StochasticVI.jl is an
    empty stub (StochasticVI.jl:1-3); this is the real implementation,
    reachable via infer_box(method="svi") and the CLI --method svi."""
    import jax.random as jr

    from ..vi.stochastic import SVIConfig, fit_sources_svi

    svi_config = svi_config or SVIConfig()
    st = state or InferenceState(catalog, images, config, target_sources,
                                 max_neighbors, active_boxes=active_boxes)
    vps0 = st.vps.copy()
    telemetry.counters.reset()
    key = jr.PRNGKey(seed)
    for P in TILE_BUCKETS:
        idx = [s for s in st.targets if st.tile[s] == P]
        if not idx:
            continue
        pad = max(_next_pow2(len(idx)), 32)
        idx_p = idx + [idx[0]] * (pad - len(idx))
        t0 = telemetry.now()
        try:
            patches, counts = st.stacked_patches(idx_p)
            vp0 = jnp.asarray(vps0[idx_p])
            nb_vps = jnp.asarray(vps0[st.nb_idx[idx_p]])
            nb_mask = jnp.asarray(st.nb_mask[idx_p])
            bg_E, bg_V = _render_neighbor_bg(nb_vps, nb_mask, patches)
            key, sub = jr.split(key)
            res = fit_sources_svi(sub, vp0, patches, bg_E, bg_V,
                                  config=svi_config)
            vp = np.asarray(res.vp)[:len(idx)]
            elbo_v = np.asarray(res.elbo)[:len(idx)]
        except Exception as exc:
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            continue
        telemetry.record_launch_wall(t0, f"svi n={len(idx)} pad={pad} P{P}")
        idxa = np.asarray(idx)
        st.vps[idxa] = vp
        st.elbos[idxa] = elbo_v
        st.converged[idxa] = np.isfinite(elbo_v)
        st.iters[idxa] += svi_config.steps
        telemetry.counters.sources_fit += len(idx)
        # each SVI step scores ~pixel_fraction of the active pixels
        telemetry.counters.pixel_visits += int(
            counts[:len(idx)].sum() * svi_config.steps
            * min(svi_config.pixel_fraction, 1.0))
    telemetry.counters.report("svi infer")
    return _collect_results(st)


def bad_sky(ce, images):
    """Flag sources whose background intensity estimate looks inconsistent
    with the observed pixels (ParallelRun.jl:437-461)."""
    img = next((im for im in images if im.band == 3), None)
    if img is None:
        return False
    pc = np.asarray(img.world_to_pix(ce.pos))
    h = int(np.clip(round(pc[0]), 1, img.H)) - 1
    w = int(np.clip(round(pc[1]), 1, img.W)) - 1
    claimed_sky = img.sky_at(h, w) * img.iota_at(h)
    i0, i1 = max(0, h - 50), min(img.H, h + 51)
    j0, j1 = max(0, w - 50), min(img.W, w + 51)
    box = img.pixels[i0:i1, j0:j1]
    observed = np.median(box[~np.isnan(box)]) if box.size else claimed_sky
    return bool((claimed_sky + 5.0) < observed)


def _collect_results(st: InferenceState):
    results = []
    for s in st.targets:
        ce = st.catalog[s]
        results.append(OptimizedSource(
            init_pos=np.asarray(ce.pos, dtype=np.float64),
            vs=st.vps[s].copy(), elbo=float(st.elbos[s]),
            converged=bool(st.converged[s]),
            is_sky_bad=bad_sky(ce, st.images)))
    return results


def infer_box(images, box=None, method="joint_vi", catalog=None,
              config=Config(), **detect_kwargs):
    """Detect (or take) a catalog and infer all sources inside `box`
    (ParallelRun.jl:652-673). method: joint_vi | single_vi | svi | mcmc.

    Phase wall times (detect / infer incl. collect) are logged, mirroring
    the reference's box-level @time reporting (ParallelRun.jl:655-669)."""
    import time as _time

    t0 = _time.perf_counter()
    active_boxes = None
    if catalog is None:
        catalog, det_boxes = detect_sources(images, **detect_kwargs)
        if catalog:
            # patches cover the dilated detection footprints, matching the
            # reference's patch construction (detection.jl:152-167)
            active_boxes = detection_active_boxes(catalog, det_boxes, images)
    t_detect = _time.perf_counter() - t0
    Log.info(f"infer_box: {len(catalog)} detected sources, method={method} "
             f"(detect {t_detect:.2f}s)")
    if not catalog:
        return []
    if box is not None:
        pos = np.array([ce.pos for ce in catalog])
        targets = [i for i in range(len(catalog))
                   if box.contains(pos[i, 0], pos[i, 1])]
    else:
        targets = None
    t1 = _time.perf_counter()
    if method == "joint_vi":
        out = one_node_joint_infer(catalog, images, targets, config,
                                   active_boxes=active_boxes)
    elif method == "single_vi":
        out = one_node_single_infer(catalog, images, targets, config,
                                    active_boxes=active_boxes)
    elif method == "svi":
        out = one_node_svi_infer(catalog, images, targets, config,
                                 active_boxes=active_boxes)
    elif method == "mcmc":
        from ..mcmc.infer import one_node_mcmc_infer
        out = one_node_mcmc_infer(catalog, images, targets, config)
    else:
        raise ValueError(f"unknown method {method!r}")
    Log.info(f"infer_box: inferred {len(out)} sources "
             f"in {_time.perf_counter() - t1:.2f}s")
    return out
