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
from ..models.patches import stack_patches, make_patch_for_source
from ..models.psf import get_psf_width
from ..ops.newton import NewtonConfig
from ..utils import log as Log
from ..utils import telemetry
from ..utils.config import Config
from ..vi.elbo import source_moment_grids
from ..vi.init import catalog_init_source, generic_init_source
from ..vi.optimize import fit_sources, fit_sources_compacted
from .partition import partition_cyclades_dynamic

TILE_BUCKETS = (16, 32, 64, 128)
MAX_PATCH_RADIUS = 25.0


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
    image (imaged_sources.jl:232-244)."""
    S = len(catalog)
    centers = np.array([[img.world_to_pix(ce.pos) for img in images]
                        for ce in catalog])  # (S, N, 2)
    nb = {s: [] for s in range(S)}
    for i in range(S):
        for j in range(i + 1, S):
            d = np.abs(centers[i] - centers[j])     # (N, 2)
            if np.any(np.all(d <= radii[i] + radii[j], axis=1)):
                nb[i].append(j)
                nb[j].append(i)
    return nb


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


class InferenceState:
    """Host-side state for one sky box: catalog, per-source patches (bucketed
    by tile size), variational params, neighbor map."""

    def __init__(self, catalog, images, config: Config,
                 target_sources=None, max_neighbors=8):
        self.catalog = catalog
        self.images = images
        self.config = config
        S = len(catalog)
        self.targets = (list(range(S)) if target_sources is None
                        else list(target_sources))
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

    def patch(self, s):
        """Per-source SkyPatch, built on first use and cached."""
        if s not in self._patches:
            p = make_patch_for_source(self.images, self.catalog[s].pos,
                                      radius=self.radii[s],
                                      tile_size=int(self.tile[s]))
            self._patches[s] = p
            self._pixel_counts[s] = int(np.asarray(p.mask).sum())
        return self._patches[s]

    def stacked_patches(self, idx_p):
        """Device-stacked SkyPatch for a padded group, cached across
        sweeps (host telemetry pixel counts ride along so no device mask
        ever needs transferring back)."""
        key = tuple(idx_p)
        if key not in self._stacked:
            patches = stack_patches([self.patch(s) for s in idx_p])
            counts = np.array([self._pixel_counts[s] for s in idx_p])
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
                       bg_vps=None, fresh_init=False, keep_better=False):
        """Dispatch one batched launch over sources `idx` (same tile size),
        padded to a power of two, WITHOUT waiting for the device. Returns a
        pending record for finish_group, or None. Neighbor background is
        rendered from `bg_vps` (default: the live, freshest self.vps —
        snapshotted at dispatch time by the device upload).

        fresh_init: fit from generic_init_source instead of the warm vps —
        the restart pass against stale-background basin lock-in (see
        one_node_joint_infer).
        keep_better: only accept lanes whose new ELBO beats the stored one.
        The comparison is exact when the neighbor background is unchanged
        between the two fits; during a restart sweep neighbors fitted in
        earlier classes may have moved slightly since the stored ELBO was
        computed, so the comparison is approximate to that (small,
        post-convergence) drift.
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
        pad = max(_next_pow2(n), floor)
        idx_p = list(idx) + [idx[0]] * (pad - n)
        t0 = telemetry.now()
        patches, pixel_counts = self.stacked_patches(idx_p)
        if fresh_init:
            vp0 = jnp.asarray(np.stack(
                [generic_init_source(self.catalog[s].pos) for s in idx_p]))
        else:
            vp0 = jnp.asarray(self.vps[idx_p])
        # Large waves get the staged-compaction driver (per-lane exact, see
        # vi/optimize.fit_sources_compacted) — the all-lane-converged tail
        # costs most when the batch is wide. Small waves stay single-launch
        # (the extra stage-boundary sync outweighs the tail).
        fit = fit_sources if pad < 256 else partial(
            fit_sources_compacted, stage1_refreshes=10)
        try:
            if use_bg:
                src = self.vps if bg_vps is None else bg_vps
                nb_vps = jnp.asarray(src[self.nb_idx[idx_p]])
                nb_mask = jnp.asarray(self.nb_mask[idx_p])
                bg_E, bg_V = _render_neighbor_bg(nb_vps, nb_mask, patches)
                res = fit(vp0, patches, bg_E, bg_V, config=newton_config)
            else:
                res = fit(vp0, patches, config=newton_config)
        except Exception as exc:
            # Production semantics: log the failed launch and keep the
            # sources at their previous state (ParallelRun.jl:390-396,
            # :589-595 catch-log-continue; dev mode rethrows).
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            return None
        return dict(idx=idx, n=n, pad=pad, res=res, t0=t0,
                    pixel_counts=pixel_counts, keep_better=keep_better,
                    pixels_per_lane_total=int(np.prod(patches.mask.shape[1:])),
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
        try:
            vp = np.asarray(res.vp)[:n]
            elbo = np.asarray(res.elbo)[:n]
            conv = np.asarray(res.converged)[:n]
            iters = np.asarray(res.iters)[:n]
            f_calls = np.asarray(res.f_calls)
        except Exception as exc:
            # Runtime failures of an async launch surface at the transfer.
            if not is_production_run():
                raise
            Log.exception(exc)
            telemetry.counters.failures += len(idx)
            return
        telemetry.record_launch_wall(pending["t0"], pending["label"])
        idxa = np.asarray(idx)
        if pending["keep_better"]:
            take = elbo > self.elbos[idxa]
            idxa = idxa[take]
            vp, elbo, conv = vp[take], elbo[take], conv[take]
        self.vps[idxa] = vp
        self.elbos[idxa] = elbo
        self.converged[idxa] = conv
        self.iters[np.asarray(idx)] += iters
        telemetry.record_fit_launch(
            n, pending["pad"] - n,
            pixels_per_lane_real=pending["pixel_counts"][:n],
            pixels_per_lane_total=pending["pixels_per_lane_total"],
            f_calls=f_calls)

    def fit_group(self, idx, newton_config: NewtonConfig, use_bg=True,
                  bg_vps=None, fresh_init=False, keep_better=False):
        """Dispatch one group and wait for it (see dispatch_group)."""
        self.finish_group(self.dispatch_group(
            idx, newton_config, use_bg=use_bg, bg_vps=bg_vps,
            fresh_init=fresh_init, keep_better=keep_better))


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


def one_node_joint_infer(catalog, images, target_sources=None,
                         config=Config(), batch_size=None,
                         newton_config=NewtonConfig(), max_neighbors=8,
                         seed=42, state=None, checkpoint_path=None,
                         restart_final=True):
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
    and keep whichever fit has the better ELBO. Warm starts lock a source
    into the basin it chose while its neighbors were still unfit (a true
    star overlapping another star absorbs its light in iteration 1, flips
    to the galaxy basin, and no later warm-started Newton pass escapes —
    measured +492 nats and the correct type from the restart on the
    overlapping_stars GalSim scene). The reference's joint driver has the
    same lock-in and no restart; this is a strict improvement."""
    import os

    st = state or InferenceState(catalog, images, config, target_sources,
                                 max_neighbors)
    targets = st.targets
    tset = set(targets)
    nb_for_targets = {s: [n for n in st.neighbor_map[s] if n in tset]
                      for s in targets}
    rng = np.random.default_rng(seed)
    if batch_size is None:
        # TPU-default schedule: conflict-free color classes, widest first.
        sweeps = [color_classes(targets, nb_for_targets, rng)]
        Log.info(f"joint infer: {len(targets)} sources, "
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

    def fit_class(cls, **kw):
        # The tile-bucket groups of one class are mutually conflict-free:
        # dispatch them all, then collect — host prep and device->host
        # transfers overlap with device compute instead of paying one
        # blocking round trip per bucket.
        pend = [st.dispatch_group([s for s in cls if st.tile[s] == P],
                                  newton_config, use_bg=True, **kw)
                for P in TILE_BUCKETS]
        for p in pend:
            st.finish_group(p)

    telemetry.counters.reset()
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
        for groups in sweeps:
            for cls in groups:
                fit_class(cls, fresh_init=True, keep_better=True)
    telemetry.counters.report("joint infer")
    return _collect_results(st)


def one_node_single_infer(catalog, images, target_sources=None,
                          config=Config(), newton_config=NewtonConfig(),
                          max_neighbors=8, state=None):
    """Independent per-source fits with neighbors fixed at their catalog
    initialization (ParallelRun.jl:546-607 + process_source :468-498)."""
    st = state or InferenceState(catalog, images, config, target_sources,
                                 max_neighbors)
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
    (ParallelRun.jl:652-673). method: joint_vi | single_vi | mcmc.

    Phase wall times (detect / infer incl. collect) are logged, mirroring
    the reference's box-level @time reporting (ParallelRun.jl:655-669)."""
    import time as _time

    t0 = _time.perf_counter()
    if catalog is None:
        catalog, _ = detect_sources(images, **detect_kwargs)
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
        out = one_node_joint_infer(catalog, images, targets, config)
    elif method == "single_vi":
        out = one_node_single_infer(catalog, images, targets, config)
    elif method == "mcmc":
        from ..mcmc.infer import one_node_mcmc_infer
        out = one_node_mcmc_infer(catalog, images, targets, config)
    else:
        raise ValueError(f"unknown method {method!r}")
    Log.info(f"infer_box: inferred {len(out)} sources "
             f"in {_time.perf_counter() - t1:.2f}s")
    return out
