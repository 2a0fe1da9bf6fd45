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

from functools import partial

import jax.numpy as jnp
import numpy as np

from ..detection.detect import detect_sources
from ..models.patches import stack_patches
from ..ops.newton import NewtonConfig
from ..utils import log as Log
from ..utils import telemetry
from ..utils.config import Config
from ..vi.elbo import elbo
from ..vi.init import generic_init_source
from ..vi.optimize import fit_sources, fit_sources_compacted
from .partition import partition_cyclades_dynamic
from .common import (BASIN_MARGIN_REL, MAX_PATCH_RADIUS,  # noqa: F401
                     TILE_BUCKETS, _beats, _elbo_values, _next_pow2,
                     _render_neighbor_bg, _tile_for_radius,
                     is_production_run)
from .fused import (_fused_joint_dispatch, _fused_joint_finish,  # noqa: F401
                    _fused_joint_program, _fused_wide_pass)
from .packing import (_dual_chunk_cap, _lane_step_cost,  # noqa: F401
                      _pow2_chunks, _try_color_capped, _waves,
                      color_classes, fused_bucket_widths,
                      fused_color_classes)
from .state import (InferenceState, OptimizedSource,  # noqa: F401
                    choose_patch_radius, detection_active_boxes,
                    find_neighbors, patch_radii)

def _platform_newton_config(newton_config: NewtonConfig):
    """TPU fast-path solver selection: the default "eig" TR solver's XLA
    eigh custom call is ~49% of fit device time and its cost is mostly
    batch-independent serial depth — the Pallas systolic-Jacobi solver
    (tr_solver="pjacobi", ops/pallas_eigh.py) measured 877 vs 553 fits/s
    on the headline bench at identical trajectory quality. Applied only
    when the caller left the default solver, only on TPU (CPU — the f64
    parity platform — keeps eig; pjacobi's batched rule falls back to
    XLA eigh there anyway). CELESTE_TR_SOLVER overrides for A/Bs."""
    import os

    import jax

    grad = os.environ.get("CELESTE_GRAD_MODE", "")
    if grad:
        newton_config = newton_config._replace(grad_mode=grad)
    # Fused refresh kernel (ops/pallas_refresh.py): default on TPU when the
    # caller left the default, CELESTE_REFRESH_KERNEL overrides for A/Bs.
    refresh = os.environ.get("CELESTE_REFRESH_KERNEL", "")
    if refresh:
        newton_config = newton_config._replace(refresh_kernel=refresh)
    elif (newton_config.refresh_kernel == "xla"
            and jax.default_backend() == "tpu"):
        newton_config = newton_config._replace(refresh_kernel="pallas")
    # TR-subproblem kernel (ops/pallas_tr.py): measured a wash in round 4
    # when the secular scan hid behind the refresh's DMA traffic; with the
    # fused refresh kernel that traffic is gone and the kernel is a real
    # win (1015.1 vs 969.8 fits/s same session). CELESTE_TR_KERNEL
    # overrides.
    trk = os.environ.get("CELESTE_TR_KERNEL", "")
    if trk:
        newton_config = newton_config._replace(tr_kernel=trk)
    elif (newton_config.tr_kernel == "xla"
            and jax.default_backend() == "tpu"):
        newton_config = newton_config._replace(tr_kernel="pallas")
    override = os.environ.get("CELESTE_TR_SOLVER", "")
    if override:
        return newton_config._replace(tr_solver=override,
                                      jacobi_max_sweeps=4)
    if (newton_config.tr_solver == "eig"
            and jax.default_backend() == "tpu"):
        return newton_config._replace(tr_solver="pjacobi",
                                      jacobi_max_sweeps=4)
    return newton_config


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


def _probe_config(restart_cfg: NewtonConfig, config: Config):
    """Probe (wide fresh-init basin-escape pass) NewtonConfig: the
    caller's solver at Config.probe_refreshes Hessian-refresh budget
    (0 = full). CELESTE_PROBE_CAP overrides for A/Bs."""
    import os

    try:
        cap = int(os.environ.get("CELESTE_PROBE_CAP", "-1"))
    except ValueError:
        Log.info("CELESTE_PROBE_CAP is not an integer; ignoring")
        cap = -1
    if cap < 0:
        cap = config.probe_refreshes
    if cap and cap < restart_cfg.max_iters:
        return restart_cfg._replace(max_iters=cap)
    return restart_cfg


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

    newton_config = _platform_newton_config(newton_config)
    step_config = _capped_step_config(newton_config, config)
    restart_cfg = _probe_config(newton_config, config)  # bisect/48 probe
    polish_cfg, n_polish = _polish_config(newton_config, config)
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

    def fit_class(cls, widths, cfg=None, **kw):
        # The tile-bucket groups of one class are mutually conflict-free:
        # dispatch them all, then collect — host prep and device->host
        # transfers overlap with device compute instead of paying one
        # blocking round trip per bucket. Widths come from the SAME
        # helper as the fused staging (packing.fused_bucket_widths) so
        # both paths compile identical launch shapes.
        pend = [st.dispatch_group([s for s in cls if st.tile[s] == P],
                                  cfg or step_config, use_bg=True,
                                  width=widths.get(P), **kw)
                for P in TILE_BUCKETS]
        for p in pend:
            st.finish_group(p)

    if not isolated_done:
        telemetry.counters.reset()
    if batch_size is None and not isolated_done and cursor == 0:
        fit_isolated()
    tile_of = lambda s: int(st.tile[s])
    w_by_groups = [fused_bucket_widths(groups, tile_of) for groups in sweeps]
    step = 0
    for it in range(config.num_joint_vi_iters):
        for groups, widths in zip(sweeps, w_by_groups):
            step += 1
            if step <= cursor:
                continue
            for cls in groups:
                fit_class(cls, widths)
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
            for groups, widths in zip(sweeps, w_by_groups):
                for cls in groups:
                    fit_class(cls, widths, cfg=polish_cfg)
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
    newton_config = _platform_newton_config(newton_config)
    states, classes, isolated = _merged_states_classes(
        fields, config, max_neighbors, seed)
    step_config = _capped_step_config(newton_config, config)
    restart_cfg = _probe_config(newton_config, config)  # bisect/48 probe
    polish_cfg, n_polish = _polish_config(newton_config, config)
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


def _fit_isolated_multi(states, isolated, newton_config):
    """Fit merged isolated targets (no target-neighbors) across fields as
    wide compacted launches per tile bucket — the widest-launch shape
    (bench.py's machine), at the FULL single-fit budget. Non-target
    neighbors still enter as fixed catalog-init background. Results are
    applied to each field's InferenceState.

    Launch widths are platform-aware. On TPU, lanes are width-parallel:
    pow2 chunks with a >=32-lane pad floor keep the compile-key set tiny
    and pads cost ~nothing. On CPU (the accuracy/parity platform), every
    pad lane costs a full serial fit — the 32-lane floor made a GalSim
    single-source scene (1 member, 2 dual-init lanes, 30 pads at P=128)
    take 110-124 s of busy for ~7 s of useful work, utilization 2.4%
    (benchmark/galsim_results.md round 4). CPU therefore launches each
    member separately (2 dual lanes, zero pads). Per-member launches also
    make per-field and merged multi-field runs bit-exact by construction
    on CPU (identical per-source programs), which the >=32 shared floor
    only achieved while every call's lane count stayed under the floor."""
    if not isolated:
        return
    import jax

    cpu = jax.default_backend() == "cpu"
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
        # 32-lane floor on TPU (stable compile keys, pads width-parallel);
        # zero-pad per-member launches on CPU (see the function docstring)
        pad = _next_pow2(nl) if cpu else max(_next_pow2(nl), 32)
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
        chunks = ([[m] for m in group] if cpu else
                  _pow2_chunks(group, cap=_dual_chunk_cap(t)))
        for members in chunks:
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
    newton_config = _platform_newton_config(newton_config)
    step_config = _capped_step_config(newton_config, config)
    restart_cfg = _probe_config(newton_config, config)  # bisect/48 probe
    polish_cfg, n_polish = _polish_config(newton_config, config)

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
    newton_config = _platform_newton_config(newton_config)
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
