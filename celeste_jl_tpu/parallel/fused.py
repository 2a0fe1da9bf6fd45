"""Fused joint-VI device programs: the ENTIRE sweep/probe/polish schedule
as chained XLA programs with per-tile-bucket lane grids, plus the host
staging/dispatch/finish machinery. Split out of parallel/run.py; see
one_node_joint_infer there for the driver and _wide_pass_host for the
host-driven bit-exactness mirror.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.patches import stack_patches
from ..ops.newton import NewtonConfig
from ..utils import log as Log
from ..utils import telemetry
from ..vi.elbo import elbo
from ..vi.init import generic_init_source
from ..vi.optimize import FitResult, fit_sources, maximize
from .common import (_beats, _elbo_values, _next_pow2, _render_neighbor_bg,
                     is_production_run, pad_floor)
from .packing import fused_bucket_widths

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
            # the SAME jitted entry points as the host-driven
            # dispatch_group launches (vi/optimize.fit_sources,
            # common._elbo_values): fused/host bit-exactness holds by
            # construction (one pjit program serves both), and the trace
            # of the full fit is built ONCE per (W, B, P, P) shape per
            # process instead of being re-inlined into every bucket of
            # every program of every box — host tracing of the chained
            # fused programs measured 300+ s per field otherwise
            # (tools/xplane_summary.py on a warm field run).
            res = fit_sources(vp0, pc, bg_E, bg_V, config=config)
            inc = _elbo_values(vps[src], pc, bg_E, bg_V)
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
            # shared jitted entry points — see bucket_step for why
            res = fit_sources(vp0, pc, bg_E, bg_V, config=config)
            inc = _elbo_values(snapshot[src], pc, bg_E, bg_V)
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

    # per-bucket widths + staging budget (each bucket stages at ITS tile).
    # Widths come from the SAME helper as the host-driven per-class
    # launches (packing.fused_bucket_widths) — the compiled-width
    # invariant behind fused/host bit-exactness.
    grp = {t: [[m for m in cls if tile_of[m] == t] for cls in classes]
           for t in tiles}
    widths = fused_bucket_widths(classes, lambda m: tile_of[m])
    uniq_t, W_t, T_t = {}, {}, {}
    est_bytes = 0
    for t in tiles:
        uniq_t[t] = sorted({m for g in grp[t] for m in g})
        n_t = len(uniq_t[t])
        W = widths[t]
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
        # same pad rule incl. the platform-aware pad_floor so the
        # host-path mirror compiles the same launch widths —
        # tests/test_infer.py exactness)
        W_w = max(_next_pow2(len(uniq)), pad_floor(n_targets))
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
