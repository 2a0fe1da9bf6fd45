"""Multi-field fused-launch benchmark: the box-farm occupancy test.

Synthesizes M independent survey fields (each too sparse to fill the fused
program's lanes on its own), detects sources per field, and infers ALL
fields as ONE merged fused launch (`parallel/run.joint_infer_fields` —
cross-field lateral class merging). Reference analog: the box-level task
farm (contrib/nersc/infer.sl:30 x ParallelRun.jl:302-369), which never
shared a thread pool across boxes.

Reports device-side fits/s (telemetry: sources_fit / summed launch wall) —
the occupancy headline — plus end-to-end sources/s and accuracy per field.

Prints one JSON line and writes benchmark/multifield_results.md.
Env: MF_FIELDS (default 8), MF_SOURCES (per field, default 128),
MF_SIZE (default 512), MF_SEED (default 7), MF_REPEAT (default 2; the
first pass pays one-time program load/compile, later passes are the
long-lived farm-worker number).

MF_PIPELINE=1 switches to the double-buffered farm pipeline
(`joint_infer_fields_pipelined`): fields arrive as a LAZY stream of
MF_GROUP-field groups (default 2), so each group's synthesis + detection +
host staging overlaps the previous group's in-flight device launch — the
farm-worker e2e number. The non-pipelined mode stages everything first and
measures one merged launch — the device-occupancy number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("MF_FIELDS", "8"))
N_SOURCES = int(os.environ.get("MF_SOURCES", "128"))
SIZE = int(os.environ.get("MF_SIZE", "512"))
SEED = int(os.environ.get("MF_SEED", "7"))
REPEAT = int(os.environ.get("MF_REPEAT", "2"))
PIPELINE = os.environ.get("MF_PIPELINE", "0") == "1"
GROUP = int(os.environ.get("MF_GROUP", "2"))


def main():
    import numpy as np

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    from celeste_jl_tpu.detection.detect import detect_sources
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.parallel.run import (detection_active_boxes,
                                             joint_infer_fields,
                                             joint_infer_fields_pipelined)
    from celeste_jl_tpu.synthetic import (gen_images_fast, make_blank_images,
                                          sample_galaxy, sample_star)
    from celeste_jl_tpu.utils import telemetry
    from celeste_jl_tpu.utils.config import Config

    margin = 16.0
    n_star = N_SOURCES // 2

    def make_field(seed):
        rng = np.random.default_rng(seed)
        truth = []
        pos = margin + rng.random((N_SOURCES, 2)) * (SIZE - 2 * margin)
        for i in range(N_SOURCES):
            p = tuple(pos[i])
            if i < n_star:
                truth.append(sample_star(pos=p, r_flux=float(
                    np.exp(rng.normal(3.0, 0.6)))))
            else:
                truth.append(sample_galaxy(
                    pos=p, r_flux=float(np.exp(rng.normal(3.2, 0.5))),
                    gal_radius_px=float(np.exp(rng.normal(0.7, 0.3))),
                    gal_axis_ratio=float(rng.uniform(0.25, 0.9)),
                    gal_angle=float(rng.uniform(0.0, np.pi))))
        images = make_blank_images(H=SIZE, W=SIZE, sky_nmgy=0.05,
                                   nelec_per_nmgy=800.0)
        gen_images_fast(images, truth, seed=seed)
        return images, truth

    def score(results, truth):
        from scipy.spatial import cKDTree
        tpos = np.array([t.pos for t in truth])
        rpos = np.array([r.init_pos for r in results])
        dist, nearest = cKDTree(tpos).query(rpos, k=1)
        matched = dist < 2.0
        type_ok, errs = 0, []
        for r, t_i, m in zip(results, nearest, matched):
            if not m:
                continue
            t = truth[t_i]
            p_star = r.vs[ids.is_star[0]]
            type_ok += int((p_star > 0.5) == t.is_star)
            tf = (t.star_fluxes if t.is_star else t.gal_fluxes)[2]
            j = 0 if p_star > 0.5 else 1
            f = float(np.exp(r.vs[ids.flux_loc[j]]
                             + 0.5 * r.vs[ids.flux_scale[j]]))
            errs.append(abs(f - tf) / tf)
        return int(matched.sum()), type_ok / max(int(matched.sum()), 1), errs

    out = {}
    for rep in range(REPEAT):
        # Same fields every pass: pass 0 pays the compiles, later passes
        # time the SAME program warm (different seeds drew layouts whose
        # class counts crossed power-of-two pads — a fresh compile that
        # made "warm" passes cold).
        base = SEED
        t_detect_box = [0.0]

        def build_field(f):
            images, truth = make_field(base + 1000 * f)
            td = time.time()
            catalog, det_boxes = detect_sources(
                images, thresh=6.0, boxsize=(SIZE, SIZE),
                match_radius_deg=1.0)
            t_detect_box[0] += time.time() - td
            active = (detection_active_boxes(catalog, det_boxes, images)
                      if catalog else None)
            return {"catalog": catalog, "images": images,
                    "active_boxes": active}, truth

        if PIPELINE:
            # lazy group stream: synth+detect+staging of group k+1 runs
            # while group k's launch is in flight on the chip
            truths = []

            def groups():
                for g0 in range(0, M, GROUP):
                    grp = []
                    for f in range(g0, min(g0 + GROUP, M)):
                        field, truth = build_field(f)
                        grp.append(field)
                        truths.append(truth)
                    yield grp

            telemetry.counters.reset()
            t1 = time.time()
            per_field = []
            for res in joint_infer_fields_pipelined(groups(),
                                                    config=Config()):
                per_field.extend(res)
            wall = time.time() - t1  # INCLUDES overlapped synth+detect
            t_synth_detect = wall
        else:
            fields, truths = [], []
            t0 = time.time()
            for f in range(M):
                field, truth = build_field(f)
                fields.append(field)
                truths.append(truth)
            t_synth_detect = time.time() - t0

            t1 = time.time()
            per_field = joint_infer_fields(fields, config=Config())
            wall = time.time() - t1
        t_detect = t_detect_box[0]
        c = telemetry.counters
        fits, util = c.sources_fit, c.utilization()
        # device-busy wall = UNION of launch-pending intervals: the summed
        # per-launch walls double-count overlap (the isolated launches queue
        # behind the in-flight fused program — see telemetry docstring)
        launch_s, launch_sum_s = c.busy_s(), c.launch_s
        achieved_fl, mfu_frac = c.mfu()

        n_det = n_match = 0
        accs, all_errs = [], []
        for res, truth in zip(per_field, truths):
            nm, acc, errs = score(res, truth)
            n_det += len(res)
            n_match += nm
            accs.append(acc)
            all_errs.extend(errs)

        import jax
        # pipeline mode: launch walls overlap next-group host staging, so
        # device fits/s is not meaningful there — e2e is the headline
        out = {
            "metric": ("multifield_pipelined_e2e_sources_per_sec"
                       if PIPELINE else "multifield_device_fits_per_sec"),
            "value": (round(n_det / wall, 2) if PIPELINE else
                      round(fits / launch_s, 1) if launch_s else None),
            "unit": "sources/s" if PIPELINE else "fits/s",
            "fields": M,
            "sources_per_field": N_SOURCES,
            "n_true": M * N_SOURCES,
            "n_detected": n_det,
            "n_matched": n_match,
            "completeness": round(n_match / (M * N_SOURCES), 3),
            "type_accuracy": round(float(np.mean(accs)), 3),
            "median_flux_relerr": (round(float(np.median(all_errs)), 4)
                                   if all_errs else None),
            "fits": fits,
            "device_busy_s": round(launch_s, 2),
            "launch_wall_sum_s": round(launch_sum_s, 2),
            # catalog throughput device-side: detected sources per second
            # of summed launch wall — the honest farm number now that
            # isolated targets are fit once instead of riding all
            # (sweeps + restart) passes as identity re-fits
            "device_sources_per_sec": (round(n_det / launch_s, 2)
                                       if launch_s else None),
            "utilization": round(util, 3),
            # model-FLOP accounting of the useful fit work over summed
            # launch wall (utils/flops.py; MFU vs the chip's bf16 peak)
            "achieved_model_gflops_per_s": round(achieved_fl / 1e9, 1),
            "mfu": (round(mfu_frac, 6) if mfu_frac is not None else None),
            # serialized depth: sum over class-steps of max-lane TR steps —
            # what the device executes end to end (vmapped while_loops run
            # to the slowest lane); mean iters per fit for contrast
            "serial_tr_steps": c.serial_steps,
            "mean_iters_per_fit": (round(c.newton_iters / fits, 1)
                                   if fits else None),
            "converged_frac": round(float(np.mean(
                [r.converged for res in per_field for r in res])), 3),
            "e2e_sources_per_sec": round(n_det / wall, 2),
            "infer_wall_s": round(wall, 1),
            "detect_wall_s": round(t_detect, 1),
            "synth_plus_detect_wall_s": round(t_synth_detect, 1),
            "backend": jax.default_backend(),
            "pass": rep,
        }
        if PIPELINE:
            out["pipeline"] = True
            out["group_fields"] = GROUP
        print(json.dumps(out), flush=True)

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multifield_results.md")
    if PIPELINE:
        with open(md, "a") as f:
            f.write("\n## Pipelined farm-worker mode (MF_PIPELINE=1)\n\n"
                    "Lazy group stream: group k+1's synth+detect+staging "
                    "overlaps group k's in-flight launch; `infer_wall_s` "
                    "INCLUDES the (overlapped) synth+detect. Last (warm) "
                    f"pass with MF_FIELDS={M} MF_GROUP={GROUP} "
                    f"MF_SOURCES={N_SOURCES} MF_SIZE={SIZE}:\n\n```json\n"
                    + json.dumps(out, indent=2) + "\n```\n")
    else:
        with open(md, "w") as f:
            f.write("# Multi-field fused-launch run (farm-worker "
                    "occupancy)\n\n"
                    "Last (warm) pass of `python benchmark/run_multifield.py`"
                    f" with MF_FIELDS={M} MF_SOURCES={N_SOURCES}"
                    f" MF_SIZE={SIZE}:\n\n```json\n"
                    + json.dumps(out, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
