"""SVI vs Newton-VI: accuracy and throughput on the same synthetic field.

The reference's StochasticVI.jl is an empty stub (StochasticVI.jl:1-3);
this framework implements real pixel-minibatch SVI (vi/stochastic.py) and
exposes it as a driver method. This artifact answers: where does
pixel-minibatching win over the Newton trust-region fits?

Workload: one detected synthetic field, fit twice through the SAME driver
machinery — infer_box(method="svi") vs infer_box(method="single_vi") (both
independent per-source fits against catalog-init neighbor backgrounds, so
the comparison isolates the optimizer). Accuracy is scored against the
generating truth. A second sweep varies SVI's pixel_fraction.

Prints one JSON line per configuration and writes benchmark/svi_results.md.
Env: SVI_SOURCES (default 128), SVI_SIZE (default 512), SVI_SEED (7),
SVI_STEPS (500), SVI_REPEAT (2; pass 0 pays compiles).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SOURCES = int(os.environ.get("SVI_SOURCES", "128"))
SIZE = int(os.environ.get("SVI_SIZE", "512"))
SEED = int(os.environ.get("SVI_SEED", "7"))
STEPS = int(os.environ.get("SVI_STEPS", "500"))
REPEAT = int(os.environ.get("SVI_REPEAT", "2"))


def main():
    import numpy as np

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    from celeste_jl_tpu.detection.detect import detect_sources
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.parallel.run import (InferenceState,
                                             detection_active_boxes,
                                             one_node_single_infer,
                                             one_node_svi_infer)
    from celeste_jl_tpu.synthetic import (gen_images_fast, make_blank_images,
                                          sample_galaxy, sample_star)
    from celeste_jl_tpu.utils import telemetry
    from celeste_jl_tpu.utils.config import Config
    from celeste_jl_tpu.vi.stochastic import SVIConfig

    margin = 16.0
    rng = np.random.default_rng(SEED)
    truth, n_star = [], N_SOURCES // 2
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
    gen_images_fast(images, truth, seed=SEED)

    catalog, det_boxes = detect_sources(images, thresh=6.0,
                                        boxsize=(SIZE, SIZE),
                                        match_radius_deg=1.0)
    active = detection_active_boxes(catalog, det_boxes, images)
    cfg = Config()

    def score(results):
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
        nm = int(matched.sum())
        return (nm, type_ok / max(nm, 1),
                float(np.median(errs)) if errs else None,
                float(np.mean([r.elbo for r in results])))

    import jax
    rows = []
    cases = ([("single_vi", None)]
             + [("svi", SVIConfig(steps=STEPS, pixel_fraction=pf))
                for pf in (1.0, 0.5, 0.25)])
    for rep in range(REPEAT):
        for method, svi_cfg in cases:
            telemetry.counters.reset()
            t0 = time.time()
            if method == "svi":
                res = one_node_svi_infer(catalog, images, config=cfg,
                                         svi_config=svi_cfg,
                                         active_boxes=active)
            else:
                res = one_node_single_infer(catalog, images, config=cfg,
                                            active_boxes=active)
            wall = time.time() - t0
            nm, acc, med_err, mean_elbo = score(res)
            c = telemetry.counters
            row = {
                "metric": "svi_vs_newton",
                "method": method,
                "pixel_fraction": (svi_cfg.pixel_fraction if svi_cfg
                                   else None),
                "steps": svi_cfg.steps if svi_cfg else None,
                "sources": len(catalog),
                "n_matched": nm,
                "type_accuracy": round(acc, 3),
                "median_flux_relerr": (round(med_err, 4)
                                       if med_err is not None else None),
                "mean_elbo": round(mean_elbo, 1),
                "wall_s": round(wall, 2),
                "sources_per_sec": round(len(catalog) / wall, 2),
                "device_busy_s": round(c.busy_s(), 2),
                "device_sources_per_sec": (round(len(catalog) / c.busy_s(),
                                                 2) if c.busy_s() else None),
                "backend": jax.default_backend(),
                "pass": rep,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "svi_results.md")
    warm = [r for r in rows if r["pass"] == REPEAT - 1]
    with open(md, "w") as f:
        f.write("# SVI vs Newton-VI (same field, same driver)\n\n"
                f"`python benchmark/run_svi_compare.py` with "
                f"SVI_SOURCES={N_SOURCES} SVI_SIZE={SIZE} "
                f"SVI_STEPS={STEPS}; warm pass (compiles paid):\n\n"
                "| method | pix frac | type acc | med flux err "
                "| mean ELBO | src/s (e2e) | src/s (device) |\n"
                "|---|---|---|---|---|---|---|\n")
        for r in warm:
            f.write(f"| {r['method']} | {r['pixel_fraction'] or '-'} "
                    f"| {r['type_accuracy']} | {r['median_flux_relerr']} "
                    f"| {r['mean_elbo']} | {r['sources_per_sec']} "
                    f"| {r['device_sources_per_sec']} |\n")
        f.write("\nFull JSON rows:\n\n```json\n"
                + "\n".join(json.dumps(r) for r in rows) + "\n```\n")


if __name__ == "__main__":
    main()
