"""End-to-end field-scale benchmark: detection -> joint VI on one device.

Synthesizes a survey-field-sized scene (prior-drawn stars and galaxies on
5-band tiles), then runs the FULL production path — background estimation,
source detection, Cyclades partitioning, batched joint VI with neighbor
backgrounds and the final restart pass — and scores the recovered catalog
against the truth. This is the BASELINE.md "one field end-to-end" config;
`bench.py` measures only the batched-fit kernel.

Prints a JSON summary line and writes benchmark/field_results.md.

Env: FIELD_SOURCES (default 128), FIELD_SIZE (default 512),
FIELD_SEED (default 7), FIELD_BATCH_SIZE (set to a Cyclades batch size to
run the reference's batch/wave schedule instead of the fused coloring
schedule; CELESTE_FUSED=0 for the host-driven coloring schedule). Runs on
whatever backend JAX picks (the real TPU chip under axon; force
JAX_PLATFORMS=cpu for a CPU run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SOURCES = int(os.environ.get("FIELD_SOURCES", "128"))
SIZE = int(os.environ.get("FIELD_SIZE", "512"))
SEED = int(os.environ.get("FIELD_SEED", "7"))
# FIELD_REPEAT > 1 simulates a long-lived farm worker: later fields reuse
# the process's loaded programs (the first field pays one-time cache
# deserialization per launch shape)
REPEAT = int(os.environ.get("FIELD_REPEAT", "1"))


def main():
    import numpy as np

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    from celeste_jl_tpu.models.image import CatalogEntry
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.parallel.run import infer_box
    from celeste_jl_tpu.synthetic import (gen_images_fast, make_blank_images,
                                          sample_galaxy, sample_star)
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
        """Match recovered sources to truth by position (identity WCS: px
        units) and score type/flux accuracy."""
        from scipy.spatial import cKDTree
        tpos = np.array([t.pos for t in truth])
        rpos = np.array([r.init_pos for r in results])
        dist, nearest = cKDTree(tpos).query(rpos, k=1)
        matched = dist < 2.0
        type_ok = 0
        errs = []
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
        n_match = int(matched.sum())
        return n_match, type_ok / max(n_match, 1), errs

    walls, accs, all_errs, n_det, n_match = [], [], [], 0, 0
    prof_dir = os.environ.get("FIELD_PROFILE", "")
    import contextlib
    for rep in range(REPEAT):
        images, truth = make_field(SEED + 1000 * rep)
        prof = contextlib.nullcontext()
        if prof_dir and rep == REPEAT - 1:
            import jax
            prof = jax.profiler.trace(prof_dir)
        t0 = time.time()
        with prof:
            bs = os.environ.get("FIELD_BATCH_SIZE")
            if bs:
                from celeste_jl_tpu.detection.detect import detect_sources
                from celeste_jl_tpu.parallel.run import one_node_joint_infer
                catalog, _ = detect_sources(images, thresh=6.0,
                                            boxsize=(SIZE, SIZE),
                                            match_radius_deg=1.0)
                results = one_node_joint_infer(catalog, images,
                                               config=Config(),
                                               batch_size=int(bs))
            else:
                results = infer_box(images, method="joint_vi",
                                    config=Config(), thresh=6.0,
                                    boxsize=(SIZE, SIZE),
                                    match_radius_deg=1.0)
        walls.append(time.time() - t0)
        nm, acc, errs = score(results, truth)
        n_det += len(results)
        n_match += nm
        accs.append(acc)
        all_errs.extend(errs)
    wall = walls[-1]

    import jax
    out = {
        "metric": "field_e2e_sources_per_sec",
        "value": round(len(results) / wall, 2),
        "unit": "sources/s",
        "n_true": N_SOURCES * REPEAT,
        "n_detected": n_det,
        "n_matched": n_match,
        "completeness": round(n_match / (N_SOURCES * REPEAT), 3),
        "type_accuracy": round(float(np.mean(accs)), 3),
        "type_accuracy_per_field": [round(a, 3) for a in accs],
        "median_flux_relerr": (round(float(np.median(all_errs)), 4)
                               if all_errs else None),
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
        "walls_per_field_s": [round(w, 1) for w in walls],
    }
    print(json.dumps(out))
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "field_results.md")
    # Preserve prior runs: the artifact keeps a history instead of being
    # silently replaced (round 3 overwrote round 2's explanatory analysis).
    prior = ""
    if os.path.exists(md):
        old = open(md).read()
        head, marker, tail = old.partition("\n## Previous runs\n")
        prior = head.partition("# Field-scale end-to-end run\n\n")[2] or head
        prior = ("\n## Previous runs\n\n" + prior.strip() + "\n"
                 + (("\n" + tail.strip() + "\n") if tail.strip() else ""))
    with open(md, "w") as f:
        f.write("# Field-scale end-to-end run\n\n```json\n"
                + json.dumps(out, indent=2) + "\n```\n" + prior)


if __name__ == "__main__":
    main()
