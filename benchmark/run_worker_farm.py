"""Queue-driven farm-worker benchmark: the production path, measured.

Unlike run_multifield.py (which calls joint_infer_fields directly), this
drives the ACTUAL production worker loop — FileWorkQueue claims +
run_worker_pipelined — over synthetic sky boxes: each box is one field
whose images are synthesized inside load_images (so image "loading" cost is
real host work that must overlap the in-flight launch, as survey FITS reads
would). Reference analog: the taskfarmer box farm, contrib/nersc/infer.sl.

Reports sustained end-to-end sources/s (result files on disk / wall) plus
the device-side occupancy telemetry. Prints one JSON line per pass and
appends to benchmark/multifield_results.md.

Env: WF_BOXES (default 8), WF_SOURCES (per box, default 128), WF_SIZE
(default 512), WF_GROUP (boxes fused per launch, default 2), WF_SEED
(default 7), WF_REPEAT (default 2; pass 0 pays compiles).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("WF_BOXES", "8"))
N_SOURCES = int(os.environ.get("WF_SOURCES", "128"))
SIZE = int(os.environ.get("WF_SIZE", "512"))
GROUP = int(os.environ.get("WF_GROUP", "2"))
SEED = int(os.environ.get("WF_SEED", "7"))
REPEAT = int(os.environ.get("WF_REPEAT", "2"))


def main():
    import tempfile

    import numpy as np

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    from celeste_jl_tpu.io.dataset import BoundingBox
    from celeste_jl_tpu.io.wcs import LinearWCS
    from celeste_jl_tpu.parallel.multinode import (FileWorkQueue, box_name,
                                                   run_worker_pipelined,
                                                   split_box)
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
        return images

    # identity WCS: world == pixel coords; one big bounding box split into
    # M RA strips, each strip = one synthetic field
    boxes = split_box(BoundingBox(0.0, float(SIZE * M), 0.0, float(SIZE)),
                      M, 1)
    out = {}
    for rep in range(REPEAT):
        # Same fields every pass: pass 0 pays the compiles, later passes
        # time the same program warm (matches run_multifield.py).
        base = SEED
        seed_of = {box_name(b): base + 1000 * f
                   for f, b in enumerate(boxes)}

        def load_images(box):
            # synthesized on demand: load cost is real host work that the
            # pipeline must overlap with the in-flight launch. The field is
            # synthesized in pixel space, then given a translated WCS so its
            # sources land inside THIS box's world extent (box.contains is
            # the worker's target filter; without this, only box 0 would
            # have any targets and the other boxes save out empty).
            images = make_field(seed_of[box_name(box)])
            wcs = LinearWCS(crval=(box.ramin, box.decmin))
            for img in images:
                img.wcs = wcs
            return images

        workdir = tempfile.mkdtemp(prefix=f"farm_r{rep}_")
        q = FileWorkQueue(workdir, boxes)
        telemetry.counters.reset()
        t0 = time.time()
        done = run_worker_pipelined(
            q, load_images=load_images, config=Config(), group_boxes=GROUP,
            detect_kwargs=dict(thresh=6.0, boxsize=(SIZE, SIZE),
                               match_radius_deg=1.0))
        wall = time.time() - t0
        c = telemetry.counters
        achieved_fl, mfu_frac = c.mfu()

        n_out = 0
        for b in boxes:
            d = np.load(q._result_file(b))
            n_out += d["vs"].shape[0]

        import jax
        out = {
            "metric": "worker_farm_e2e_sources_per_sec",
            "value": round(n_out / wall, 2),
            "unit": "sources/s",
            "boxes": M,
            "boxes_done": done,
            "group_boxes": GROUP,
            "sources_per_box": N_SOURCES,
            "n_inferred": n_out,
            "wall_s": round(wall, 1),
            "fits": c.sources_fit,
            "device_busy_s": round(c.busy_s(), 2),
            "launch_wall_sum_s": round(c.launch_s, 2),
            "device_sources_per_sec": (round(n_out / c.busy_s(), 2)
                                       if c.busy_s() else None),
            "utilization": round(c.utilization(), 3),
            "achieved_model_gflops_per_s": round(achieved_fl / 1e9, 1),
            "mfu": (round(mfu_frac, 6) if mfu_frac is not None else None),
            "backend": jax.default_backend(),
            "pass": rep,
        }
        print(json.dumps(out), flush=True)

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multifield_results.md")
    with open(md, "a") as f:
        f.write("\n## Queue-driven pipelined worker "
                "(run_worker_farm.py — the production path)\n\n"
                "FileWorkQueue claims + run_worker_pipelined: boxes claimed "
                f"{GROUP} at a time, synth+detect+staging of the next group "
                "overlapping the in-flight fused launch; wall includes "
                "everything from claim to result file on disk. Last (warm) "
                f"pass with WF_BOXES={M} WF_SOURCES={N_SOURCES} "
                f"WF_SIZE={SIZE}:\n\n```json\n"
                + json.dumps(out, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
