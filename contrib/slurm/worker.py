"""Farm worker: drain the shared box queue until empty.

python -m contrib.slurm.worker --workdir W --basedir B \
    --box ramin,ramax,decmin,decmax [--grid 8x8] [--method joint_vi] \
    [--group-boxes 2] [--no-pipeline] [--distributed]

Default mode (joint_vi) is the PIPELINED worker
(parallel/multinode.run_worker_pipelined): boxes are claimed --group-boxes
at a time, merged laterally into one fused device launch, and the next
group's image loading + detection + staging overlaps the in-flight launch —
one process keeps one chip saturated across boxes. --no-pipeline (or a
non-joint_vi method) falls back to the one-box-at-a-time run_worker loop.

--distributed wires all the job's processes into ONE multi-host JAX pod
over DCN (parallel/multinode.init_distributed; Slurm env auto-detection,
or CELESTE_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID): source lanes of each
box's fit shard across every host's chips, only the rank-0 process touches
the queue and writes results (run_worker_distributed). Without it, each
host runs an independent worker against the shared queue (the taskfarmer
shape, reference contrib/nersc/infer.sl:5-30).
"""

import argparse


def make_single_vi_stage(load_images, tile_size=32, radius=12,
                         **detect_kwargs):
    """BoundingBox -> (vp0s, patches) staging for the distributed worker:
    detection + patch/init construction is deterministic host work repeated
    identically on every pod process."""
    import numpy as np

    from celeste_jl_tpu.detection.detect import detect_sources
    from celeste_jl_tpu.models.patches import (make_patch_for_source,
                                               stack_patches)
    from celeste_jl_tpu.vi.init import catalog_init_source

    def stage(box):
        images = load_images(box)
        catalog, _ = detect_sources(images, **detect_kwargs)
        patches = stack_patches([
            make_patch_for_source(images, ce.pos, radius=radius,
                                  tile_size=tile_size) for ce in catalog])
        vp0s = np.stack([catalog_init_source(ce) for ce in catalog])
        return vp0s, patches

    return stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--basedir", required=True)
    ap.add_argument("--box", required=True)
    ap.add_argument("--grid", default="8x8")
    ap.add_argument("--method", default="joint_vi")
    ap.add_argument("--group-boxes", type=int, default=2,
                    help="boxes fused per device launch (pipelined mode)")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="one-box-at-a-time worker loop")
    ap.add_argument("--distributed", action="store_true",
                    help="join all job processes into one multi-host JAX "
                         "pod (DCN-sharded fits, rank-0 queue I/O)")
    args = ap.parse_args()

    from celeste_jl_tpu.io.dataset import BoundingBox
    from celeste_jl_tpu.io.sdss import SDSSDataSet
    from celeste_jl_tpu.parallel import multinode as mn

    if args.distributed:
        # must run before anything touches the JAX backend
        mn.init_distributed()

    ramin, ramax, decmin, decmax = (float(x) for x in args.box.split(","))
    n_ra, n_dec = (int(x) for x in args.grid.split("x"))
    boxes = mn.split_box(BoundingBox(ramin, ramax, decmin, decmax),
                         n_ra, n_dec)
    queue = mn.FileWorkQueue(args.workdir, boxes)
    dataset = SDSSDataSet(args.basedir)
    if args.distributed:
        import numpy as np

        from celeste_jl_tpu.main import save_results
        from celeste_jl_tpu.parallel.run import bad_sky
        from celeste_jl_tpu.parallel.state import OptimizedSource

        def save(box, res):
            results = [OptimizedSource(
                init_pos=np.asarray(res.vp[i][:2], np.float64),
                vs=np.asarray(res.vp[i]), elbo=float(res.elbo[i]),
                converged=bool(res.converged[i]), is_sky_bad=False)
                for i in range(res.vp.shape[0])]
            save_results(queue.workdir, box, results)

        mn.run_worker_distributed(
            queue, make_single_vi_stage(dataset.load_images),
            save_box=save)
    elif args.method == "joint_vi" and not args.no_pipeline:
        mn.run_worker_pipelined(queue, load_images=dataset.load_images,
                                group_boxes=args.group_boxes)
    else:
        mn.run_worker(queue, load_images=dataset.load_images,
                      method=args.method)


if __name__ == "__main__":
    main()
