"""Farm worker: drain the shared box queue until empty.

python -m contrib.slurm.worker --workdir W --basedir B \
    --box ramin,ramax,decmin,decmax [--grid 8x8] [--method joint_vi] \
    [--group-boxes 2] [--no-pipeline]

Default mode (joint_vi) is the PIPELINED worker
(parallel/multinode.run_worker_pipelined): boxes are claimed --group-boxes
at a time, merged laterally into one fused device launch, and the next
group's image loading + detection + staging overlaps the in-flight launch —
one process keeps one chip saturated across boxes. --no-pipeline (or a
non-joint_vi method) falls back to the one-box-at-a-time run_worker loop.
"""

import argparse


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
    args = ap.parse_args()

    from celeste_jl_tpu.io.dataset import BoundingBox
    from celeste_jl_tpu.io.sdss import SDSSDataSet
    from celeste_jl_tpu.parallel.multinode import (FileWorkQueue, run_worker,
                                                   run_worker_pipelined,
                                                   split_box)

    ramin, ramax, decmin, decmax = (float(x) for x in args.box.split(","))
    n_ra, n_dec = (int(x) for x in args.grid.split("x"))
    boxes = split_box(BoundingBox(ramin, ramax, decmin, decmax), n_ra, n_dec)
    queue = FileWorkQueue(args.workdir, boxes)
    dataset = SDSSDataSet(args.basedir)
    if args.method == "joint_vi" and not args.no_pipeline:
        run_worker_pipelined(queue, load_images=dataset.load_images,
                             group_boxes=args.group_boxes)
    else:
        run_worker(queue, load_images=dataset.load_images,
                   method=args.method)


if __name__ == "__main__":
    main()
