"""Farm worker: drain the shared box queue until empty.

python -m contrib.slurm.worker --workdir W --basedir B \
    --box ramin,ramax,decmin,decmax [--grid 8x8] [--method joint_vi]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--basedir", required=True)
    ap.add_argument("--box", required=True)
    ap.add_argument("--grid", default="8x8")
    ap.add_argument("--method", default="joint_vi")
    args = ap.parse_args()

    from celeste_jl_tpu.io.dataset import BoundingBox
    from celeste_jl_tpu.io.sdss import SDSSDataSet
    from celeste_jl_tpu.parallel.multinode import (FileWorkQueue, run_worker,
                                                   split_box)

    ramin, ramax, decmin, decmax = (float(x) for x in args.box.split(","))
    n_ra, n_dec = (int(x) for x in args.grid.split("x"))
    boxes = split_box(BoundingBox(ramin, ramax, decmin, decmax), n_ra, n_dec)
    queue = FileWorkQueue(args.workdir, boxes)
    dataset = SDSSDataSet(args.basedir)
    run_worker(queue, load_images=dataset.load_images, method=args.method)


if __name__ == "__main__":
    main()
