#!/bin/bash
# One worker per task over a shared work directory (reference
# contrib/nersc/infer.sl semantics, taskfarmer replaced by FileWorkQueue).
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --time=04:00:00
#SBATCH --job-name=celeste-tpu-farm

: "${WORKDIR:?shared work directory (holds queue + results)}"
: "${SDSS_BASEDIR:?survey data root (local path or http(s) URL)}"
: "${BOX:?sky box as ramin,ramax,decmin,decmax}"
: "${GRID:=8x8}"

srun --kill-on-bad-exit=0 python -m contrib.slurm.worker \
    --workdir "$WORKDIR" --basedir "$SDSS_BASEDIR" \
    --box "$BOX" --grid "$GRID"
