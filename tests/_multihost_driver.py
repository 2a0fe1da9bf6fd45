"""One rank of the two-process CPU pod spawned by tests/test_multihost.py.

Usage: python _multihost_driver.py <port> <process_id> <outdir>

Wires a real jax.distributed pod (local TCP coordinator, Gloo CPU
collectives, 2 virtual devices per process -> a 4-device global mesh),
runs the DCN-sharded fit on the shared synthetic batch, and exercises the
leader-gated queue loop. Rank 0 writes dist_fit.npz + farm results; rank 1
must write nothing.
"""

import os
import sys

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = "--xla_force_host_platform_device_count=2 --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from celeste_jl_tpu.utils.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

from celeste_jl_tpu.parallel import multinode as mn  # noqa: E402

# generous init timeout: on the 1-core CI box the sibling rank can be
# starved for minutes behind xdist workers' compiles
rank, nproc = mn.init_distributed(f"localhost:{port}", 2, pid,
                                  initialization_timeout=1800)
assert nproc == 2, nproc
assert jax.device_count() == 4, jax.device_count()

import numpy as np  # noqa: E402

from __graft_entry__ import _synthetic_batch  # noqa: E402

vp0s, patches = _synthetic_batch(n_sources=6, tile=16, seed=3)
vp0s = np.asarray(vp0s)

res = mn.fit_sources_distributed(vp0s, patches)
if mn.is_queue_leader():
    np.savez(os.path.join(outdir, "dist_fit.npz"), vp=res.vp,
             elbo=res.elbo, converged=res.converged)

# leader-gated farm loop over 2 synthetic boxes
from celeste_jl_tpu.io.dataset import BoundingBox  # noqa: E402

farm = os.path.join(outdir, "farm")
queue = mn.FileWorkQueue(farm, boxes=mn.split_box(
    BoundingBox(0.0, 1.0, 0.0, 1.0), 2, 1))


def stage(box):
    return vp0s[:4], jax.tree.map(lambda x: x[:4], patches)


def save(box, r):
    np.savez(os.path.join(farm, f"celeste-{mn.box_name(box)}.npz"),
             vp=r.vp, elbo=r.elbo)


completed = mn.run_worker_distributed(queue, stage, save_box=save,
                                      worker_id=f"rank{rank}")
print(f"RANK {rank} completed {completed}", flush=True)

# re-sync before exiting: under heavy CI load the ranks' tails (result
# writing, host conversions) can skew by more than the distributed
# runtime's shutdown-barrier timeout, killing the slower rank
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("celeste_pod_done")
