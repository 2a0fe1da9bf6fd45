"""Multi-node sky-box farming (the reference's cluster layer rebuilt).

The reference distributes work as one process per RA/Dec box with no
inter-box communication — Slurm taskfarmer at NERSC (contrib/nersc/infer.sl)
plus a historical Dtree distributed work-stealing scheduler
(contrib/http/infer_boxes_http.jl). The TPU-native equivalent:

  * `split_box` — partition a big BoundingBox into a grid of sub-boxes
    (contrib/nersc/list_rcfs.jl / list_quarters.jl role);
  * `FileWorkQueue` — a filesystem-based dynamic work queue: any number of
    worker processes/hosts sharing a directory (NFS/GCS-fuse) atomically
    claim boxes via O_EXCL lock files and mark them done by writing the
    result file. This is the Dtree/taskfarmer replacement: dynamic stealing,
    no coordinator process, elastic (a crashed worker's stale claim is
    reclaimed after `stale_s`).
  * `run_worker` — claim-infer-save loop for one process. Failed boxes are
    released for retry (up to `max_attempts`) — the reference's "a failed
    box task is just re-run" elasticity (SURVEY.md §5).

Checkpoint/resume granularity is the box, like the reference (main.jl:50-56):
a box whose result file exists is never re-run, so resume = rerun the farm.
Within a host, chips are used by the batched fit launches themselves
(parallel/mesh.py); across hosts there are two modes:

  * independent workers — one worker process per host, each draining the
    shared queue with its own chips (the taskfarmer shape);
  * one multi-host pod over DCN — `init_distributed()` wires the processes
    into a single JAX runtime (Slurm auto-detection or explicit
    coordinator), `fit_sources_distributed` shards one fit batch across
    EVERY process's devices (data-parallel source lanes over DCN, the
    SURVEY §2.3 "jax.distributed multi-host" path), and the queue is gated
    on `is_queue_leader()` so exactly one process claims boxes and writes
    results while all processes participate in the sharded launches.
    Exercised by a real two-process CPU pod in tests/test_multihost.py.
"""

import json
import os
import time

import numpy as np

from ..io.dataset import BoundingBox
from ..utils import log as Log


_DIST_INITIALIZED = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, initialization_timeout=None):
    """Initialize the multi-host JAX runtime (idempotent).

    With no arguments, defers to jax.distributed's cluster auto-detection
    (Slurm/Open MPI/TPU pod env vars — the contrib/slurm/infer_boxes.sl
    path, reference analog contrib/nersc/infer.sl:1-30). Explicit
    arguments (or CELESTE_COORDINATOR / CELESTE_NUM_PROCESSES /
    CELESTE_PROCESS_ID) wire an ad-hoc pod — e.g. the two-process CPU pod
    in tests/test_multihost.py. Returns (process_index, process_count).
    """
    import jax

    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_index(), jax.process_count()
    coordinator_address = (coordinator_address
                           or os.environ.get("CELESTE_COORDINATOR") or None)
    if num_processes is None and os.environ.get("CELESTE_NUM_PROCESSES"):
        num_processes = int(os.environ["CELESTE_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CELESTE_PROCESS_ID"):
        process_id = int(os.environ["CELESTE_PROCESS_ID"])
    try:
        # NOTE: must run before anything touches the JAX backend —
        # jax.device_count()/process_count() initialize it, after which
        # distributed wiring is rejected. Hence the module flag above
        # rather than a process_count() pre-check.
        kw = {}
        if initialization_timeout is not None:
            kw["initialization_timeout"] = initialization_timeout
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
        _DIST_INITIALIZED = True
        # Establish the cross-process collective context NOW, while the
        # ranks are still in lockstep. The context bootstrap (Gloo on
        # CPU) has a hard ~30 s key-value-exchange timeout that is NOT
        # covered by initialization_timeout; if the first collective
        # instead fires after minutes of load-varying jit compiles, a
        # faster rank times out waiting for a slower one (observed under
        # CI contention: "Gloo context initialization failed:
        # DEADLINE_EXCEEDED ... 29.99s"). One tiny barrier here creates
        # the context; later collectives reuse it.
        try:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("celeste_init_distributed")
        except Exception as exc:  # pragma: no cover - best effort
            Log.info(f"collective warmup failed ({exc}); continuing")
    except (ValueError, RuntimeError) as exc:
        # single-process runs (no cluster env, no explicit coordinator)
        # stay single-process — the worker loop works either way
        Log.info(f"jax.distributed not initialized ({exc}); "
                 "running single-process")
    return jax.process_index(), jax.process_count()


def is_queue_leader():
    """True on the process that should claim boxes and write results —
    process 0 of the pod (every process in a single-process run)."""
    import jax

    return jax.process_index() == 0


def fit_sources_distributed(vp0s, patches, config=None, include_kl=True,
                            hessian_mode="analytic"):
    """One fit batch sharded across EVERY process's devices over DCN.

    vp0s (S, 44) / patches (leading S) must be identical (host-replicated
    numpy) on all processes — the per-box staging is cheap host work, the
    device fits are not, so each process stages the box and contributes
    its devices to one SPMD launch. Source lanes are padded to the global
    device count, sharded on a global 1-D 'src' mesh (pure DP — lanes are
    independent, so no cross-shard collectives except the final
    all-gather), and the gathered FitResult is returned identically on
    every process.

    Single-process (or uninitialized) pods degrade to the local sharded
    fit over the process's own devices.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from ..ops.newton import NewtonConfig
    from ..vi.optimize import fit_sources

    config = config or NewtonConfig()
    devs = np.asarray(jax.devices())          # global device list
    n_dev = devs.size
    nproc = jax.process_count()
    S = vp0s.shape[0]
    pad = (-S) % n_dev
    pad_idx = np.concatenate([np.arange(S), np.zeros(pad, np.int64)])

    mesh = Mesh(devs, ("src",))
    spec = PartitionSpec("src")
    repl = PartitionSpec()

    # each process contributes its contiguous row block
    rows = pad_idx.reshape(nproc, -1)[jax.process_index()]
    to_global = lambda a: multihost_utils.host_local_array_to_global_array(
        np.asarray(a)[rows], mesh, spec)
    vp_g = to_global(vp0s)
    patches_g = jax.tree.map(to_global, patches)

    fit = jax.jit(
        lambda v, p: fit_sources(v, p, include_kl=include_kl,
                                 config=config, hessian_mode=hessian_mode),
        out_shardings=NamedSharding(mesh, repl))
    res = fit(vp_g, patches_g)
    # replicated outputs are addressable everywhere; drop the pad lanes
    return jax.tree.map(lambda x: np.asarray(x.addressable_data(0))[:S],
                        res)


def split_box(box: BoundingBox, n_ra: int, n_dec: int):
    """Partition `box` into an n_ra x n_dec grid of sub-boxes."""
    ras = np.linspace(box.ramin, box.ramax, n_ra + 1)
    decs = np.linspace(box.decmin, box.decmax, n_dec + 1)
    return [BoundingBox(ras[i], ras[i + 1], decs[j], decs[j + 1])
            for i in range(n_ra) for j in range(n_dec)]


def box_name(box: BoundingBox):
    return (f"{box.ramin:.4f}-{box.ramax:.4f}"
            f"-{box.decmin:.4f}-{box.decmax:.4f}")


class FileWorkQueue:
    """Atomic filesystem work queue over sky boxes.

    Layout under `workdir`:
      boxes.json                 — the task list (written once by any rank)
      claims/<name>.claim        — O_EXCL lock file, holds claimer + attempt
      celeste-<name>.npz         — result file; its existence means done
    """

    def __init__(self, workdir, boxes=None, stale_s=3600.0, max_attempts=3):
        self.workdir = workdir
        self.claims = os.path.join(workdir, "claims")
        os.makedirs(self.claims, exist_ok=True)
        self.stale_s = stale_s
        self.max_attempts = max_attempts
        self.tasks_file = os.path.join(workdir, "boxes.json")
        if boxes is not None and not os.path.exists(self.tasks_file):
            tmp = self.tasks_file + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump([[b.ramin, b.ramax, b.decmin, b.decmax]
                           for b in boxes], f)
            os.replace(tmp, self.tasks_file)  # atomic publish

    def boxes(self):
        with open(self.tasks_file) as f:
            return [BoundingBox(*row) for row in json.load(f)]

    def _result_file(self, box):
        return os.path.join(self.workdir, f"celeste-{box_name(box)}.npz")

    def _claim_file(self, box):
        return os.path.join(self.claims, f"{box_name(box)}.claim")

    def done(self, box):
        return os.path.exists(self._result_file(box))

    def _read_claim(self, path):
        try:
            with open(path) as f:
                return json.load(f)
        except Exception:
            return {"t": 0.0, "attempt": 0}

    def try_claim(self, box, worker_id):
        """Atomically claim `box`. Returns the attempt number, or None if the
        box is done, actively claimed, or exhausted its attempts."""
        if self.done(box):
            return None
        path = self._claim_file(box)
        attempt = 1
        if os.path.exists(path):
            prev = self._read_claim(path)
            age = time.time() - prev.get("t", 0.0)
            if age < self.stale_s:
                return None              # actively claimed
            attempt = prev.get("attempt", 0) + 1
            if attempt > self.max_attempts:
                return None              # permanently failed
            try:
                os.unlink(path)          # reclaim stale lock
            except FileNotFoundError:
                pass
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None                  # raced another worker
        with os.fdopen(fd, "w") as f:
            json.dump({"worker": worker_id, "t": time.time(),
                       "attempt": attempt}, f)
        return attempt

    def release(self, box):
        """Release a claim after failure so another worker may retry (the
        attempt count is kept in the claim file until reclaimed)."""
        path = self._claim_file(box)
        if os.path.exists(path):
            prev = self._read_claim(path)
            prev["t"] = 0.0              # mark immediately stale
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(prev, f)
            os.replace(tmp, path)

    def pending(self):
        return [b for b in self.boxes() if not self.done(b)]


def run_worker(queue: FileWorkQueue, load_images, method="joint_vi",
               config=None, worker_id=None, infer=None, max_boxes=None):
    """Claim-infer-save loop for one worker process.

    load_images: BoundingBox -> [Image] (e.g. dataset.load_images).
    infer: override the inference callable (images, box, method, config) ->
    results, for tests. Returns the number of boxes this worker completed.
    """
    from ..main import save_results
    from ..utils.config import Config
    from .run import infer_box

    config = config or Config()
    worker_id = worker_id or f"{os.uname().nodename}:{os.getpid()}"
    infer = infer or (lambda images, box: infer_box(
        images, box=box, method=method, config=config))

    completed = 0
    progress = True
    while progress and (max_boxes is None or completed < max_boxes):
        progress = False
        for box in queue.boxes():
            if max_boxes is not None and completed >= max_boxes:
                break
            if queue.done(box):
                continue
            attempt = queue.try_claim(box, worker_id)
            if attempt is None:
                continue
            progress = True
            Log.info(f"worker {worker_id}: box {box_name(box)} "
                     f"(attempt {attempt})")
            try:
                t0 = time.perf_counter()
                images = load_images(box)
                results = infer(images, box)
                save_results(queue.workdir, box, results)
                completed += 1
                Log.info(f"worker {worker_id}: box {box_name(box)} done, "
                         f"{len(results)} sources in "
                         f"{time.perf_counter() - t0:.1f}s")
            except Exception as exc:
                Log.exception(exc)
                queue.release(box)
    return completed


def run_worker_distributed(queue: FileWorkQueue, stage_box, save_box=None,
                           config=None, worker_id=None, max_boxes=None):
    """Queue-draining loop for ONE multi-host pod (init_distributed first).

    Every process executes this loop in lockstep: the leader
    (is_queue_leader) claims the next pending box and broadcasts its index
    over the pod; every process stages the box with the (deterministic)
    `stage_box: BoundingBox -> (vp0s, patches)` host work and joins the
    DCN-sharded fit; the leader alone writes results via
    `save_box(box, fit_result)` (whose output file marks the box done for
    the whole farm). Followers never touch the queue — the SURVEY §2.3
    process-gating of the reference's master-rank I/O
    (SDSSIO.jl:687-691 masterrpc). Returns boxes completed (same value on
    every process)."""
    from jax.experimental import multihost_utils

    worker_id = worker_id or f"{os.uname().nodename}:{os.getpid()}"
    leader = is_queue_leader()
    completed = 0
    while max_boxes is None or completed < max_boxes:
        nxt = np.int64(-1)
        if leader:
            for i, box in enumerate(queue.boxes()):
                if queue.done(box):
                    continue
                if queue.try_claim(box, worker_id) is not None:
                    nxt = np.int64(i)
                    break
        nxt = int(multihost_utils.broadcast_one_to_all(nxt))
        if nxt < 0:
            break
        box = queue.boxes()[nxt]
        Log.info(f"pod worker {worker_id}: box {box_name(box)}")
        try:
            vp0s, patches = stage_box(box)
            res = fit_sources_distributed(vp0s, patches, config=config)
            if leader and save_box is not None:
                save_box(box, res)
            completed += 1
        except Exception as exc:
            Log.exception(exc)
            if leader:
                queue.release(box)
            raise
    return completed


def run_worker_pipelined(queue: FileWorkQueue, load_images, config=None,
                         worker_id=None, group_boxes=2, max_boxes=None,
                         detect_kwargs=None, seed=42):
    """Claim-infer-save loop that keeps the chip saturated: boxes are
    claimed `group_boxes` at a time and streamed through
    `joint_infer_fields_pipelined`, so box k+1's image loading, detection,
    and patch staging overlap box k's in-flight fused device launch, and
    the boxes of one group merge laterally into one launch (cross-field
    class merging). This is the production replacement for run_worker's
    one-box-at-a-time loop — the reference's taskfarmer kept nodes busy
    with one process per box (contrib/nersc/infer.sl:5-30); here one
    process keeps one chip busy across boxes. joint_vi only.

    load_images: BoundingBox -> [Image]. detect_kwargs: passed through to
    detection (thresh, boxsize, ...). Returns boxes completed."""
    from ..detection.detect import detect_sources
    from ..main import save_results
    from ..utils.config import Config
    from .run import (detection_active_boxes, is_production_run,
                      joint_infer_fields_pipelined)

    config = config or Config()
    worker_id = worker_id or f"{os.uname().nodename}:{os.getpid()}"
    detect_kwargs = detect_kwargs or {}

    def stage(box):
        """Host work for one box: load + detect + target selection."""
        images = load_images(box)
        catalog, det_boxes = detect_sources(images, **detect_kwargs)
        active = (detection_active_boxes(catalog, det_boxes, images)
                  if catalog else None)
        targets = [i for i, ce in enumerate(catalog)
                   if box.contains(ce.pos[0], ce.pos[1])]
        return {"catalog": catalog, "images": images,
                "active_boxes": active, "target_sources": targets}

    group_order = []     # groups' boxes, in yield order
    completed = 0
    claimed_total = [0]  # boxes handed to the pipeline (done + in flight)

    # Keep claiming until a full sweep of the task list yields nothing.
    # The generator runs interleaved with the consumer below: group k+1's
    # stage() calls execute while group k's fused launch is in flight.
    def groups():
        while True:
            grp, boxes_g = [], []
            budget = (group_boxes if max_boxes is None else
                      min(group_boxes, max_boxes - claimed_total[0]))
            if budget <= 0:
                return
            for box in queue.boxes():
                if len(grp) >= budget:
                    break
                if queue.done(box):
                    continue
                attempt = queue.try_claim(box, worker_id)
                if attempt is None:
                    continue
                Log.info(f"worker {worker_id}: box {box_name(box)} "
                         f"(attempt {attempt})")
                try:
                    fields = stage(box)
                except Exception as exc:
                    Log.exception(exc)
                    queue.release(box)
                    continue
                if not fields["catalog"] or not fields["target_sources"]:
                    # nothing to fit — an empty box is still done
                    save_results(queue.workdir, box, [])
                    continue
                grp.append(fields)
                boxes_g.append(box)
            if not grp:
                return
            group_order.append(boxes_g)
            claimed_total[0] += len(boxes_g)
            yield grp

    _done = [0]  # groups fully saved (index into group_order)
    try:
        for results in joint_infer_fields_pipelined(groups(), config=config,
                                                    seed=seed):
            boxes_g = group_order[_done[0]]
            for box, res in zip(boxes_g, results):
                save_results(queue.workdir, box, res)
                completed += 1
                Log.info(f"worker {worker_id}: box {box_name(box)} done, "
                         f"{len(res)} sources")
            _done[0] += 1
    except Exception as exc:
        # release every claimed-but-unsaved box for retry by another worker
        if not is_production_run():
            for g in group_order[_done[0]:]:
                for box in g:
                    queue.release(box)
            raise
        Log.exception(exc)
        for g in group_order[_done[0]:]:
            for box in g:
                queue.release(box)
    return completed
