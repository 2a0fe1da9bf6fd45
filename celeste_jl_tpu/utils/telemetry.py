"""Work counters + launch telemetry (the reference's tracing subsystem).

The reference counts pixel-visits per ELBO evaluation
(active/inactive_pixel_counter, elbo_args.jl:62-63, elbo_objective.jl:352-357)
and logs per-batch thread wall times and idle percentage
(ParallelRun.jl:327-365). The TPU analogs recorded here:

  * pixel_visits      — mask-true pixels x Newton f-calls, summed over fits
                        (the reference's active-pixel counter);
  * padded_visits     — same, but for padding lanes / masked-out pixels: work
                        the device does that a perfectly-ragged launch would
                        not (the analog of thread idle time);
  * launches, launch_s — batched device launches and their wall time;
  * busy_s()           — the UNION of the launch-pending intervals.

launch_s SUMS per-launch walls, which double-counts when launches overlap in
flight (JAX dispatch is async: the multi-field driver launches the fused
class schedule, then the isolated fits queue behind it on the device — the
isolated launch's dispatch->results wall then includes the fused program's
execution). busy_s() merges the (dispatch, results) intervals instead: the
length of time the device had >=1 launch pending, the honest device-side
denominator for fits/s (it neither double-counts overlap nor credits idle
gaps between launches).

Utilization = pixel_visits / (pixel_visits + padded_visits) — the fraction of
device pixel-work that was real, mirroring the reference's idle-percentage
report.
"""

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from . import log as Log


@dataclass
class Counters:
    pixel_visits: int = 0
    padded_visits: int = 0
    launches: int = 0
    launch_s: float = 0.0
    sources_fit: int = 0
    newton_iters: int = 0
    failures: int = 0
    # fused-schedule serialized depth: sum over class-steps of the MAX-lane
    # TR step count — the number of Newton iterations the device actually
    # executes end to end (a vmapped while_loop runs every lane until the
    # slowest lane of that step converges, so this, not mean iters, is the
    # wall-time driver).
    serial_steps: int = 0
    # model FLOPs of the USEFUL fit work (real lanes only; utils/flops.py
    # per-fit model) — converts fits/s into achieved FLOP/s vs chip peak.
    model_flops: float = 0.0
    # (t_dispatch, t_results) spans of every launch, for busy_s()
    intervals: list = field(default_factory=list)

    def reset(self):
        self.__init__()

    def busy_s(self):
        """Union length of the launch-pending intervals — the time the
        device had at least one launch in flight (see module docstring;
        launch_s over-counts overlapped launches)."""
        total, end = 0.0, -1.0
        for a, b in sorted(self.intervals):
            if a > end:
                total += b - a
                end = b
            elif b > end:
                total += b - end
                end = b
        return total

    def mfu(self):
        """(achieved model FLOP/s over device-busy wall, fraction of the
        chip's bf16 peak or None if the device is unknown)."""
        from .flops import mfu as _mfu
        busy = self.busy_s()
        if busy <= 0:
            return 0.0, None
        return _mfu(self.model_flops, busy)

    def utilization(self):
        total = self.pixel_visits + self.padded_visits
        return self.pixel_visits / total if total else 1.0

    def report(self, prefix="telemetry"):
        ut = self.utilization()
        busy = self.busy_s()
        visits_per_s = self.pixel_visits / busy if busy > 0 else 0.0
        achieved, mfu = self.mfu()
        Log.info(
            f"{prefix}: {self.sources_fit} fits in {self.launches} launches "
            f"({busy:.2f}s busy, {self.launch_s:.2f}s summed), "
            f"{self.pixel_visits:.3g} pixel-visits "
            f"({visits_per_s:.3g}/s), utilization {100 * ut:.1f}%, "
            f"{self.newton_iters} newton iters"
            + (f" ({self.serial_steps} serialized)" if self.serial_steps
               else "")
            + f", {achieved / 1e9:.3g} model GFLOP/s"
            + (f" (MFU {100 * mfu:.3f}%)" if mfu is not None else "")
            + f", {self.failures} failures")


# module-level counters, reset per box by the drivers
counters = Counters()


def now():
    return time.perf_counter()


def record_launch_wall(t0, label=""):
    """Account one batched device launch spanning dispatch -> results on
    host. Launches of one conflict-free class overlap in flight, so the
    per-launch walls overlap too: `launch_s` sums them (an upper bound on
    device busy time, the same quantity the reference's per-batch thread
    wall-times measure). Set CELESTE_LOG_LAUNCHES=1 to log each launch."""
    import os
    t1 = time.perf_counter()
    dt = t1 - t0
    counters.launches += 1
    counters.launch_s += dt
    counters.intervals.append((t0, t1))
    if os.environ.get("CELESTE_LOG_LAUNCHES"):
        from . import log as Log
        Log.info(f"launch {label}: {dt:.2f}s")


@contextmanager
def launch_timer(label=""):
    """Times one batched device launch into the global counters (the
    context-manager form of record_launch_wall)."""
    t0 = now()
    try:
        yield
    finally:
        record_launch_wall(t0, label)


def record_fit_launch(n_real, n_padded, pixels_per_lane_real,
                      pixels_per_lane_total, f_calls, tile=None, bands=5,
                      hess_every=6):
    """Account one fit_sources launch: n_real real lanes and n_padded padding
    lanes of a tile with `pixels_per_lane_total` pixel slots of which
    `pixels_per_lane_real` (per real lane, summed) were mask-true. f_calls:
    per-lane Newton function evaluations (array, length n_real+n_padded).
    tile/bands/hess_every: when tile is given, the real lanes' useful work
    is also priced in model FLOPs (utils/flops.py)."""
    import numpy as np

    f = np.asarray(f_calls)
    real_calls = f[:n_real]
    pad_calls = f[n_real:]
    counters.sources_fit += n_real
    counters.newton_iters += int(real_calls.sum())
    real = float((pixels_per_lane_real * real_calls).sum())
    total = float(pixels_per_lane_total) * float(f.sum())
    counters.pixel_visits += int(real)
    counters.padded_visits += int(max(total - real, 0.0))
    if tile is not None and n_real:
        from .flops import fit_flops
        iters = np.maximum(real_calls - 1, 0)   # f_calls = 1 + TR steps
        counters.model_flops += fit_flops(iters, real_calls, tile,
                                          B=bands, hess_every=hess_every)
