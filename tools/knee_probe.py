"""Per-TR-step cost vs lane-pixels: locate the latency->throughput knee.

The fused joint schedule's cost model (parallel/run.fused_color_classes)
assumes one serialized trust-region step costs ~constant wall regardless of
lane width — measured true at tile=32 from 32 to 1024 lanes. The tile-pure
packer then packed sub-fits up to W x P^2 = 2^21 lane-pixels, and the 8-field
farm run regressed (per-step wall ~17 -> ~45 ms): somewhere between 1M and
2M lane-pixels the while_loop body stops being latency-bound and becomes
pixel-throughput-bound.

This probe times `fit_sources` (same TR body as the fused program's
sub-fits) across a (W lanes, P tile) grid and reports ms per serialized step
(wall / max-lane iters, since the masked while_loop runs until the slowest
lane converges). Output: one JSON line per combo, then a fitted knee.

Usage: python tools/knee_probe.py   [env: KNEE_GRID="W:P[:hess_every],..."]

The optional third field sweeps NewtonConfig.hess_every at fixed (W, P) to
decompose the per-step cost: the Hessian-refresh cycle (analytic fgh +
batched eigh) amortizes over hess_every steps, so ms_per_step vs 1/he is a
line whose slope is the refresh cost and intercept the pure step cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID = os.environ.get(
    "KNEE_GRID",
    "512:16,2048:16,128:32,512:32,1024:32,128:64,512:64,32:128,128:128")


def main():
    import jax

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _synthetic_batch
    from celeste_jl_tpu.ops.newton import NewtonConfig
    from celeste_jl_tpu.vi.optimize import fit_sources

    backend = jax.default_backend()
    rows = []
    for combo in GRID.split(","):
        parts = combo.strip().split(":")
        W, P = int(parts[0]), int(parts[1])
        cfg = NewtonConfig()
        if len(parts) > 2:
            cfg = cfg._replace(hess_every=int(parts[2]))
        vp0s, patches = _synthetic_batch(n_sources=W, tile=P, seed=1)
        vp0s = jax.device_put(np.asarray(vp0s, dtype=np.float32))
        patches = jax.device_put(patches)

        t0 = time.perf_counter()
        res = fit_sources(vp0s, patches, config=cfg)
        jax.block_until_ready(res.vp)
        compile_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = fit_sources(vp0s, patches, config=cfg)
            iters = np.asarray(res.iters)  # forces device->host sync
            best = min(best, time.perf_counter() - t0)
        steps = int(iters.max())
        row = {
            "W": W, "P": P, "hess_every": cfg.hess_every,
            "lane_px": W * P * P,
            "wall_s": round(best, 3), "steps": steps,
            "ms_per_step": round(1e3 * best / max(steps, 1), 2),
            "fits_per_s": round(W / best, 1),
            "compile_s": round(compile_s, 1), "backend": backend,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # crude knee estimate: rate r from the most throughput-bound row,
    # floor t0 from the most latency-bound row; knee = t0 * r lane-pixels
    t0_ms = min(r["ms_per_step"] for r in rows)
    rate = max(r["lane_px"] / r["ms_per_step"] for r in rows)  # px per ms
    print(json.dumps({"t0_ms": t0_ms, "px_per_ms": round(rate),
                      "knee_lane_px": round(t0_ms * rate)}), flush=True)


if __name__ == "__main__":
    main()
