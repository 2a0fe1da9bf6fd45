"""Micro-benchmarks of the hot evaluators (benchmark/speed parity).

The reference times `elbo_likelihood` and one single-source joint fit
(benchmark/speed/benchmark_elbo_likelihood.jl:18-26,
benchmark_one_light_source.jl:14-17 — its workload anchor: 1,048
pixel-visits/eval x 37 Newton iterations = 38,776 pixel-visits per fit).
Here the analogous quantities on the current backend:

  * elbo_evals_per_sec        — batched ELBO value evaluations
  * fgh_evals_per_sec         — batched ELBO + gradient + analytic-Hessian
                                evaluations (one Newton refresh step's cost;
                                the BASELINE.md "ELBO+grad+Hessian evals/sec"
                                metric)
  * single_fit_latency_ms     — one cold-start single-source fit (S=1), the
                                reference's one-light-source workload

Prints one JSON line per metric. Env: BENCH_ELBO_SOURCES (default 512),
BENCH_ELBO_TILE (default 32), BENCH_ELBO_REPEATS (default 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = int(os.environ.get("BENCH_ELBO_SOURCES", "512"))
TILE = int(os.environ.get("BENCH_ELBO_TILE", "32"))
REPEATS = int(os.environ.get("BENCH_ELBO_REPEATS", "5"))


def main():
    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from celeste_jl_tpu.ops import bijectors
    from celeste_jl_tpu.vi.elbo import elbo, subtract_kl
    from celeste_jl_tpu.vi.optimize import (_analytic_lik_hessian,
                                            _flat_likelihood, _make_bounds,
                                            fit_sources)

    vp0, patches = _synthetic_batch(n_sources=S, tile=TILE, seed=0)
    vp0 = jnp.asarray(vp0)

    @jax.jit
    def elbo_batch(vps):
        return jax.vmap(lambda v, p: elbo(v, p))(vps, patches)

    @jax.jit
    def fg2d_batch(vps):
        """Trial evaluator (value+grad) through the 2D (B, P, P) tile
        render — the pre-flatten fg path, kept for the layout A/B."""
        def one(v, p):
            bounds = _make_bounds(v[0:2])
            free = bijectors.to_free(bijectors.enforce(v, bounds), bounds)
            return jax.value_and_grad(
                lambda fr: -elbo(bijectors.to_bound(fr, bounds), p))(free)
        return jax.vmap(one)(vps, patches)

    @jax.jit
    def fg_flat_batch(vps):
        """Trial evaluator through the flat (P*P,) layout — what
        vi/optimize.maximize's fg actually runs."""
        def one(v, p):
            bounds = _make_bounds(v[0:2])
            free = bijectors.to_free(bijectors.enforce(v, bounds), bounds)

            def neg_elbo(fr):
                vp = bijectors.to_bound(fr, bounds)
                return -(_flat_likelihood(vp, p, None, None)
                         + subtract_kl(vp))
            return jax.value_and_grad(neg_elbo)(free)
        return jax.vmap(one)(vps, patches)

    @jax.jit
    def fgh_batch(vps):
        def one(v, p):
            bounds = _make_bounds(v[0:2])
            free = bijectors.to_free(bijectors.enforce(v, bounds), bounds)
            f, g = jax.value_and_grad(
                lambda fr: -elbo(bijectors.to_bound(fr, bounds), p))(free)
            H = -_analytic_lik_hessian(free, bounds, p, None, None)
            return f, g, H
        return jax.vmap(one)(vps, patches)

    def timeit(fn, *args):
        out = jax.block_until_ready(fn(*args))   # compile
        walls = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            walls.append(time.perf_counter() - t0)
        np.asarray(jax.tree.leaves(out)[0])      # force a D2H transfer
        return min(walls)

    px_per_lane = int(np.asarray(patches.mask).sum() / S)
    backend = jax.default_backend()

    w = timeit(elbo_batch, vp0)
    print(json.dumps({"metric": "elbo_evals_per_sec",
                      "value": round(S / w, 1), "unit": "evals/s",
                      "batch": S, "tile": TILE,
                      "active_px_per_eval": px_per_lane,
                      "backend": backend}))
    w2d = timeit(fg2d_batch, vp0)
    print(json.dumps({"metric": "fg2d_evals_per_sec",
                      "value": round(S / w2d, 1), "unit": "evals/s",
                      "batch": S, "tile": TILE, "backend": backend}))
    wfl = timeit(fg_flat_batch, vp0)
    print(json.dumps({"metric": "fg_flat_evals_per_sec",
                      "value": round(S / wfl, 1), "unit": "evals/s",
                      "batch": S, "tile": TILE,
                      "speedup_vs_2d": round(w2d / wfl, 3),
                      "backend": backend}))
    w = timeit(fgh_batch, vp0)
    print(json.dumps({"metric": "fgh_evals_per_sec",
                      "value": round(S / w, 1), "unit": "evals/s",
                      "batch": S, "tile": TILE, "backend": backend}))

    vp1, patch1 = _synthetic_batch(n_sources=1, tile=TILE, seed=1)
    w = timeit(lambda v: fit_sources(v, patch1), jnp.asarray(vp1))
    print(json.dumps({"metric": "single_fit_latency_ms",
                      "value": round(1e3 * w, 2), "unit": "ms",
                      "tile": TILE, "backend": backend,
                      "reference_anchor": "38776 pixel-visits/fit "
                      "(benchmark_one_light_source.jl:14-17)"}))


if __name__ == "__main__":
    main()
