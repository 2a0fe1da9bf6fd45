"""MCMC/AIS throughput benchmark on the current JAX backend.

Workload: S synthetic sources, each inferred by the FULL star-vs-galaxy AIS
program (reference production config: 50 temperatures x 10 importance
samples, each draw extended with a 25-step posterior slice chain, bootstrap
p(star)) — all S sources as ONE vmapped launch (mcmc/infer.run_ais_batched).
The reference threads this per source (ParallelRun.jl:546-607).

Also micro-times one batched log-likelihood evaluation under the fused
Pallas kernel (CELESTE_FUSED_MCMC=1, TPU) vs the plain XLA render+score
path (CELESTE_FUSED_MCMC=0) — the kernel-vs-XLA check.

Prints one JSON line. Env: MCMC_SOURCES (default 64), MCMC_REPEATS (2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = int(os.environ.get("MCMC_SOURCES", "64"))
REPEATS = int(os.environ.get("MCMC_REPEATS", "2"))


def _loglike_micro(tgts, backend):
    """Best wall of one batched star_loglike eval per fused-flag setting."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from celeste_jl_tpu.mcmc.log_prob import star_loglike

    th = jnp.asarray(np.tile(
        np.concatenate([np.log(np.full(5, 10.0)), [0.5, 0.5]]), (S, 1)))
    out = {}
    for flag in ("0", "1") if backend == "tpu" else ("0",):
        os.environ["CELESTE_FUSED_MCMC"] = flag

        @jax.jit
        def ll(th, tgts):
            return jax.vmap(star_loglike)(th, tgts)

        np.asarray(ll(th, tgts))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(ll(th, tgts))
            best = min(best, time.perf_counter() - t0)
        out["fused" if flag == "1" else "xla"] = round(best * 1e3, 3)
    os.environ.pop("CELESTE_FUSED_MCMC", None)
    return out


def main():
    import numpy as np

    from celeste_jl_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    import jax

    from celeste_jl_tpu.mcmc.infer import run_ais_batched
    from celeste_jl_tpu.mcmc.log_prob import make_source_target
    from celeste_jl_tpu.models.patches import make_patches_batched
    from celeste_jl_tpu.synthetic import (gen_images_fast, make_blank_images,
                                          sample_galaxy, sample_star)
    from celeste_jl_tpu.utils.config import Config

    rng = np.random.default_rng(3)
    size = int(np.ceil(np.sqrt(S))) * 48 + 32
    images = make_blank_images(H=size, W=size, sky_nmgy=0.1,
                               nelec_per_nmgy=1000.0)
    catalog = []
    grid = int(np.ceil(np.sqrt(S)))
    for i in range(S):
        pos = (24.0 + 48.0 * (i // grid) + rng.uniform(-2, 2),
               24.0 + 48.0 * (i % grid) + rng.uniform(-2, 2))
        if i % 2 == 0:
            catalog.append(sample_star(pos=pos, r_flux=rng.uniform(10, 40)))
        else:
            catalog.append(sample_galaxy(
                pos=pos, r_flux=rng.uniform(15, 50),
                gal_radius_px=rng.uniform(1.5, 3.0)))
    gen_images_fast(images, catalog, seed=11)
    cfg = Config(min_radius_pix=8.0)

    import jax.numpy as jnp
    patches = make_patches_batched(
        images, [c.pos for c in catalog], [8.0] * S, 32)
    tgt_list = [make_source_target(p, image=images[0], entry_pos=c.pos)
                for p, c in zip(patches, catalog)]
    tgts = jax.tree.map(lambda *xs: jnp.stack(xs), *tgt_list)
    micro = _loglike_micro(tgts, jax.default_backend())

    t0 = time.perf_counter()
    run_ais_batched(catalog, images, config=cfg, seed=0)
    compile_s = time.perf_counter() - t0

    times = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        res = run_ais_batched(catalog, images, config=cfg, seed=r + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)

    pstar = np.array([r["ave_pstar"] for r in res])
    truth = np.array([c.is_star for c in catalog])
    # only extended galaxies are decisively non-star (see tests); report
    # galaxy recall as the accuracy proxy
    gal_correct = float(np.mean(pstar[~truth] < 0.5))

    # AIS posterior calibration: within-k-sigma fractions of the winning
    # model's chain vs generating truth (the VI path's overconfident
    # mean-field colors are the motivation — calibrated ~0.38/0.68/0.95,
    # AccuracyBenchmark.jl:978-1026 semantics)
    from celeste_jl_tpu.mcmc.infer import samples_to_dataframe
    fields = ("log_flux_r", "color_ug", "color_gr", "color_ri", "color_iz")
    hits = {f: [] for f in fields}
    for r, c in zip(res, catalog):
        is_star = r["ave_pstar"] > 0.5
        df = samples_to_dataframe(
            r["star_samples" if is_star else "gal_samples"], is_star)
        tf = np.log(np.asarray(c.star_fluxes if c.is_star else c.gal_fluxes))
        t = {"log_flux_r": tf[2], "color_ug": tf[1] - tf[0],
             "color_gr": tf[2] - tf[1], "color_ri": tf[3] - tf[2],
             "color_iz": tf[4] - tf[3]}
        for f in fields:
            mu, sd = float(df[f].mean()), float(df[f].std(ddof=1))
            if sd > 0:
                hits[f].append(abs(mu - t[f]) / sd)
    calib = {f: {f"within_{k}_sd": round(float(np.mean(
                 np.asarray(hits[f]) < k)), 3) for k in (0.5, 1, 2, 3)}
             for f in fields if hits[f]}

    out = {
        "metric": "mcmc_ais_sources_per_sec_per_chip",
        "value": round(S / best, 3),
        "unit": "sources/s",
        "vs_baseline": None,
        "sources": S,
        "best_wall_s": round(best, 3),
        "compile_plus_first_run_s": round(compile_s, 1),
        "ais_config": "50 temps x 10 samples + 25-step chains, both models",
        "galaxy_recall": gal_correct,
        "ais_calibration_within_k_sd": calib,
        "loglike_micro_ms": micro,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()


