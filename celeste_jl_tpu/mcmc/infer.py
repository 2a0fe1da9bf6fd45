"""High-level MCMC / AIS inference (mcmc/mcmc_infer.jl + mcmc_misc.jl).

Per source: run AIS under both the star and galaxy models to estimate each
model's marginal likelihood (lnZ), derive p(star) from bootstrap lnZ samples,
and extend the AIS posterior draws with slice-sampling chains. The annealing
ladder, slice sweeps, and chains are all lax.scan programs, jitted per patch
shape and reused across sources.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.patches import make_patch_for_source
from ..utils import log as Log
from .ais import ais_slicesample, bootstrap_lnZ, sigmoid_schedule
from .log_prob import (SourceTarget, _render, gal_logpost, gal_logprior,
                       make_source_target, sample_gal_prior,
                       sample_star_prior, star_logpost, star_logprior,
                       uniform_to_world)
from .slice import slicesample_chain

# prior odds used to combine marginal likelihoods (mcmc_infer.jl:104-106)
LN_PRIOR_STAR = math.log(0.28)
LN_PRIOR_GAL = math.log(0.72)


def render_catalog_bg(patch, neighbor_entries):
    """Fixed background image: sky plus neighbors rendered from their
    catalog parameters (mcmc_misc.jl:284-305)."""
    bg = patch.sky
    if not neighbor_entries:
        return bg
    tgt = SourceTarget(
        pixels=patch.pixels, mask=patch.mask, iota=patch.iota, bg_nmgy=bg,
        psf=patch.psf, wcs_jacobian=patch.wcs_jacobian,
        world_center=patch.world_center, pixel_center=patch.pixel_center,
        offset=patch.offset, world_lo=jnp.zeros(2), world_hi=jnp.ones(2))
    for ce in neighbor_entries:
        pos = jnp.asarray(np.asarray(ce.pos))
        if ce.is_star:
            bg = bg + _render(tgt, pos, jnp.asarray(ce.star_fluxes))
        else:
            shape = jnp.asarray([ce.gal_frac_dev, ce.gal_axis_ratio,
                                 ce.gal_angle, ce.gal_radius_px])
            bg = bg + _render(tgt, pos, jnp.asarray(ce.gal_fluxes), shape)
    return bg


def _ais_both_models_impl(key, tgt: SourceTarget, num_temperatures=50,
                          num_samples=10, num_samples_per_chain=25,
                          num_bootstrap=1000):
    """AIS + posterior chains for star and galaxy models on one target.
    Pure (unjitted) so it can be vmapped across sources — see
    run_ais_batched."""
    schedule = jnp.asarray(sigmoid_schedule(num_temperatures, rad=4.0))
    k_star, k_gal, k_cs, k_cg, k_bs, k_bg = jax.random.split(key, 6)

    res_star = ais_slicesample(
        k_star, lambda th: star_logpost(th, tgt),
        lambda th: star_logprior(th, tgt), sample_star_prior, schedule,
        num_samps=num_samples)
    res_gal = ais_slicesample(
        k_gal, lambda th: gal_logpost(th, tgt),
        lambda th: gal_logprior(th, tgt), sample_gal_prior, schedule,
        num_samps=num_samples)

    # continue each AIS draw with a posterior slice chain (mcmc_infer.jl:46-56)
    def chain(kind_key, z0, is_star):
        lnpdf = ((lambda th: star_logpost(th, tgt)) if is_star
                 else (lambda th: gal_logpost(th, tgt)))
        return slicesample_chain(kind_key, z0, lnpdf, num_samples_per_chain)

    star_chains, star_lls = jax.vmap(lambda k, z: chain(k, z, True))(
        jax.random.split(k_cs, num_samples), res_star["zsamps"])
    gal_chains, gal_lls = jax.vmap(lambda k, z: chain(k, z, False))(
        jax.random.split(k_cg, num_samples), res_gal["zsamps"])

    boot_star = bootstrap_lnZ(k_bs, res_star["lnZsamps"], num_bootstrap)
    boot_gal = bootstrap_lnZ(k_bg, res_gal["lnZsamps"], num_bootstrap)

    # p(star | data) ∝ p(data | star) p(star) over the bootstrap draws
    ln_star = boot_star + LN_PRIOR_STAR
    ln_gal = boot_gal + LN_PRIOR_GAL
    lnsum = jnp.logaddexp(ln_star, ln_gal)
    type_chain = ln_star - lnsum
    ave_pstar = jax.scipy.special.logsumexp(type_chain) \
        - jnp.log(type_chain.shape[0])

    return {
        "star_lnZ": res_star["lnZ"], "gal_lnZ": res_gal["lnZ"],
        "star_lnZ_bootstrap": boot_star, "gal_lnZ_bootstrap": boot_gal,
        "star_samples": star_chains, "star_lls": star_lls,
        "gal_samples": gal_chains, "gal_lls": gal_lls,
        "type_chain": type_chain, "ave_pstar": jnp.exp(ave_pstar),
    }


_ais_both_models = partial(jax.jit, static_argnames=(
    "num_temperatures", "num_samples", "num_samples_per_chain",
    "num_bootstrap"))(_ais_both_models_impl)


@partial(jax.jit, static_argnames=("num_temperatures", "num_samples",
                                   "num_samples_per_chain", "num_bootstrap"))
def _ais_many_sources(keys, tgts: SourceTarget, nb_pos, nb_star_fluxes,
                      nb_gal_fluxes, nb_shape, nb_is_star, nb_valid,
                      num_temperatures=50, num_samples=10,
                      num_samples_per_chain=25, num_bootstrap=1000):
    """One launch for S sources: render each target's neighbor background
    from catalog parameters, then vmap the full star+galaxy AIS program
    across the source axis — the MCMC counterpart of the VI path's batched
    fit_sources (the reference threads per-source AIS across CPUs,
    ParallelRun.jl:546-607; here lanes replace threads).

    tgts: SourceTarget with leading S axis, bg_nmgy = sky only.
    nb_*: (S, NB, ...) padded neighbor catalog params; nb_valid masks real
    neighbors."""

    def render_bg(tgt, pos, sf, gf, shape, is_star, valid):
        def per_nb(p, sfl, gfl, sh, st, v):
            star_img = _render(tgt, p, sfl)
            gal_img = _render(tgt, p, gfl, sh)
            return v * jnp.where(st, star_img, gal_img)
        return tgt.bg_nmgy + jax.vmap(per_nb)(
            pos, sf, gf, shape, is_star, valid).sum(0)

    def one_source(key, tgt, pos, sf, gf, shape, is_star, valid):
        bg = render_bg(tgt, pos, sf, gf, shape, is_star, valid)
        return _ais_both_models_impl(
            key, tgt._replace(bg_nmgy=bg),
            num_temperatures=num_temperatures, num_samples=num_samples,
            num_samples_per_chain=num_samples_per_chain,
            num_bootstrap=num_bootstrap)

    return jax.vmap(one_source)(keys, tgts, nb_pos, nb_star_fluxes,
                                nb_gal_fluxes, nb_shape, nb_is_star,
                                nb_valid)


def run_ais(ce, images, patch=None, neighbor_entries=(), pos_delta=(2.0, 2.0),
            num_temperatures=50, num_samples=10, num_samples_per_chain=25,
            radius=8.0, tile_size=32, seed=0):
    """AIS star-vs-galaxy inference for one source (mcmc_infer.jl:10-135).

    Returns a dict of chains, lnZ bootstrap draws and ave_pstar. The chains'
    position columns are converted back to world coordinates.
    """
    if patch is None:
        patch = make_patch_for_source(images, ce.pos, radius=radius,
                                      tile_size=tile_size)
    bg = render_catalog_bg(patch, neighbor_entries)
    tgt = make_source_target(patch, bg_nmgy=bg, pos_delta=pos_delta,
                             image=images[0] if images else None,
                             entry_pos=ce.pos)
    key = jax.random.PRNGKey(seed)
    out = _ais_both_models(key, tgt, num_temperatures=num_temperatures,
                           num_samples=num_samples,
                           num_samples_per_chain=num_samples_per_chain)
    out = {k: np.array(v) for k, v in out.items()}  # writable host copies

    for name in ("star_samples", "gal_samples"):
        flat = out[name].reshape(-1, out[name].shape[-1])
        flat[:, 5:7] = np.asarray(
            jax.vmap(lambda u: uniform_to_world(u, tgt))(
                jnp.asarray(flat[:, 5:7])))
        out[name] = flat
    out["star_lls"] = out["star_lls"].reshape(-1)
    out["gal_lls"] = out["gal_lls"].reshape(-1)
    out["ave_pstar"] = float(out["ave_pstar"])
    return out


def run_ais_batched(catalog, images, targets=None, neighbor_map=None,
                    radii=None, num_temperatures=50, num_samples=10,
                    num_samples_per_chain=25, pos_delta=(2.0, 2.0),
                    max_neighbors=8, seed=0, config=None, chunk_lanes=32):
    """Batched AIS over many sources: one device launch per <=chunk_lanes
    chunk of the target list (vs the reference's per-source thread loop,
    ParallelRun.jl:546-607). Returns a list of per-source result dicts in
    target order, same schema as run_ais.

    chunk_lanes: lane cap per launch. The AIS program's working set scales
    with lanes x (temperature ladder x slice-sweep state x posterior
    chains); one 64-lane launch crashed the TPU runtime ("UNAVAILABLE:
    worker restarted" at result transfer, benchmark/mcmc_results.md round
    2). Chunks reuse the same compiled program (power-of-two lane widths),
    bound the device working set AND the per-transfer size, and stream
    results back chunk by chunk."""
    from ..parallel.run import _tile_for_radius, find_neighbors, patch_radii
    from ..utils.config import Config

    config = config or Config()
    targets = (list(range(len(catalog))) if targets is None
               else list(targets))
    if not targets:
        return []
    if radii is None:
        radii = patch_radii(catalog, images, config)
    if neighbor_map is None:
        neighbor_map = find_neighbors(catalog, radii, images)

    # one shared tile across chunks: launch shapes are compile keys
    tile = max(_tile_for_radius(radii[s]) for s in targets)
    results = []
    for i0 in range(0, len(targets), chunk_lanes):
        results.extend(_run_ais_chunk(
            catalog, images, targets[i0:i0 + chunk_lanes], neighbor_map,
            radii, tile, num_temperatures, num_samples,
            num_samples_per_chain, pos_delta, max_neighbors,
            seed + 7919 * (i0 // chunk_lanes)))
    return results


def _run_ais_chunk(catalog, images, targets, neighbor_map, radii, tile,
                   num_temperatures, num_samples, num_samples_per_chain,
                   pos_delta, max_neighbors, seed):
    """One padded AIS launch over <= chunk_lanes targets (see
    run_ais_batched)."""
    from ..models.patches import make_patches_batched
    from ..parallel.run import _next_pow2

    S = len(targets)
    S_pad = _next_pow2(S)
    lanes = targets + [targets[0]] * (S_pad - S)

    positions = [catalog[s].pos for s in lanes]
    patches = make_patches_batched(images, positions,
                                   [radii[s] for s in lanes], tile)
    tgt_list = [make_source_target(p, pos_delta=pos_delta,
                                   image=images[0] if images else None,
                                   entry_pos=catalog[s].pos)
                for p, s in zip(patches, lanes)]
    tgts = jax.tree.map(lambda *xs: jnp.stack(xs), *tgt_list)

    NB = max_neighbors
    nb_pos = np.zeros((S_pad, NB, 2))
    nb_sf = np.zeros((S_pad, NB, 5))
    nb_gf = np.zeros((S_pad, NB, 5))
    nb_shape = np.tile(np.array([0.5, 0.7, 0.0, 1.0]), (S_pad, NB, 1))
    nb_star = np.zeros((S_pad, NB), dtype=bool)
    nb_valid = np.zeros((S_pad, NB))
    for i, s in enumerate(lanes):
        nbs = list(neighbor_map.get(s, ()))[:NB]
        for k, n in enumerate(nbs):
            ce = catalog[n]
            nb_pos[i, k] = np.asarray(ce.pos)
            nb_sf[i, k] = np.asarray(ce.star_fluxes)
            nb_gf[i, k] = np.asarray(ce.gal_fluxes)
            nb_shape[i, k] = [ce.gal_frac_dev, ce.gal_axis_ratio,
                              ce.gal_angle, ce.gal_radius_px]
            nb_star[i, k] = bool(ce.is_star)
            nb_valid[i, k] = 1.0
    keys = jax.random.split(jax.random.PRNGKey(seed), S_pad)

    out = _ais_many_sources(
        keys, tgts, jnp.asarray(nb_pos), jnp.asarray(nb_sf),
        jnp.asarray(nb_gf), jnp.asarray(nb_shape), jnp.asarray(nb_star),
        jnp.asarray(nb_valid), num_temperatures=num_temperatures,
        num_samples=num_samples,
        num_samples_per_chain=num_samples_per_chain)
    out = {k: np.asarray(v) for k, v in out.items()}

    lo = np.stack([np.asarray(t.world_lo) for t in tgt_list])  # (S_pad, 2)
    hi = np.stack([np.asarray(t.world_hi) for t in tgt_list])
    results = []
    for i in range(S):
        res = {k: np.array(v[i]) for k, v in out.items()}
        for name in ("star_samples", "gal_samples"):
            flat = res[name].reshape(-1, res[name].shape[-1])
            flat[:, 5:7] = lo[i] + (hi[i] - lo[i]) * flat[:, 5:7]
            res[name] = flat
        res["star_lls"] = res["star_lls"].reshape(-1)
        res["gal_lls"] = res["gal_lls"].reshape(-1)
        res["ave_pstar"] = float(res["ave_pstar"])
        results.append(res)
    return results


def run_mcmc(ce, images, patch=None, neighbor_entries=(),
             pos_delta=(2.0, 2.0), num_samples=500, radius=8.0,
             tile_size=32, seed=0):
    """Plain slice-sampling chain under the model matching the catalog type
    (mcmc_infer.jl:141+)."""
    from .log_prob import gal_params_from_catalog, star_params_from_catalog

    if patch is None:
        patch = make_patch_for_source(images, ce.pos, radius=radius,
                                      tile_size=tile_size)
    bg = render_catalog_bg(patch, neighbor_entries)
    tgt = make_source_target(patch, bg_nmgy=bg, pos_delta=pos_delta,
                             image=images[0] if images else None,
                             entry_pos=ce.pos)
    key = jax.random.PRNGKey(seed)
    if ce.is_star:
        th0 = jnp.asarray(star_params_from_catalog(ce, tgt))
        lnpdf = lambda th: star_logpost(th, tgt)  # noqa: E731
    else:
        th0 = jnp.asarray(gal_params_from_catalog(ce, tgt))
        lnpdf = lambda th: gal_logpost(th, tgt)  # noqa: E731
    samps, lls = jax.jit(
        lambda k, z: slicesample_chain(k, z, lnpdf, num_samples))(key, th0)
    samps = np.array(samps)
    samps[:, 5:7] = np.asarray(
        jax.vmap(lambda u: uniform_to_world(u, tgt))(
            jnp.asarray(samps[:, 5:7])))
    return samps, np.asarray(lls)


def potential_scale_reduction(chains):
    """Gelman-Rubin PSRF over (M, N, D) chains (mcmc_misc.jl:339-368)."""
    chains = np.asarray(chains)
    M, N, D = chains.shape
    means = chains.mean(axis=1)                   # (M, D)
    B = N * means.var(axis=0, ddof=1)             # between-chain
    W = chains.var(axis=1, ddof=1).mean(axis=0)   # within-chain
    var_hat = (N - 1) / N * W + B / N
    return np.sqrt(var_hat / np.maximum(W, 1e-30))


def one_node_mcmc_infer(catalog, images, target_sources=None, config=None,
                        seed=0):
    """MCMC (AIS) over every target source as ONE batched launch; neighbors
    rendered as fixed background from their catalog entries
    (ParallelRun.jl:504-543, threads -> vmap lanes)."""
    import time as _time

    from ..utils.config import Config

    config = config or Config()
    targets = (list(range(len(catalog))) if target_sources is None
               else list(target_sources))
    t0 = _time.perf_counter()
    results = run_ais_batched(
        catalog, images, targets=targets,
        num_temperatures=config.num_ais_temperatures,
        num_samples=config.num_ais_samples, seed=seed, config=config)
    wall = _time.perf_counter() - t0
    Log.info(f"mcmc: {len(targets)} sources in one batched AIS launch "
             f"({wall:.2f}s, {len(targets) / max(wall, 1e-9):.2f} "
             "sources/s)")
    for s, res in zip(targets, results):
        ce = catalog[s]
        res["objid"] = getattr(ce, "objid", "")
        res["init_pos"] = np.asarray(ce.pos)
    return results


# ---------------------------------------------------------------------------
# Chain reporting (mcmc_misc.jl:105-168)
# ---------------------------------------------------------------------------

def samples_to_dataframe(chain, is_star=True):
    """MCMC samples -> DataFrame with catalog-comparable columns
    (mcmc_misc.jl:105-133): reference-band flux + colors from lnfluxes,
    world position, galaxy shape with the radius scaled to the
    effective-radius convention (px * sqrt(axis_ratio))."""
    import pandas as pd

    chain = np.asarray(chain)
    df = pd.DataFrame({
        "log_flux_r": chain[:, 2],
        "flux_r_nmgy": np.exp(chain[:, 2]),
        "color_ug": chain[:, 1] - chain[:, 0],
        "color_gr": chain[:, 2] - chain[:, 1],
        "color_ri": chain[:, 3] - chain[:, 2],
        "color_iz": chain[:, 4] - chain[:, 3],
        "ra": chain[:, 5], "dec": chain[:, 6],
    })
    if not is_star:
        df["gal_frac_dev"] = chain[:, 7]
        df["gal_axis_ratio"] = chain[:, 8]
        df["gal_angle_deg"] = np.degrees(chain[:, 9])
        df["gal_radius_px"] = chain[:, 10] * np.sqrt(chain[:, 8])
    return df


def samples_to_row(sampdf, is_star=True):
    """Summarize a chain DataFrame into one catalog row (posterior means +
    stderr columns, mcmc_misc.jl:137-168)."""
    row = {
        "ra": sampdf["ra"].mean(), "dec": sampdf["dec"].mean(),
        "is_star": 1.0 if is_star else 0.0,
        "flux_r_nmgy": sampdf["flux_r_nmgy"].mean(),
        "log_flux_r": sampdf["log_flux_r"].mean(),
        "log_flux_r_stderr": sampdf["log_flux_r"].std(ddof=1),
        "gal_frac_dev": np.nan, "gal_axis_ratio": np.nan,
        "gal_radius_px": np.nan, "gal_angle_deg": np.nan,
    }
    for c in ("color_ug", "color_gr", "color_ri", "color_iz"):
        row[c] = sampdf[c].mean()
        row[f"{c}_stderr"] = sampdf[c].std(ddof=1)
    if not is_star:
        for c in ("gal_frac_dev", "gal_axis_ratio", "gal_radius_px",
                  "gal_angle_deg"):
            row[c] = sampdf[c].mean()
    return row


def mcmc_to_df(results, num_chains=10):
    """one_node_mcmc_infer results -> catalog DataFrame (the MCMC
    counterpart of accuracy.celeste_to_df), with per-source p(star), lnZ
    diagnostics and the Gelman-Rubin PSRF of the winning model's chains.

    num_chains: the AIS num_samples used (each AIS draw seeds one posterior
    chain; the flattened (num_samples * n_per_chain, D) sample arrays are
    reshaped back for the PSRF)."""
    import pandas as pd

    rows = []
    for res in results:
        is_star = res["ave_pstar"] > 0.5
        chain = np.asarray(res["star_samples" if is_star
                               else "gal_samples"])
        row = samples_to_row(samples_to_dataframe(chain, is_star), is_star)
        row["is_star"] = float(res["ave_pstar"])
        row["objid"] = res.get("objid", "")
        row["star_lnZ"] = float(res["star_lnZ"])
        row["gal_lnZ"] = float(res["gal_lnZ"])
        n_per = len(chain) // max(num_chains, 1)
        if num_chains > 1 and n_per > 1:
            shaped = chain[:num_chains * n_per].reshape(
                num_chains, n_per, -1)
            row["max_psrf"] = float(potential_scale_reduction(shaped).max())
        else:
            row["max_psrf"] = np.nan
        rows.append(row)
    return pd.DataFrame(rows)
