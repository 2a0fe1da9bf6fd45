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


@partial(jax.jit, static_argnames=("num_temperatures", "num_samples",
                                   "num_samples_per_chain", "num_bootstrap"))
def _ais_both_models(key, tgt: SourceTarget, num_temperatures=50,
                     num_samples=10, num_samples_per_chain=25,
                     num_bootstrap=1000):
    """AIS + posterior chains for star and galaxy models on one target."""
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
    """MCMC (AIS) over every target source; neighbors rendered as fixed
    background from their catalog entries (ParallelRun.jl:504-543)."""
    from ..parallel.run import find_neighbors, patch_radii
    from ..utils.config import Config

    config = config or Config()
    targets = (list(range(len(catalog))) if target_sources is None
               else list(target_sources))
    radii = patch_radii(catalog, images, config)
    neighbor_map = find_neighbors(catalog, radii, images)
    results = []
    for s in targets:
        ce = catalog[s]
        nbs = [catalog[n] for n in neighbor_map[s]]
        Log.info(f"mcmc: source {s} ({'star' if ce.is_star else 'gal'}), "
                 f"{len(nbs)} neighbors")
        res = run_ais(ce, images, neighbor_entries=nbs,
                      num_temperatures=config.num_ais_temperatures,
                      num_samples=config.num_ais_samples,
                      radius=float(radii[s]), seed=seed + s)
        res["objid"] = getattr(ce, "objid", "")
        res["init_pos"] = np.asarray(ce.pos)
        results.append(res)
    return results
