"""Synthetic image generation (ground truth for tests & benchmarks).

Counterpart of src/Synthetic.jl: renders catalog entries into images with the
*same* forward model used for inference (unit-flux GMM densities x flux),
then applies Poisson noise: pixels ~ Poisson(iota * (sky + sum_s flux_s *
density_s)). (Synthetic.jl:30-47.)
"""

import numpy as np
import jax.numpy as jnp

from .models.fsm import star_density_grid, galaxy_density_grid
from .models.image import Image, CatalogEntry
from .models.patches import make_patch_for_source


def render_source_nmgy(img: Image, ce: CatalogEntry, tile_size=None,
                       radius=25):
    """Expected nMgy image contribution of one source (whole image).

    Renders on a tile around the source and scatters into an (H, W) array.
    """
    H, W = img.H, img.W
    P = tile_size or int(2 * radius + 8)
    patch = make_patch_for_source([img], ce.pos, radius, P)
    b = 0
    args = (patch.psf[b], patch.wcs_jacobian[b], patch.world_center[b],
            patch.pixel_center[b], patch.offset[b], P)
    pos = jnp.asarray(np.asarray(ce.pos))  # f64 under x64, else f32
    if ce.is_star:
        dens = star_density_grid(pos, *args)
        flux = ce.star_fluxes[img.band]
    else:
        dens = galaxy_density_grid(
            pos, float(ce.gal_frac_dev), float(ce.gal_axis_ratio),
            float(ce.gal_angle), float(ce.gal_radius_px), *args)
        flux = ce.gal_fluxes[img.band]
    tile = np.asarray(dens) * float(flux)

    out = np.zeros((H, W))
    off = np.asarray(patch.offset[b])
    i0, i1 = max(0, off[0]), min(H, off[0] + P)
    j0, j1 = max(0, off[1]), min(W, off[1] + P)
    if i0 < i1 and j0 < j1:
        out[i0:i1, j0:j1] = tile[i0 - off[0]:i1 - off[0],
                                 j0 - off[1]:j1 - off[1]]
    return out


def gen_image(img: Image, bodies, expectation=False, rng=None):
    """Overwrite img.pixels with a synthetic render of `bodies`."""
    rng = rng or np.random.default_rng(42)
    s = img.sky
    nmgy = (np.array(s, dtype=np.float64) * np.ones((img.H, img.W))
            if np.ndim(s) != 2 else np.array(s, dtype=np.float64))
    for ce in bodies:
        nmgy += render_source_nmgy(img, ce)
    io_ = img.nelec_per_nmgy
    electrons = nmgy * (np.asarray(io_)[:, None] if np.ndim(io_) == 1 else io_)
    img.pixels = electrons if expectation else rng.poisson(
        electrons).astype(np.float64)
    return img


def gen_images(images, bodies, expectation=False, seed=42):
    rng = np.random.default_rng(seed)
    for img in images:
        gen_image(img, bodies, expectation=expectation, rng=rng)
    return images


_DENSITY_BATCH_CACHE = {}


def _batched_density_fns(P):
    """jitted vmapped star/galaxy tile renderers for a static tile size."""
    import jax
    if P not in _DENSITY_BATCH_CACHE:
        star = jax.jit(jax.vmap(
            lambda pos, psf, jac, wc, pc, off: star_density_grid(
                pos, psf, jac, wc, pc, off, P)))
        gal = jax.jit(jax.vmap(
            lambda pos, fd, ar, an, rad, psf, jac, wc, pc, off:
            galaxy_density_grid(pos, fd, ar, an, rad, psf, jac, wc, pc,
                                off, P)))
        _DENSITY_BATCH_CACHE[P] = (star, gal)
    return _DENSITY_BATCH_CACHE[P]


def gen_images_fast(images, bodies, expectation=False, seed=42, radius=25):
    """gen_images with batched rendering: ALL sources' tiles per band come
    from ONE vmapped launch per source type (2 launches/band) instead of one
    device round trip per source per band — the per-call latency (not the
    FLOPs) dominates gen_images at benchmark scale, especially over the
    tunneled TPU. Same forward model, same per-image Poisson rng order;
    tiles are accumulated host-side in `bodies` order, so results match
    gen_images up to f64 summation-order roundoff inside each tile render.
    """
    from .models.patches import make_patches_batched

    rng = np.random.default_rng(seed)
    S = len(bodies)
    if S == 0:
        return gen_images(images, bodies, expectation=expectation, seed=seed)
    P = int(2 * radius + 8)
    positions = np.array([np.asarray(ce.pos, np.float64) for ce in bodies])
    patches = make_patches_batched(images, positions,
                                   np.full(S, float(radius)), P)
    is_star = np.array([ce.is_star for ce in bodies])
    stars = np.flatnonzero(is_star)
    gals = np.flatnonzero(~is_star)
    star_fn, gal_fn = _batched_density_fns(P)

    pos_j = jnp.asarray(positions)
    for b, img in enumerate(images):
        psf = jnp.asarray(np.stack([p.psf[b] for p in patches]))
        jac = jnp.asarray(np.stack([p.wcs_jacobian[b] for p in patches]))
        wc = jnp.asarray(np.stack([p.world_center[b] for p in patches]))
        pc = jnp.asarray(np.stack([p.pixel_center[b] for p in patches]))
        off = jnp.asarray(np.stack([p.offset[b] for p in patches]))

        tiles = np.zeros((S, P, P))
        if len(stars):
            tiles[stars] = np.asarray(star_fn(
                pos_j[stars], psf[stars], jac[stars], wc[stars], pc[stars],
                off[stars]))
        if len(gals):
            g = np.array([[ce.gal_frac_dev, ce.gal_axis_ratio, ce.gal_angle,
                           ce.gal_radius_px] for ce in bodies])[gals]
            tiles[gals] = np.asarray(gal_fn(
                pos_j[gals], jnp.asarray(g[:, 0]), jnp.asarray(g[:, 1]),
                jnp.asarray(g[:, 2]), jnp.asarray(g[:, 3]), psf[gals],
                jac[gals], wc[gals], pc[gals], off[gals]))

        H, W = img.H, img.W
        s = img.sky
        nmgy = (np.array(s, dtype=np.float64) * np.ones((H, W))
                if np.ndim(s) != 2 else np.array(s, dtype=np.float64))
        offs = np.stack([p.offset[b] for p in patches])
        for si, ce in enumerate(bodies):  # bodies order = gen_image order
            flux = (ce.star_fluxes if ce.is_star else ce.gal_fluxes)[img.band]
            o = offs[si]
            i0, i1 = max(0, o[0]), min(H, o[0] + P)
            j0, j1 = max(0, o[1]), min(W, o[1] + P)
            if i0 < i1 and j0 < j1:
                nmgy[i0:i1, j0:j1] += float(flux) * tiles[
                    si, i0 - o[0]:i1 - o[0], j0 - o[1]:j1 - o[1]]
        io_ = img.nelec_per_nmgy
        electrons = nmgy * (np.asarray(io_)[:, None] if np.ndim(io_) == 1
                            else io_)
        img.pixels = electrons if expectation else rng.poisson(
            electrons).astype(np.float64)
    return images


def make_blank_images(H=40, W=40, sky_nmgy=0.1, nelec_per_nmgy=1000.0,
                      psf=None, n_bands=5):
    from .models.psf import gaussian_psf
    psf = psf if psf is not None else gaussian_psf()
    return [Image(pixels=np.zeros((H, W)), band=b, psf=psf, sky=sky_nmgy,
                  nelec_per_nmgy=nelec_per_nmgy) for b in range(n_bands)]


def sample_star(pos=(20.0, 20.0), r_flux=10.0):
    """A star catalog entry with colors drawn near the prior means."""
    fluxes = flux_from_colors(r_flux, np.zeros(4))
    return CatalogEntry(pos=np.asarray(pos, dtype=np.float64), is_star=True,
                        star_fluxes=fluxes, gal_fluxes=np.maximum(fluxes, 0.1))


def sample_galaxy(pos=(20.0, 20.0), r_flux=10.0, gal_frac_dev=0.3,
                  gal_axis_ratio=0.7, gal_angle=0.5, gal_radius_px=2.0):
    fluxes = flux_from_colors(r_flux, np.zeros(4))
    return CatalogEntry(pos=np.asarray(pos, dtype=np.float64), is_star=False,
                        star_fluxes=np.maximum(fluxes, 0.1),
                        gal_fluxes=fluxes, gal_frac_dev=gal_frac_dev,
                        gal_axis_ratio=gal_axis_ratio, gal_angle=gal_angle,
                        gal_radius_px=gal_radius_px)


def flux_from_colors(r_flux, colors):
    """5-band fluxes from an r-band flux and 4 log color ratios
    (Synthetic.jl:66-77)."""
    l = np.zeros(5)
    l[2] = r_flux
    l[3] = l[2] * np.exp(colors[2])
    l[4] = l[3] * np.exp(colors[3])
    l[1] = l[2] / np.exp(colors[1])
    l[0] = l[1] / np.exp(colors[0])
    return l


# ---------------------------------------------------------------------------
# Vectorized patch-batch generation (benchmark / smoke workloads)
# ---------------------------------------------------------------------------

def synthetic_patch_batch(n_sources, tile=32, radius=None, sky_nmgy=0.1,
                          nelec_per_nmgy=1000.0, seed=0, n_bands=5, psf=None,
                          star_fraction=0.5, dtype=np.float32):
    """Generate (catalog, vp0s, SkyPatch) for `n_sources` independent
    synthetic sources, each centered on its own (n_bands, tile, tile) patch.

    Unlike gen_images (which renders whole survey images host-side, one
    source at a time), this renders every source's expected patch in a single
    vmapped jit launch — the fast path for benchmarks and smoke tests. Truth
    is drawn per source: r-band flux log-uniform in [10, 80] nMgy, colors
    near zero, galaxy shape from broad ranges.
    """
    import jax

    from .models.patches import SkyPatch
    from .models.psf import gaussian_psf
    from .vi.init import generic_init_source

    rng = np.random.default_rng(seed)
    radius = radius if radius is not None else tile // 2 - 2
    psf = np.asarray(psf if psf is not None else gaussian_psf(), dtype=dtype)
    K = psf.shape[0]
    ctr = (tile + 1) / 2.0

    pos = ctr + rng.uniform(-0.5, 0.5, size=(n_sources, 2))
    is_star = rng.uniform(size=n_sources) < star_fraction
    r_flux = np.exp(rng.uniform(np.log(10.0), np.log(80.0), size=n_sources))
    colors = rng.normal(0.0, 0.2, size=(n_sources, 4))
    frac_dev = rng.uniform(0.1, 0.9, size=n_sources)
    axis_ratio = rng.uniform(0.3, 0.95, size=n_sources)
    angle = rng.uniform(0.0, np.pi, size=n_sources)
    radius_px = np.exp(rng.uniform(np.log(0.7), np.log(3.0), size=n_sources))

    catalog = []
    for s in range(n_sources):
        fluxes = flux_from_colors(r_flux[s], colors[s])
        catalog.append(CatalogEntry(
            pos=pos[s], is_star=bool(is_star[s]),
            star_fluxes=fluxes if is_star[s] else np.maximum(fluxes, 0.1),
            gal_fluxes=np.maximum(fluxes, 0.1) if is_star[s] else fluxes,
            gal_frac_dev=frac_dev[s], gal_axis_ratio=axis_ratio[s],
            gal_angle=angle[s], gal_radius_px=radius_px[s]))

    # SkyPatch metadata (identity WCS, tile corner at 0)
    B = n_bands
    zeros = np.zeros((n_sources, B, 2), dtype=np.int32)
    jac = np.broadcast_to(np.eye(2, dtype=dtype), (n_sources, B, 2, 2))
    wc = np.broadcast_to(pos[:, None, :].astype(dtype), (n_sources, B, 2))
    psf_b = np.broadcast_to(psf, (n_sources, B, K, 6))
    sky = np.full((n_sources, B, tile, tile), sky_nmgy, dtype=dtype)
    iota = np.full((n_sources, B, tile, tile), nelec_per_nmgy, dtype=dtype)

    ii = np.arange(1, tile + 1, dtype=dtype)
    inbox = ((np.abs(ii[:, None] - ctr) <= radius)
             & (np.abs(ii[None, :] - ctr) <= radius))
    mask = np.broadcast_to(inbox, (n_sources, B, tile, tile))

    from .models.fsm import galaxy_density_grid, star_density_grid

    def render_one(pos_s, shape_s, fluxes_s, is_star_s, psf_s):
        # bands vmapped, not unrolled: 5x smaller jaxpr, much faster XLA
        # compile (matters on cold caches — fsm.source_densities_all_bands
        # applies the same trick)
        def one_band(psf_b, flux_b):
            args = (psf_b, jnp.eye(2, dtype=psf_b.dtype), pos_s, pos_s,
                    jnp.zeros(2, dtype=jnp.int32), tile)
            fs0 = star_density_grid(pos_s, *args)
            fs1 = galaxy_density_grid(pos_s, shape_s[0], shape_s[1],
                                      shape_s[2], shape_s[3], *args)
            return flux_b * jnp.where(is_star_s, fs0, fs1)
        return jax.vmap(one_band)(psf_s, fluxes_s)

    shapes = np.stack([frac_dev, axis_ratio, angle, radius_px],
                      axis=1).astype(dtype)
    fluxes = np.stack([ce.star_fluxes if ce.is_star else ce.gal_fluxes
                       for ce in catalog]).astype(dtype)
    nmgy = jax.jit(jax.vmap(render_one))(
        pos.astype(dtype), shapes, fluxes, is_star, psf_b)
    electrons = (np.asarray(nmgy) + sky_nmgy) * nelec_per_nmgy
    pixels = rng.poisson(np.maximum(electrons, 0.0)).astype(dtype)

    patches = SkyPatch(
        pixels=jnp.asarray(pixels), mask=jnp.asarray(mask),
        sky=jnp.asarray(sky), iota=jnp.asarray(iota),
        offset=jnp.asarray(zeros), wcs_jacobian=jnp.asarray(np.ascontiguousarray(jac)),
        world_center=jnp.asarray(np.ascontiguousarray(wc)),
        pixel_center=jnp.asarray(np.ascontiguousarray(wc)),
        psf=jnp.asarray(np.ascontiguousarray(psf_b)))
    vp0s = np.stack([generic_init_source(ce.pos) for ce in catalog])
    return catalog, vp0s.astype(dtype), patches
