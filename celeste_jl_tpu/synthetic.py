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
    pos = jnp.asarray(ce.pos, dtype=jnp.float64)
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
