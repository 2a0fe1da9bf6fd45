"""Patch staging: the vectorized batched builder must reproduce the
per-source builder bit-for-bit, including edge clipping, TAN WCS Jacobians
and sky/iota handling."""

import numpy as np

from celeste_jl_tpu.io.wcs import LinearWCS, TanWCS
from celeste_jl_tpu.models.image import Image
from celeste_jl_tpu.models.patches import (make_patch_for_source,
                                           make_patches_batched)
from celeste_jl_tpu.models.psf import gaussian_psf


def _images(H=50, W=44, use_tan=True):
    rng = np.random.default_rng(7)
    images = []
    for b in range(3):
        if use_tan:
            wcs = TanWCS(crpix=[W / 2, H / 2], crval=[150.0, 1.0],
                         cd=np.array([[1.1e-4, 2e-6], [-1e-6, 1.0e-4]]))
        else:
            wcs = LinearWCS(crpix=(0.0, 0.0), crval=(0.0, 0.0),
                            cd=np.eye(2) * 1e-4)
        images.append(Image(
            pixels=rng.poisson(100.0, size=(H, W)).astype(np.float64),
            band=b, psf=gaussian_psf(sigma=1.2 + 0.1 * b),
            sky=rng.uniform(0.05, 0.1, size=(H, W)),
            nelec_per_nmgy=rng.uniform(900.0, 1100.0, size=H),
            wcs=wcs))
    return images


def test_batched_matches_per_source():
    images = _images()
    # positions include edge/corner/off-image cases
    pix_positions = [(25.0, 22.0), (2.0, 3.0), (49.0, 43.0), (1.0, 40.0),
                     (-5.0, 22.0)]
    world = [images[0].pix_to_world(np.asarray(p, float))
             for p in pix_positions]
    radii = np.array([8.0, 6.0, 10.0, 5.0, 8.0])
    batched = make_patches_batched(images, world, radii, tile_size=32)
    for k, (pos, r) in enumerate(zip(world, radii)):
        single = make_patch_for_source(images, pos, radius=r, tile_size=32)
        for f in single._fields:
            a = np.asarray(getattr(single, f))
            b = np.asarray(getattr(batched[k], f))
            if f in ("pixel_center", "wcs_jacobian"):
                # batched (S,2)@(2,2) world_to_pix dispatches to a different
                # BLAS kernel than the per-source (2,)@(2,2) — ~1e-12 pixel
                # differences, amplified by the finite-difference Jacobian
                np.testing.assert_allclose(a, b, rtol=1e-6,
                                           err_msg=f"{f} source {k}")
            else:
                np.testing.assert_array_equal(a, b,
                                              err_msg=f"{f} source {k}")


def test_batched_with_per_source_psfs():
    images = _images(use_tan=False)
    world = [np.array([25.0e-4, 22.0e-4]), np.array([10.0e-4, 10.0e-4])]
    psfs = np.stack([
        np.stack([np.asarray(gaussian_psf(sigma=1.0 + 0.3 * s + 0.1 * b))
                  for b in range(3)]) for s in range(2)])
    batched = make_patches_batched(images, world, [8.0, 8.0], 16, psfs=psfs)
    for s in range(2):
        np.testing.assert_array_equal(batched[s].psf, psfs[s])


def test_wcs_vectorized_round_trip():
    wcs = TanWCS(crpix=[100.0, 50.0], crval=[210.0, -5.0],
                 cd=np.array([[1.1e-4, 2e-6], [-1e-6, 1.0e-4]]))
    pix = np.array([[1.0, 1.0], [100.0, 50.0], [200.0, 90.0]])
    world = wcs.pix_to_world(pix)
    assert world.shape == (3, 2)
    back = wcs.world_to_pix(world)
    np.testing.assert_allclose(back, pix, atol=1e-9)
    # batched calls agree with scalar calls
    for i in range(3):
        np.testing.assert_allclose(wcs.pix_to_world(pix[i]), world[i])
    jac = wcs.pixel_world_jacobian(pix)
    assert jac.shape == (3, 2, 2)
    for i in range(3):
        np.testing.assert_allclose(wcs.pixel_world_jacobian(pix[i]), jac[i])
