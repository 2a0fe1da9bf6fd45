"""gen_images_fast (batched vmapped tile renders) must reproduce
gen_images (per-source device calls): same forward model, same Poisson rng
stream, tiles accumulated in the same bodies order."""

import numpy as np

from celeste_jl_tpu.synthetic import (gen_images, gen_images_fast,
                                      make_blank_images, sample_galaxy,
                                      sample_star)


def _bodies():
    return [
        sample_star(pos=(12.0, 14.0), r_flux=20.0),
        sample_galaxy(pos=(30.0, 18.0), r_flux=25.0, gal_radius_px=2.0,
                      gal_axis_ratio=0.5, gal_angle=0.7),
        sample_star(pos=(22.0, 34.0), r_flux=8.0),
        sample_galaxy(pos=(8.0, 30.0), r_flux=12.0, gal_radius_px=1.2,
                      gal_axis_ratio=0.8, gal_angle=2.1),
    ]


def test_expectation_matches():
    ref = gen_images(make_blank_images(H=44, W=44), _bodies(),
                     expectation=True)
    fast = gen_images_fast(make_blank_images(H=44, W=44), _bodies(),
                           expectation=True)
    for a, b in zip(ref, fast):
        np.testing.assert_allclose(b.pixels, a.pixels, rtol=1e-10,
                                   atol=1e-12)


def test_poisson_stream_matches():
    ref = gen_images(make_blank_images(H=44, W=44), _bodies(), seed=5)
    fast = gen_images_fast(make_blank_images(H=44, W=44), _bodies(), seed=5)
    for a, b in zip(ref, fast):
        # identical rng stream; integer draws may differ only if a rate
        # crosses a rounding boundary, which these tolerances would catch
        assert (b.pixels != a.pixels).mean() < 1e-3
        np.testing.assert_allclose(b.pixels.sum(), a.pixels.sum(), rtol=1e-3)


def test_edge_clipping():
    """Sources near the border exercise the tile-clipping scatter path."""
    bodies = [sample_star(pos=(2.0, 40.0), r_flux=30.0),
              sample_galaxy(pos=(43.0, 3.0), r_flux=30.0, gal_radius_px=1.5,
                            gal_axis_ratio=0.6, gal_angle=1.0)]
    ref = gen_images(make_blank_images(H=44, W=44), bodies, expectation=True)
    fast = gen_images_fast(make_blank_images(H=44, W=44), bodies,
                           expectation=True)
    for a, b in zip(ref, fast):
        np.testing.assert_allclose(b.pixels, a.pixels, rtol=1e-10,
                                   atol=1e-12)
