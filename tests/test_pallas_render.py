"""Fused mixture-render + Poisson kernel (ops/pallas_render) parity:
the XLA reference path, the Pallas kernel in interpret mode, and the
original render-then-score path must all agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.mcmc.log_prob import (
    SourceTarget, _fused_loglike, _pack_source_comps, _poisson_ll, _render,
    make_source_target, star_loglike, uniform_to_world)
from celeste_jl_tpu.models.patches import make_patch_for_source, stack_patches
from celeste_jl_tpu.ops.pallas_render import mixture_poisson_ll
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_galaxy, sample_star)


@pytest.fixture(scope="module")
def target():
    images = make_blank_images(H=48, W=48, sky_nmgy=0.1,
                               nelec_per_nmgy=900.0)
    truth = [sample_star(pos=(24.0, 24.0), r_flux=30.0)]
    gen_images(images, truth, seed=7)
    patch = jax.tree.map(
        lambda x: x[0],
        stack_patches([make_patch_for_source(images, truth[0].pos,
                                             radius=12, tile_size=32)]))
    return make_source_target(patch, entry_pos=truth[0].pos)


def _cases(tgt):
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(3):
        lnf = rng.normal(np.log(20.0), 0.3, 5)
        u = rng.uniform(0.3, 0.7, 2)
        pos = uniform_to_world(jnp.asarray(u), tgt)
        fluxes = jnp.exp(jnp.asarray(lnf))
        cases.append((pos, fluxes, None))
        shape = jnp.asarray([rng.uniform(0.1, 0.9), rng.uniform(0.2, 0.9),
                             rng.uniform(0, np.pi), rng.uniform(0.5, 3.0)])
        cases.append((pos, fluxes, shape))
    return cases


def test_fused_xla_matches_render_path(target):
    tgt = target
    for pos, fluxes, shape in _cases(tgt):
        ref = _poisson_ll(tgt, _render(tgt, pos, fluxes, shape=shape))
        fused = _fused_loglike(tgt, pos, fluxes, shape=shape)
        np.testing.assert_allclose(float(fused), float(ref), rtol=1e-10)


def test_pallas_interpret_matches_xla(target):
    tgt = target
    for pos, fluxes, shape in _cases(tgt):
        comps = _pack_source_comps(tgt, pos, shape)
        zeros = jnp.zeros_like(fluxes)
        meta = jnp.stack([tgt.offset[:, 0] + 1.0, tgt.offset[:, 1] + 1.0,
                          fluxes, zeros], axis=-1)
        maskf = tgt.mask.astype(tgt.pixels.dtype)
        x = jnp.where(tgt.mask, tgt.pixels, 0.0)
        bg = jnp.broadcast_to(tgt.bg_nmgy, tgt.pixels.shape)
        ref = mixture_poisson_ll(x, maskf, tgt.iota, bg, comps, meta,
                                 use_pallas=False)
        ker = mixture_poisson_ll(x, maskf, tgt.iota, bg, comps, meta,
                                 interpret=True)
        # kernel computes in f32
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   rtol=2e-4)


def test_fused_star_loglike_env_toggle(target, monkeypatch):
    tgt = target
    th = jnp.concatenate([jnp.log(jnp.full(5, 25.0)), jnp.full(2, 0.5)])
    monkeypatch.setenv("CELESTE_FUSED_MCMC", "0")
    ref = star_loglike(th, tgt)
    monkeypatch.setenv("CELESTE_FUSED_MCMC", "1")
    fused = star_loglike(th, tgt)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-10)
