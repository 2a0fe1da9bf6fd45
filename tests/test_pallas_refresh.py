"""Parity of the fused refresh pixel pass (ops/pallas_refresh.py) against
the host analytic-Hessian evaluator (vi/optimize._band_lik_terms):

1. the restructured jnp reference (the custom_vmap fallback) must be
   f64-exact vs _band_lik_terms up to summation order;
2. the Pallas kernel (interpret mode) must match the reference bit-for-bit
   in f64 and to roundoff in f32;
3. the full fgh evaluator with refresh_kernel="pallas" (interpreted) must
   reproduce the XLA refresh's (f, g, H) on a batch of sources.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.ops import pallas_refresh as pr
from celeste_jl_tpu.vi.elbo import brightness_coeffs
from celeste_jl_tpu.vi.optimize import _band_lik_terms


def _band_args(dtype=jnp.float64, n_sources=2, tile=16, seed=0):
    """Per-(source, band) argument tuples for both evaluators, from the
    synthetic batch the headline bench uses."""
    from __graft_entry__ import _synthetic_batch

    vp0s, patches = _synthetic_batch(n_sources=n_sources, tile=tile,
                                     seed=seed)
    vp0s = jnp.asarray(np.asarray(vp0s), dtype)
    patches = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), dtype)
                           if np.asarray(x).dtype.kind == "f" else x,
                           patches)
    args = []
    for s in range(n_sources):
        vp = vp0s[s]
        theta6 = vp[0:6]
        C20 = brightness_coeffs(vp)
        cl = C20[:10].reshape(5, 2)
        cll = C20[10:].reshape(5, 2)
        p = jax.tree.map(lambda x, s=s: x[s], patches)
        P = tuple(np.asarray(p.pixels).shape[-2:])
        zero = jnp.zeros_like(p.sky)
        for b in range(5):
            args.append((theta6, cl[b], cll[b], p.psf[b],
                         p.wcs_jacobian[b], p.world_center[b],
                         p.pixel_center[b], p.offset[b], p.pixels[b],
                         p.mask[b], p.sky[b], p.iota[b], zero[b], zero[b],
                         P))
    return args


def _assert_terms_close(got, want, rtol, atol_scale=1.0):
    names = ("lik", "g_theta", "g_C", "H_tt", "H_tC", "H_CC")
    for name, a, b in zip(names, got, want):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.max(np.abs(b)), 1.0)
        np.testing.assert_allclose(a, b, rtol=rtol,
                                   atol=rtol * scale * atol_scale,
                                   err_msg=name)


def test_reference_matches_band_lik_terms_f64():
    for a in _band_args(jnp.float64):
        want = _band_lik_terms(*a)
        got = pr.band_lik_terms_fused(*a)
        _assert_terms_close(got, want, rtol=1e-9)


def test_kernel_interpret_matches_reference_f64():
    """The kernel math path itself (interpret mode, f64): bit-level
    agreement modulo reduction order with the jnp reference rows."""
    a = _band_args(jnp.float64)[0]
    (theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b, pixels_b,
     mask_b, sky_b, iota_b, bgE, bgV, P) = a

    from celeste_jl_tpu.models import mixture_derivs as md

    sm = md.star_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    gm = md.galaxy_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    ks = sm[0].shape[0]
    means = jnp.concatenate([sm[0], gm[0]], 0)
    covs = jnp.concatenate([sm[1], gm[1]], 0)
    weights = jnp.concatenate([sm[2], gm[2]], 0)
    chain = jnp.concatenate([sm[3], gm[3]], 0)
    c00, c01, c11 = covs[:, 0, 0], covs[:, 0, 1], covs[:, 1, 1]
    det = c00 * c11 - c01 * c01
    L00, L01, L11 = c11 / det, -c01 / det, c00 / det
    z = weights / (md.TWO_PI * jnp.sqrt(det))
    lv = jnp.stack([L00, L01, L11], -1)
    pch = jnp.einsum("cat,cab->ctb", chain, md.eta_basis_rows(L00, L01, L11))
    cl4 = jnp.stack([clb[0], clb[1], cllb[0], cllb[1]])
    dtype = pixels_b.dtype
    pix = pixels_b.reshape(-1)
    msk = mask_b.reshape(-1).astype(dtype)
    iot = iota_b.reshape(-1)
    a0 = sky_b.reshape(-1)
    b0 = jnp.zeros_like(a0)

    ref = pr._pixel_terms_row(means, lv, z, pch, cl4, off_b, pix, msk,
                              iot, a0, b0, ks=ks, pdims=P)
    add1 = lambda x: x[None]
    ker = pr.pixel_terms_batched(
        add1(means), add1(lv), add1(z), add1(pch), add1(cl4), add1(off_b),
        add1(pix), add1(msk), add1(iot), add1(a0), add1(b0),
        ks=ks, pdims=P, interpret=True)
    for name, r, k in zip(("lik", "m15", "hcross", "htc", "hcc", "gc"),
                          ref, ker):
        r = np.asarray(r, np.float64)
        k = np.asarray(k, np.float64)[0]
        scale = max(np.max(np.abs(r)), 1.0)
        np.testing.assert_allclose(k, r, rtol=1e-9, atol=1e-9 * scale,
                                   err_msg=name)


def test_chain_coefficient_sparsity():
    """The kernel skips P = chain @ R entries that are structurally zero
    (star rows t>=2; the per-row b-patterns in _refresh_kernel). Assert
    the construction actually guarantees those zeros."""
    from celeste_jl_tpu.models import mixture_derivs as md

    a = _band_args(jnp.float64, n_sources=2, seed=5)[3]
    theta6, _, _, psf_b, jac_b, wc_b, pc_b = a[:7]
    sm = md.star_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    gm = md.galaxy_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    pattern = {0: (1, 2), 1: (1, 2), 2: (0,), 3: (0, 3, 4, 5),
               4: (0, 3, 4, 5), 5: (0, 3, 4, 5)}
    for mix, pats in ((sm, {0: (1, 2), 1: (1, 2)}), (gm, pattern)):
        chain = mix[3]
        covs = mix[1]
        det = covs[:, 0, 0] * covs[:, 1, 1] - covs[:, 0, 1] ** 2
        L00 = covs[:, 1, 1] / det
        L01 = -covs[:, 0, 1] / det
        L11 = covs[:, 0, 0] / det
        P = np.asarray(jnp.einsum("cat,cab->ctb", chain,
                                  md.eta_basis_rows(L00, L01, L11)))
        for t in range(6):
            live = pats.get(t, ())
            dead = [b for b in range(6) if b not in live]
            assert np.all(P[:, t, dead] == 0.0), (t, P[:, t, dead])


def test_fgh_refresh_kernel_parity_interpret():
    """Full evaluator: _analytic_lik_fgh with the fused (interpreted)
    kernel vs the XLA band path, f32, batch of sources."""
    from celeste_jl_tpu.ops.bijectors import (default_box_bounds, enforce,
                                              to_free)
    from celeste_jl_tpu.vi.optimize import (_analytic_lik_fgh,
                                            _make_bounds)
    from __graft_entry__ import _synthetic_batch

    vp0s, patches = _synthetic_batch(n_sources=3, tile=16, seed=1)
    vp0s = jnp.asarray(np.asarray(vp0s, np.float32))
    patches = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32))
        if np.asarray(x).dtype.kind == "f" else x, patches)

    def fgh(vp, p, kern):
        bounds = _make_bounds(vp[0:2])
        vp_c = enforce(vp, bounds)
        free = to_free(vp_c, bounds)
        return _analytic_lik_fgh(free, bounds, p, None, None,
                                 refresh_kernel=kern)

    want = jax.vmap(lambda v, p: fgh(v, p, "xla"))(vp0s, patches)
    os.environ["CELESTE_PALLAS_INTERPRET"] = "1"
    try:
        got = jax.vmap(lambda v, p: fgh(v, p, "pallas"))(vp0s, patches)
    finally:
        del os.environ["CELESTE_PALLAS_INTERPRET"]
    for name, a, b in zip(("lik", "g", "H"), got, want):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = np.maximum(np.abs(b), np.max(np.abs(b)) * 1e-3 + 1.0)
        assert np.max(np.abs(a - b) / scale) < 5e-4, name
