"""Fused render -> moment-contraction refresh kernel.

The analytic-Hessian refresh (vi/optimize._band_lik_terms) is the fit's
DMA-bound stage: under XLA it materializes the per-component Gaussian
fields, the flattened (S, B, P*P) pixel fields, and the (S, B, C) component
scalars in HBM between fusions — the device profile
(benchmark/profile_results.md) measured the resulting `copy-start` DMA
family at ~700 ms line-total per warm 1024-lane launch (MFU 0.37%): the
chip streams intermediates far more than it contracts them. The useful
arithmetic per refresh is tiny (~7 GFLOP at S=1024).

This kernel runs the whole per-(source, band) pixel pass VMEM-resident:
render the C = 15*K mixture components (K star + 14*K galaxy, packed
star-first), form the Poisson-bound derivative weight fields, and emit only
the pixel-CONTRACTED outputs — per-component degree-<=4 weighted moments
(C, 15), the cross-mixture gradient outer-product blocks, the H_tC columns,
and a handful of scalars (~70 + 15*C floats per source-band instead of
~14 x 20 MB of intermediate buffers per refresh). The tiny per-component
assembly (moments -> Hessian, models/mixture_derivs.hess_from_moments)
stays in XLA, shared verbatim with the host path so the two are
term-for-term identical.

Reference semantics: elbo_objective.jl:274-392 (the Poisson lower bound and
its derivative blocks) and BivariateNormals.jl:208-404 (the hand-derived
component derivatives), as reorganized by models/mixture_derivs.py.

Layout: one (source, band) row per grid step; the pixel axis rides the
native (8, N/8) f32 tile so every elementwise op fills the VPU, and the
component axis is vectorized on top as (C, 8, N/8) — no loops, no dynamic
slicing in the kernel. Per-pixel scalar reductions are batched into one
(NRED, 8, N/8) stack summed once. Per-row per-component scalars (means,
precisions, chain-composed basis coefficients) arrive as small VMEM blocks
and broadcast along the pixel tile.

`make_pixel_terms` wraps the kernel with the repo's two-level custom_vmap
pattern (ops/pallas_tr.py): the per-row call inside the band vmap falls
back to a pure-jnp reference implementation (`_pixel_terms_row`, also the
f64 parity oracle); under the fit's nested (bands, sources) vmaps the
whole flattened batch routes through one kernel launch on TPU/f32.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

# Flat order of the 72 per-row scalar reductions emitted by the kernel:
#   [0]      lik_core  (masked Poisson bound sans the x*log(iota) and
#            lgamma(x+1) constants — those are parameter-independent and
#            are added back by the caller)
#   [1:37]   Hcross (6, 6) row-major: the cross-mixture gradient
#            outer-product Hessian block sum_px [J0 J1] F [J0 J1]'
#   [37:61]  H_tC (6, 4) row-major
#   [61:68]  H_CC upper entries [h11*fs0^2, h11*fs0*fs1, h11*fs1^2,
#            h12*fs0*fs0^2, h12*fs0*fs1^2, h12*fs1*fs0^2, h12*fs1*fs1^2]
#   [68:72]  g_C [g1*fs0, g1*fs1, g2*fs0^2, g2*fs1^2]
NRED = 72


def _poisson_weight_fields(cl4, msk, x, iot, a0, b0, fs0, fs1):
    """Per-pixel Poisson-bound value and derivative weight fields
    (elbo_objective.jl:274-392 reorganized; identical expressions to
    vi/optimize._band_lik_terms). Shapes follow the inputs."""
    cl0, cl1, cll0, cll1 = cl4[0], cl4[1], cl4[2], cl4[3]
    s1 = cl0 * fs0 + cl1 * fs1
    s2 = cll0 * fs0 * fs0 + cll1 * fs1 * fs1
    E = jnp.where(msk > 0, a0 + s1, 1.0)
    V = jnp.where(msk > 0, b0 + s2 - s1 * s1, 0.0)

    rE = 1.0 / E
    rE2 = rE * rE
    rE3 = rE2 * rE
    phi_E = x * rE + x * V * rE3 - iot
    phi_V = -0.5 * x * rE2
    phi_EE = -x * rE2 - 3.0 * x * V * rE2 * rE2
    phi_EV = x * rE3

    g1 = msk * (phi_E - 2.0 * s1 * phi_V)
    g2 = msk * phi_V
    h11 = msk * (phi_EE - 4.0 * s1 * phi_EV) - 2.0 * g2
    h12 = msk * phi_EV

    u0 = 2.0 * cll0 * fs0
    u1 = 2.0 * cll1 * fs1
    W0 = g1 * cl0 + g2 * u0
    W1 = g1 * cl1 + g2 * u1
    lik_core = msk * (x * (jnp.log(E) - 0.5 * V * rE2) - iot * E)
    return lik_core, g1, g2, h11, h12, u0, u1, W0, W1


def _cross_fields(cl4, g1, g2, h11, h12, u0, u1, fs0, fs1):
    """The f (Hcross) and A (H_tC) weight fields of _band_lik_terms."""
    cl0, cl1, cll0, cll1 = cl4[0], cl4[1], cl4[2], cl4[3]
    f00 = h11 * cl0 * cl0 + 2.0 * h12 * cl0 * u0 + 2.0 * g2 * cll0
    f01 = h11 * cl0 * cl1 + h12 * (cl0 * u1 + u0 * cl1)
    f11 = h11 * cl1 * cl1 + 2.0 * h12 * cl1 * u1 + 2.0 * g2 * cll1
    t0, t1 = h11 * fs0, h11 * fs1
    r0, r1 = h12 * fs0, h12 * fs1
    q0, q1 = r0 * fs0, r1 * fs1          # h12 * fs_j^2
    # A0/A1 per H_tC column j in (cl0, cl1, cll0, cll1) order
    A0 = (t0 * cl0 + r0 * u0 + g1, t1 * cl0 + r1 * u0,
          q0 * cl0 + 2.0 * g2 * fs0, q1 * cl0)
    A1 = (t0 * cl1 + r0 * u1, t1 * cl1 + r1 * u1 + g1,
          q0 * cl1, q1 * cl1 + 2.0 * g2 * fs1)
    return f00, f01, f11, A0, A1


def _moment_polys(l1, l2):
    """The 15 degree-<=4 monomial fields in flat moment order, built from
    shared squares (one, l1, l2, l1^2, ...)."""
    one = jnp.ones_like(l1)
    p20, p11, p02 = l1 * l1, l1 * l2, l2 * l2
    return [one, l1, l2, p20, p11, p02,
            p20 * l1, p20 * l2, l1 * p02, p02 * l2,
            p20 * p20, p20 * p11, p20 * p02, p11 * p02, p02 * p02]


def _pixel_terms_row(mu, lv, z, pch, cl4, off, pixels, mask, iota, a0, b0,
                     *, ks, pdims):
    """Pure-jnp reference for one (source, band) row — the unbatched
    custom_vmap fallback and the f64 parity oracle for the kernel
    (tests/test_pallas_refresh.py). Mirrors vi/optimize._band_lik_terms
    restructured around the kernel's output contract.

    mu (C,2), lv (C,3)=[L00,L01,L11], z (C,), pch (C,6,6), cl4 (4,),
    off (2,), pixel fields (N,). ks: star components (packed first);
    pdims: static (rows, cols) of the tile.

    Returns (lik_core (), m15 (C,15), hcross (6,6), htc (6,4), hcc (7,),
    gc (4,)).
    """
    dtype = pixels.dtype
    rows, cols = pdims
    n = np.arange(rows * cols)
    x1 = off[0] + jnp.asarray(1.0 + (n // cols), dtype)
    x2 = off[1] + jnp.asarray(1.0 + (n % cols), dtype)
    msk = mask.astype(dtype)
    x = jnp.where(msk > 0, pixels, 0.0)
    iot = jnp.where(msk > 0, iota, 1.0)

    L00, L01, L11 = lv[:, 0], lv[:, 1], lv[:, 2]
    d1 = x1[None, :] - mu[:, 0, None]
    d2 = x2[None, :] - mu[:, 1, None]
    l1 = L00[:, None] * d1 + L01[:, None] * d2
    l2 = L01[:, None] * d1 + L11[:, None] * d2
    g = z[:, None] * jnp.exp(-0.5 * (d1 * l1 + d2 * l2))     # (C, N)
    fs0 = jnp.sum(g[:ks], axis=0)
    fs1 = jnp.sum(g[ks:], axis=0)

    lik_px, g1, g2, h11, h12, u0, u1, W0, W1 = _poisson_weight_fields(
        cl4, msk, x, iot, a0, b0, fs0, fs1)
    lik_core = jnp.sum(lik_px)

    polys = _moment_polys(l1, l2)
    gb = jnp.stack([g * p for p in polys[:6]], axis=1)       # (C, 6b, N)
    J0 = jnp.einsum("ctb,cbn->tn", pch[:ks], gb[:ks])        # (6, N)
    J1 = jnp.einsum("ctb,cbn->tn", pch[ks:], gb[ks:])

    W = jnp.concatenate([jnp.broadcast_to(W0, (ks,) + W0.shape),
                         jnp.broadcast_to(W1, (g.shape[0] - ks,)
                                          + W1.shape)], axis=0)
    wg = W * g
    m15 = jnp.stack([jnp.sum(wg * p, axis=-1) for p in polys], axis=-1)

    f00, f01, f11, A0, A1 = _cross_fields(cl4, g1, g2, h11, h12, u0, u1,
                                          fs0, fs1)
    U0 = f00 * J0 + f01 * J1
    U1 = f01 * J0 + f11 * J1
    hcross = J0 @ U0.T + J1 @ U1.T                           # (6, 6)
    htc = jnp.stack([J0 @ a0_ + J1 @ a1_
                     for a0_, a1_ in zip(A0, A1)], axis=-1)  # (6, 4)
    hcc = jnp.stack([jnp.sum(h11 * fs0 * fs0), jnp.sum(h11 * fs0 * fs1),
                     jnp.sum(h11 * fs1 * fs1),
                     jnp.sum(h12 * fs0 * fs0 ** 2),
                     jnp.sum(h12 * fs0 * fs1 ** 2),
                     jnp.sum(h12 * fs1 * fs0 ** 2),
                     jnp.sum(h12 * fs1 * fs1 ** 2)])
    gc = jnp.stack([jnp.sum(g1 * fs0), jnp.sum(g1 * fs1),
                    jnp.sum(g2 * fs0 ** 2), jnp.sum(g2 * fs1 ** 2)])
    return lik_core, m15, hcross, htc, hcc, gc


def _refresh_kernel(scal_ref, cl_ref, off_ref,
                    pix_ref, msk_ref, iot_ref, a0_ref, b0_ref,
                    m15_ref, red_ref, *, ks, pdims):
    """One (source, band) row, fully VMEM-resident. Pixel tile rides the
    native (8, N/8) layout; components are vectorized as (C, 8, N/8).

    Layout rules this kernel obeys (the alternatives either crash Mosaic
    or pay 128x lane padding): per-component scalars arrive as ONE flat
    (42, C) block — C on lanes, the natural XLA layout, no relayout copy
    on the host side — and are moved into sublane-broadcast position by
    a single in-kernel transpose + (C, 1) column slices; no array ever
    carries a trailing singleton pair (VMEM tiles a minor dim of 1 out
    to 128), and no rank-1 (C,) value is ever formed (lane vectors can't
    be relaid out to broadcast over tiled dims). Reductions are staged
    single-axis. Per-row scalars (brightness coefficients, tile offset)
    live in SMEM.
    """
    dtype = pix_ref.dtype
    rows, cols = pdims
    sub, lane = pix_ref.shape[1], pix_ref.shape[2]

    # pixel coordinates of the flattened row-major tile: n = 8-reshaped
    ii = jax.lax.broadcasted_iota(jnp.int32, (sub, lane), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (sub, lane), 1)
    n = ii * lane + jj
    x1 = off_ref[0, 0, 0] + (1 + n // cols).astype(dtype)
    x2 = off_ref[0, 0, 1] + (1 + n % cols).astype(dtype)

    msk = msk_ref[0]
    x = jnp.where(msk > 0, pix_ref[0], 0.0)
    iot = jnp.where(msk > 0, iot_ref[0], 1.0)
    a0 = a0_ref[0]
    b0 = b0_ref[0]

    st = jnp.transpose(scal_ref[0])                 # (C, 42)
    col = lambda k: st[:, k:k + 1][..., None]       # (C, 1, 1)
    mu1, mu2 = col(0), col(1)
    L00, L01, L11 = col(2), col(3), col(4)
    z = col(5)

    d1 = x1[None] - mu1                             # (C, 8, N/8)
    d2 = x2[None] - mu2
    l1 = L00 * d1 + L01 * d2
    l2 = L01 * d1 + L11 * d2
    g = z * jnp.exp(-0.5 * (d1 * l1 + d2 * l2))
    fs0 = jnp.sum(g[:ks], axis=0)                   # (8, N/8)
    fs1 = jnp.sum(g[ks:], axis=0)

    cl4 = (cl_ref[0, 0, 0], cl_ref[0, 0, 1], cl_ref[0, 0, 2],
           cl_ref[0, 0, 3])
    lik_px, g1, g2, h11, h12, u0, u1, W0, W1 = _poisson_weight_fields(
        cl4, msk, x, iot, a0, b0, fs0, fs1)

    polys = _moment_polys(l1, l2)

    # J0/J1: 6 theta-rows each, sum_c P[c,t,b] * g * b_b over own mixture,
    # with the g*b_b products hoisted across t and the STRUCTURAL zeros of
    # P skipped. P = chain @ R has a fixed sparsity pattern from the
    # mixture construction (models/mixture_derivs.star_mixture /
    # galaxy_mixture; asserted in tests/test_pallas_refresh.py):
    #   star components: only the position rows t=0,1 are nonzero, and
    #     only through b in {l1, l2} (chain touches just the mu etas);
    #   galaxy components: t=0,1 -> b in {1,2}; t=2 (frac_dev) -> b=0
    #     (log-weight eta only); t=3..5 (shape) -> b in {0,3,4,5}
    #     (the s etas). 17 live entries instead of 36.
    gb = [g] + [g * polys[b] for b in range(1, 6)]
    _J_PATTERN = {0: (1, 2), 1: (1, 2), 2: (0,), 3: (0, 3, 4, 5),
                  4: (0, 3, 4, 5), 5: (0, 3, 4, 5)}

    def jrow(sl, t, bs):
        acc = None
        for b in bs:
            term = col(6 + t * 6 + b)[sl] * gb[b][sl]
            acc = term if acc is None else acc + term
        return jnp.sum(acc, axis=0)

    star = slice(0, ks)
    gal = slice(ks, None)
    # star rows t=2..5 are structurally zero: carried as None and skipped
    # in every downstream product instead of multiplying a zero field
    J0 = [jrow(star, t, (1, 2)) if t < 2 else None for t in range(6)]
    J1 = [jrow(gal, t, _J_PATTERN[t]) for t in range(6)]

    # moments: W-weighted per-component reductions -> (1, C) rows of the
    # (15, C) output block
    W = jnp.concatenate([jnp.broadcast_to(W0, (ks,) + W0.shape),
                         jnp.broadcast_to(W1, (g.shape[0] - ks,)
                                          + W1.shape)], axis=0)
    wg = W * g
    mrows = [jnp.transpose(jnp.sum(jnp.sum(wg * polys[k], axis=1), axis=1,
                                   keepdims=True))          # (1, C)
             for k in range(15)]
    m15_ref[0] = jnp.concatenate(mrows, axis=0)             # (15, C)

    f00, f01, f11, A0, A1 = _cross_fields(cl4, g1, g2, h11, h12, u0, u1,
                                          fs0, fs1)

    def madd(a, x, acc=None):
        """acc + a*x with None (in either factor) propagating structural
        zeros."""
        if a is None or x is None:
            return acc
        term = a * x
        return term if acc is None else acc + term

    U0 = [madd(f01, J1[t], madd(f00, J0[t])) for t in range(6)]
    U1 = [madd(f11, J1[t], madd(f01, J0[t])) for t in range(6)]

    def pair(i0, i1, u0j, u1j):
        # i1/u1j are never None (galaxy rows are all live), so the result
        # is always a real field
        return madd(i1, u1j, madd(i0, u0j))

    fields = [lik_px]
    for i in range(6):
        for j in range(6):
            fields.append(pair(J0[i], J1[i], U0[j], U1[j]))      # Hcross
    for i in range(6):
        for j in range(4):
            fields.append(pair(J0[i], J1[i], A0[j], A1[j]))      # H_tC
    fields += [h11 * fs0 * fs0, h11 * fs0 * fs1, h11 * fs1 * fs1,
               h12 * fs0 * fs0 * fs0, h12 * fs0 * fs1 * fs1,
               h12 * fs1 * fs0 * fs0, h12 * fs1 * fs1 * fs1]
    fields += [g1 * fs0, g1 * fs1, g2 * fs0 * fs0, g2 * fs1 * fs1]
    red_ref[0] = jnp.transpose(
        jnp.sum(jnp.sum(jnp.stack(fields, axis=0), axis=1), axis=1,
                keepdims=True))                             # (1, NRED)


def pixel_terms_batched(mu, lv, z, pch, cl4, off, pixels, mask, iota,
                        a0, b0, *, ks, pdims, interpret=False):
    """Batched rows through the kernel: every operand has one leading G
    axis; pixel fields are (G, N). Returns the same structure as
    _pixel_terms_row with a leading G axis."""
    from jax.experimental.pallas import tpu as pltpu

    G, C = z.shape
    N = pixels.shape[1]
    sub = 8
    lane = N // sub
    assert sub * lane == N, (N,)
    dtype = pixels.dtype

    pix = pixels.reshape(G, sub, lane)
    msk = mask.astype(dtype).reshape(G, sub, lane)
    iot = iota.reshape(G, sub, lane)
    a0r = a0.reshape(G, sub, lane)
    b0r = b0.reshape(G, sub, lane)
    # per-component scalars as ONE flat (42, C) block per row, C on lanes
    # (the natural XLA layout — no relayout copies on either side of the
    # kernel; the kernel transposes in VMEM, see _refresh_kernel)
    scal = jnp.concatenate([
        jnp.stack([mu[..., 0], mu[..., 1], lv[..., 0], lv[..., 1],
                   lv[..., 2], z], axis=1),                  # (G, 6, C)
        jnp.swapaxes(pch.reshape(G, C, 36), 1, 2),           # (G, 36, C)
    ], axis=1)                                               # (G, 42, C)

    def rowspec(*shape, mem=None):
        return pl.BlockSpec((1,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=mem or pltpu.VMEM)
    grid = (G,)
    m15, red = pl.pallas_call(
        partial(_refresh_kernel, ks=ks, pdims=pdims),
        grid=grid,
        in_specs=[rowspec(42, C),
                  rowspec(1, 4, mem=pltpu.SMEM),
                  rowspec(1, 2, mem=pltpu.SMEM),
                  rowspec(sub, lane), rowspec(sub, lane), rowspec(sub, lane),
                  rowspec(sub, lane), rowspec(sub, lane)],
        out_specs=[rowspec(15, C), rowspec(1, NRED)],
        out_shape=[jax.ShapeDtypeStruct((G, 15, C), dtype),
                   jax.ShapeDtypeStruct((G, 1, NRED), dtype)],
        interpret=interpret,
    )(scal, cl4.reshape(G, 1, 4), off.reshape(G, 1, 2),
      pix, msk, iot, a0r, b0r)

    red = red.reshape(G, NRED)
    lik_core = red[:, 0]
    hcross = red[:, 1:37].reshape(G, 6, 6)
    htc = red[:, 37:61].reshape(G, 6, 4)
    hcc = red[:, 61:68]
    gc = red[:, 68:72]
    m15 = jnp.swapaxes(m15, 1, 2)                    # (G, C, 15)
    return lik_core, m15, hcross, htc, hcc, gc


def make_pixel_terms(ks, pdims):
    """Two-level custom_vmap wrapper (the ops/pallas_tr.py pattern, but
    closed under ARBITRARY vmap nesting): the unbatched per-row call runs
    the jnp reference; one vmap routes the batch into `_b1`, whose OWN
    custom_vmap rule flattens any further batch axes back to one — so the
    fit's nested (bands, sources) vmaps reach a single kernel launch
    instead of auto-batching the pallas_call per lane.

    Dispatch inside `_b1`: the compiled kernel on TPU/f32;
    CELESTE_PALLAS_INTERPRET=1 (read at trace time) forces the interpreted
    kernel on any backend (the CPU regression path); everything else runs
    the vmapped jnp reference (identical math, so CPU/f64 parity runs are
    unchanged)."""
    import os

    from jax.custom_batching import custom_vmap

    NARGS = 11
    row_ndim = (2, 2, 1, 3, 1, 1, 1, 1, 1, 1, 1)   # per-arg rank, unbatched

    # The kernel holds its comp-major (C, 8, N/8) working set in VMEM:
    # ~1.4 KB per pixel at C=30, so N = P*P beyond 64x64 overflows the
    # 16 MB scoped budget (measured: P=128 allocates 22.7 MB). Larger
    # tiles fall back to the XLA band path.
    MAX_PIXELS = 64 * 64
    # Narrow batches also fall back: the kernel wins on wide launches
    # (969.8 vs 915.4 fits/s at G = 5120 rows) but LOSES on the fused
    # field schedule's narrow class steps (hot-cache field A/B: 56.7 vs
    # 41.0 s busy at W~32 lanes -> G~160), where per-launch pipeline
    # overhead and the (42, C)-block prologue don't amortize. 512 rows
    # ~= 102 source lanes is comfortably inside the measured win regime.
    MIN_ROWS = int(os.environ.get("CELESTE_REFRESH_KERNEL_MIN_ROWS", "512"))

    def _dispatch(*args):
        mu = args[0]
        small = pdims[0] * pdims[1] <= MAX_PIXELS
        wide = mu.shape[0] >= MIN_ROWS
        force_interp = (os.environ.get("CELESTE_PALLAS_INTERPRET") == "1"
                        and mu.dtype == jnp.float32)
        if force_interp and small:
            return pixel_terms_batched(*args, ks=ks, pdims=pdims,
                                       interpret=True)
        if mu.dtype == jnp.float32 and small and wide \
                and jax.default_backend() == "tpu":
            return pixel_terms_batched(*args, ks=ks, pdims=pdims)
        return jax.vmap(
            lambda *a: _pixel_terms_row(*a, ks=ks, pdims=pdims))(*args)

    @custom_vmap
    def _b1(*args):
        return _dispatch(*args)

    @_b1.def_vmap
    def _b1_rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched))
        lead = args[0].shape[:args[0].ndim - row_ndim[0]]
        flat = tuple(a.reshape((-1,) + a.shape[a.ndim - nd:])
                     for a, nd in zip(args, row_ndim))
        out = _b1(*flat)
        out = tuple(o.reshape(lead + o.shape[1:]) for o in out)
        return out, (True,) * 6

    @custom_vmap
    def row(*args):
        assert len(args) == NARGS
        return _pixel_terms_row(*args, ks=ks, pdims=pdims)

    @row.def_vmap
    def _row_rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched))
        return _b1(*args), (True,) * 6

    return row


def band_lik_terms_fused(theta6, clb, cllb, psf_b, jac_b, wc_b, pc_b, off_b,
                         pixels_b, mask_b, sky_b, iota_b, bg_E_b, bg_var_b,
                         P):
    """Drop-in replacement for vi/optimize._band_lik_terms routing the
    pixel pass through the fused kernel. Same signature, same return
    contract: (lik, g_theta (6,), g_C (4,), H_tt (6,6), H_tC (6,4),
    H_CC (4,4)). f64-exact vs the host path up to summation order
    (tests/test_pallas_refresh.py)."""
    from jax.scipy.special import gammaln

    from ..models import mixture_derivs as md

    dtype = pixels_b.dtype
    sm = md.star_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    gm = md.galaxy_mixture(theta6, psf_b, jac_b, wc_b, pc_b)
    ks = sm[0].shape[0]

    means = jnp.concatenate([sm[0], gm[0]], axis=0)          # (C, 2)
    covs = jnp.concatenate([sm[1], gm[1]], axis=0)
    weights = jnp.concatenate([sm[2], gm[2]], axis=0)
    chain = jnp.concatenate([sm[3], gm[3]], axis=0)
    chain2 = jnp.concatenate([sm[4], gm[4]], axis=0)

    c00, c01, c11 = covs[:, 0, 0], covs[:, 0, 1], covs[:, 1, 1]
    det = c00 * c11 - c01 * c01
    inv_det = 1.0 / det
    L00, L01, L11 = c11 * inv_det, -c01 * inv_det, c00 * inv_det
    z = weights / (md.TWO_PI * jnp.sqrt(det))
    lv = jnp.stack([L00, L01, L11], axis=-1)
    pch = jnp.einsum("cat,cab->ctb", chain,
                     md.eta_basis_rows(L00, L01, L11))       # (C, 6, 6)

    cl4 = jnp.stack([clb[0], clb[1], cllb[0], cllb[1]])
    pix = pixels_b.reshape(-1)
    msk = mask_b.reshape(-1).astype(dtype)
    iot = iota_b.reshape(-1)
    a0 = sky_b.reshape(-1) + bg_E_b.reshape(-1)
    b0 = bg_var_b.reshape(-1)

    terms = make_pixel_terms(ks, tuple(P))
    lik_core, m15, hcross, htc, hcc, gc = terms(
        means, lv, z, pch, cl4, off_b, pix, msk, iot, a0, b0)

    # parameter-independent part of the bound, excluded from the kernel
    xm = jnp.where(msk > 0, pix, 0.0)
    iot_m = jnp.where(msk > 0, iot, 1.0)
    const = jnp.sum(msk * (xm * jnp.log(iot_m) - gammaln(xm + 1.0)))
    lik = lik_core + const

    M = md.moment_matrix(m15)                                # (C, 6, 6)
    Hc0 = md.hess_from_moments(M[:ks], L00[:ks], L01[:ks], L11[:ks],
                               pch[:ks], chain[:ks], chain2[:ks])
    Hc1 = md.hess_from_moments(M[ks:], L00[ks:], L01[ks:], L11[ks:],
                               pch[ks:], chain[ks:], chain2[ks:])
    H_tt = Hc0 + Hc1 + hcross
    g_theta = jnp.einsum("ctb,cb->t", pch, m15[:, :6])
    hcl = jnp.stack([jnp.stack([hcc[0], hcc[1]]),
                     jnp.stack([hcc[1], hcc[2]])])
    hx = jnp.stack([jnp.stack([hcc[3], hcc[4]]),
                    jnp.stack([hcc[5], hcc[6]])])
    H_CC = jnp.block([[hcl, hx], [hx.T, jnp.zeros((2, 2), dtype)]])
    return lik, g_theta, gc, H_tt, htc, H_CC
