"""Batched 42x42 symmetric eigensolver: systolic Jacobi as a Pallas kernel.

The fit's trust-region refresh eigendecomposes (B, 42, 42) f32 Hessians.
XLA's TPU eigh custom call costs ~66 ms per (1024, 42, 42) batch — 49% of
the whole fit program's device time (profiled via tools/profile_bench.py +
xplane_summary; the 1356 ms jit_fit_sources while-loop spends 664 ms in 10
eigh calls). The XLA-level Jacobi reformulations lose too: the matmul
round (ops/jacobi.jacobi_eigh) pads 42-wide operands onto the 128-wide MXU
(~8 ms/sweep), and the vector round (vjacobi_eigh) round-trips HBM on
every one of the 41 rounds per sweep (measured 473 vs 553 fits/s end to
end). A sweep's 41 rounds are tiny VPU work on 7 KB/lane of state — the
textbook Pallas case: keep A and Q VMEM-resident for the whole sweep and
pay HBM once per sweep, not once per round.

Layout: lanes ride the MINOR axis — blocks are (42, 42, L) with the tiled
dims (42, L) -> (48, 128), so every pair operation (rows 2k/2k+1,
columns 2k/2k+1, the inter-round permutation) indexes FREE leading axes.
The round-robin tournament keeps pairs at fixed slots (2k, 2k+1) and
applies one static permutation per round (ops/jacobi._round_robin_perm).

f32 accuracy: rotations accumulate ~sqrt(rounds)*eps*||H|| in Q, so after
each sweep the wrapper re-orthogonalizes Q with one Newton-Schulz step
and RE-FORMS the working matrix from the original (M <- Q'H0Q) — both
batched HIGHEST-precision XLA matmuls in the natural (B, 42, 42) layout.
Measured worst |dw| ~1e-4 on wide-spectrum 8-decade Hessians (XLA's own
f32 TPU eigh: 4e-3 on the same batch — tools/microbench_vjacobi.py).

`eigh_tr` wraps the whole thing in jax.custom_batching.custom_vmap so the
per-lane trust-region code (ops/newton.py, called under fit_sources'
vmap) transparently batches into the kernel; the unbatched fallback and
non-TPU backends use jnp.linalg.eigh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from .jacobi import _round_robin_perm

HIGHEST = jax.lax.Precision.HIGHEST
D = 42
K = D // 2
# lanes per kernel block (the TPU minor tile). 128 is the minimum;
# CELESTE_EIGH_LANES widens the block to amortize per-grid-step overhead
# (VMEM: 4 x (42, 42, LANES) f32 buffers, so 256 ~= 7.2 MB).
import os as _os

LANES = int(_os.environ.get("CELESTE_EIGH_LANES", "128"))


def _static_takes(perm):
    """Indices for diagonal / super-diagonal-of-pairs extraction in the
    (D*D, L) flattened leading layout."""
    diag = np.arange(D) * D + np.arange(D)
    pq = (2 * np.arange(K)) * D + (2 * np.arange(K) + 1)
    return np.asarray(diag), np.asarray(pq), np.asarray(perm)


def _take_static(x, idx, axis=0):
    """Static-index gather as slice+concat (Pallas kernels cannot capture
    constant index arrays, and Mosaic handles static slices on free
    leading axes natively)."""
    parts = [jax.lax.slice_in_dim(x, int(i), int(i) + 1, axis=axis)
             for i in idx]
    return jnp.concatenate(parts, axis=axis)


def _perm_apply(x, axis=0):
    """Apply the circle-method inter-round permutation along axis 0 or 1
    of a (D, D, L) value in O(1) ops. In the pair view y = reshape(K, 2):
    even slots <- [y[0,0], y[0,1], y[1,0], ..., y[K-2,0]],
    odd  slots <- [y[1,1], ..., y[K-1,1], y[K-1,0]]
    (verified against _round_robin_perm at import below) — contiguous
    slices + concat + interleave only; Mosaic rejects both gathers and
    large-stride slices on the sublane axis, and the D-single-slice form
    dominated the kernel wall (~84 tiny ops per round x 41 rounds)."""
    if axis == 0:
        y = x.reshape(K, 2, *x.shape[1:])
        ev = jnp.concatenate([y[0], y[1:K - 1, 0]], axis=0)
        od = jnp.concatenate([y[1:K, 1], y[K - 1:K, 0]], axis=0)
        return jnp.stack([ev, od], axis=1).reshape(x.shape)
    assert axis == 1
    y = x.reshape(x.shape[0], K, 2, *x.shape[2:])
    ev = jnp.concatenate([y[:, 0], y[:, 1:K - 1, 0]], axis=1)
    od = jnp.concatenate([y[:, 1:K, 1], y[:, K - 1:K, 0]], axis=1)
    return jnp.stack([ev, od], axis=2).reshape(x.shape)


def _check_perm_decomposition():
    perm = _round_robin_perm(D)
    ev = [0, 1] + [2 * m for m in range(1, K - 1)]
    od = [2 * m + 1 for m in range(1, K)] + [2 * (K - 1)]
    inter = []
    for a, b in zip(ev, od):
        inter += [a, b]
    assert inter == list(perm), (inter, list(perm))


_check_perm_decomposition()


def _pair_masks(dtype):
    """(eye, pair-superdiagonal) masks built from in-kernel iota (Pallas
    cannot capture constant arrays)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    eye = (row == col).astype(dtype)[:, :, None]
    sup = ((col == row + 1) & (row % 2 == 0)).astype(dtype)[:, :, None]
    return eye, sup


def _rot_rows(y, c, s):
    """Rotate adjacent row pairs of a (K, 2, D, L) view: row0' = c*row0 -
    s*row1, row1' = s*row0 + c*row1 — a flip-swap + fma elementwise
    chain (lax.rev has no Mosaic lowering; the swap is slice+concat on a
    free leading axis)."""
    yf = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    cb = c[:, None, None, :]
    sb = jnp.stack([-s, s], axis=1)[:, :, None, :]
    return cb * y + sb * yf


def _rot_cols(y, c, s):
    """Rotate adjacent column pairs of a (D, K, 2, L) view."""
    yf = jnp.concatenate([y[:, :, 1:2], y[:, :, 0:1]], axis=2)
    cb = c[None, :, None, :]
    sb = jnp.stack([-s, s], axis=1)[None]
    return cb * y + sb * yf


def _perm_rows(y):
    """Circle-method inter-round permutation of the (K, 2, D, L) row-pair
    view (see _check_perm_decomposition): contiguous slices + interleave
    only — Mosaic rejects gathers and strided slices on these axes."""
    ev = jnp.concatenate([y[0], y[1:K - 1, 0]], axis=0)      # (K, D, L)
    od = jnp.concatenate([y[1:K, 1], y[K - 1:K, 0]], axis=0)
    return jnp.stack([ev, od], axis=1)


def _perm_cols(y):
    """Same permutation on the (D, K, 2, L) column-pair view."""
    ev = jnp.concatenate([y[:, 0], y[:, 1:K - 1, 0]], axis=1)
    od = jnp.concatenate([y[:, 1:K, 1], y[:, K - 1:K, 0]], axis=1)
    return jnp.stack([ev, od], axis=2)


def _check_perm_decomposition():
    perm = _round_robin_perm(D)
    ev = [0, 1] + [2 * m for m in range(1, K - 1)]
    od = [2 * m + 1 for m in range(1, K)] + [2 * (K - 1)]
    inter = []
    for a, b in zip(ev, od):
        inter += [a, b]
    assert inter == list(perm), (inter, list(perm))


_check_perm_decomposition()


def _sweep_a_kernel(a_ref, ao_ref, cs_ref, tmp_ref):
    """Phase 1: the A rounds of one systolic sweep on a (D, D, L) block,
    writing the per-round rotation params to cs_ref. The round is STAGED
    through refs (rotate-rows -> tmp, rotate-cols -> a, permute -> a) so
    only one (D, D, L) value plus one elementwise chain is live at a
    time — a value-carried fori_loop body overflowed the 16 MB VMEM
    scoped stack (17.5-21.3 MB at L=128)."""
    eye_m, sup_m = _pair_masks(a_ref.dtype)
    ao_ref[...] = a_ref[...]

    def rnd_a(r, _):
        A = ao_ref[...]
        L = A.shape[-1]
        d2 = jnp.sum(A * eye_m, axis=1).reshape(K, 2, L)
        app, aqq = d2[:, 0, :], d2[:, 1, :]        # (K, L)
        apq = jnp.sum(A * sup_m, axis=1).reshape(K, 2, L)[:, 0, :]
        live = jnp.abs(apq) > 1e-30
        tau = (aqq - app) / (2.0 * jnp.where(live, apq, 1.0))
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(live, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)            # (K, L)
        s = t * c
        cs_ref[pl.ds(r, 1)] = jnp.concatenate([c, s], axis=0)[None]

        tmp_ref[...] = _rot_rows(A.reshape(K, 2, D, L), c, s) \
            .reshape(D, D, L)
        ao_ref[...] = _rot_cols(tmp_ref[...].reshape(D, K, 2, L), c, s) \
            .reshape(D, D, L)
        tmp_ref[...] = _perm_rows(ao_ref[...].reshape(K, 2, D, L)) \
            .reshape(D, D, L)
        ao_ref[...] = _perm_cols(tmp_ref[...].reshape(D, K, 2, L)) \
            .reshape(D, D, L)
        return 0

    jax.lax.fori_loop(0, D - 1, rnd_a, 0)


def _sweep_q_kernel(q_ref, cs_ref, qo_ref, tmp_ref):
    """Phase 2: replay the recorded column rotations + permutations on Q."""
    qo_ref[...] = q_ref[...]

    def rnd_q(r, _):
        cs = cs_ref[pl.ds(r, 1)][0]                # (2K, L)
        c, s = cs[:K], cs[K:]
        Q = qo_ref[...]
        L = Q.shape[-1]
        tmp_ref[...] = _rot_cols(Q.reshape(D, K, 2, L), c, s) \
            .reshape(D, D, L)
        qo_ref[...] = _perm_cols(tmp_ref[...].reshape(D, K, 2, L)) \
            .reshape(D, D, L)
        return 0

    jax.lax.fori_loop(0, D - 1, rnd_q, 0)


def _sweep_aq_kernel(a_ref, q_ref, ao_ref, qo_ref, tmp_ref):
    """Fused sweep: the A rounds and the Q rotation replay in ONE kernel —
    same math and order as _sweep_a_kernel + _sweep_q_kernel, but the
    per-round rotation params stay in registers instead of a
    (D-1, 2K, L) HBM log, and each sweep pays one kernel launch instead
    of two. Staged through refs like _sweep_a_kernel (a value-carried
    loop body overflows the scoped VMEM stack)."""
    eye_m, sup_m = _pair_masks(a_ref.dtype)
    ao_ref[...] = a_ref[...]
    qo_ref[...] = q_ref[...]

    def rnd(r, _):
        A = ao_ref[...]
        L = A.shape[-1]
        d2 = jnp.sum(A * eye_m, axis=1).reshape(K, 2, L)
        app, aqq = d2[:, 0, :], d2[:, 1, :]        # (K, L)
        apq = jnp.sum(A * sup_m, axis=1).reshape(K, 2, L)[:, 0, :]
        live = jnp.abs(apq) > 1e-30
        tau = (aqq - app) / (2.0 * jnp.where(live, apq, 1.0))
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(live, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)            # (K, L)
        s = t * c

        tmp_ref[...] = _rot_rows(A.reshape(K, 2, D, L), c, s) \
            .reshape(D, D, L)
        ao_ref[...] = _rot_cols(tmp_ref[...].reshape(D, K, 2, L), c, s) \
            .reshape(D, D, L)
        tmp_ref[...] = _perm_rows(ao_ref[...].reshape(K, 2, D, L)) \
            .reshape(D, D, L)
        ao_ref[...] = _perm_cols(tmp_ref[...].reshape(D, K, 2, L)) \
            .reshape(D, D, L)

        Q = qo_ref[...]
        tmp_ref[...] = _rot_cols(Q.reshape(D, K, 2, L), c, s) \
            .reshape(D, D, L)
        qo_ref[...] = _perm_cols(tmp_ref[...].reshape(D, K, 2, L)) \
            .reshape(D, D, L)
        return 0

    jax.lax.fori_loop(0, D - 1, rnd, 0)


@partial(jax.jit, static_argnames=("interpret",))
def _one_sweep(Am, Qm, interpret=False):
    """(B, D, D) f32 -> one systolic sweep via the Pallas kernels."""
    from jax.experimental.pallas import tpu as pltpu

    B = Am.shape[0]
    pad = (-B) % LANES
    if pad:
        Am = jnp.concatenate(
            [Am, jnp.broadcast_to(jnp.eye(D, dtype=Am.dtype),
                                  (pad, D, D))], 0)
        Qm = jnp.concatenate(
            [Qm, jnp.broadcast_to(jnp.eye(D, dtype=Qm.dtype),
                                  (pad, D, D))], 0)
    Bp = Am.shape[0]
    At = jnp.transpose(Am, (1, 2, 0))  # (D, D, Bp)
    Qt = jnp.transpose(Qm, (1, 2, 0))
    grid = (Bp // LANES,)
    spec = pl.BlockSpec((D, D, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    import os
    if os.environ.get("CELESTE_EIGH_FUSED", "1") != "0":
        Ao, Qo = pl.pallas_call(
            _sweep_aq_kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((D, D, Bp), Am.dtype),
                       jax.ShapeDtypeStruct((D, D, Bp), Qm.dtype)],
            input_output_aliases={0: 0, 1: 1},
            scratch_shapes=[pltpu.VMEM((D, D, LANES), Am.dtype)],
            interpret=interpret,
        )(At, Qt)
    else:
        cs_spec = pl.BlockSpec((D - 1, 2 * K, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        Ao, cs = pl.pallas_call(
            _sweep_a_kernel,
            grid=grid,
            in_specs=[spec],
            out_specs=[spec, cs_spec],
            out_shape=[jax.ShapeDtypeStruct((D, D, Bp), Am.dtype),
                       jax.ShapeDtypeStruct((D - 1, 2 * K, Bp), Am.dtype)],
            input_output_aliases={0: 0},
            scratch_shapes=[pltpu.VMEM((D, D, LANES), Am.dtype)],
            interpret=interpret,
        )(At)
        Qo = pl.pallas_call(
            _sweep_q_kernel,
            grid=grid,
            in_specs=[spec, cs_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((D, D, Bp), Qm.dtype),
            input_output_aliases={0: 0},
            scratch_shapes=[pltpu.VMEM((D, D, LANES), Qm.dtype)],
            interpret=interpret,
        )(Qt, cs)
    Ao = jnp.transpose(Ao, (2, 0, 1))[:B]
    Qo = jnp.transpose(Qo, (2, 0, 1))[:B]
    return Ao, Qo


def _offdiag_norm(M):
    off = M * (1.0 - jnp.eye(M.shape[-1], dtype=M.dtype))
    return jnp.sqrt(jnp.sum(off * off, axis=(-1, -2)))


@partial(jax.jit, static_argnames=("tol", "max_sweeps", "interpret"))
def pallas_jacobi_eigh(H, Q0=None, tol=1e-6, max_sweeps=10, interpret=False):
    """Batched (B, D, D) symmetric eigendecomposition, D=42 fixed.

    Per sweep: the Pallas kernel (41 VMEM-resident rounds), then one
    Newton-Schulz re-orthogonalization of Q and re-formation M <- Q'H0Q
    (batched HIGHEST matmuls) to reset f32 rotation-noise accumulation.
    Returns (w unsorted, Q, sweeps). Warm-startable via Q0.
    interpret=True runs the kernels in the Pallas interpreter (the CPU
    regression-test path, tests/test_pallas_eigh.py)."""
    assert H.shape[-1] == D, H.shape
    dtype = H.dtype
    eye = jnp.eye(D, dtype=dtype)
    if Q0 is None:
        M = H
        Q = jnp.broadcast_to(eye, H.shape)
    else:
        M = jnp.einsum("...ji,...jk,...kl->...il", Q0, H, Q0,
                       precision=HIGHEST)
        Q = Q0
    ref = jnp.sqrt(jnp.sum(H * H, axis=(-1, -2)))

    def body(carry):
        M, Q, i = carry
        M, Q = _one_sweep(M, Q, interpret=interpret)
        QtQ = jnp.einsum("...ji,...jk->...ik", Q, Q, precision=HIGHEST)
        Q = jnp.einsum("...ij,...jk->...ik", Q, 1.5 * eye - 0.5 * QtQ,
                       precision=HIGHEST)
        M = jnp.einsum("...ji,...jk,...kl->...il", Q, H, Q,
                       precision=HIGHEST)
        return M, Q, i + 1

    def cond(carry):
        M, Q, i = carry
        return (i < max_sweeps) & jnp.any(_offdiag_norm(M) > tol * ref)

    M, Q, sweeps = jax.lax.while_loop(cond, body, (M, Q, jnp.asarray(0)))
    return jnp.diagonal(M, axis1=-2, axis2=-1), Q, sweeps


def _eigh_tr_batched(Hp, Qp, tol, max_sweeps, interpret=False):
    w, Q, _ = pallas_jacobi_eigh(Hp, Qp, tol=tol, max_sweeps=max_sweeps,
                                 interpret=interpret)
    return w, Q


def make_eigh_tr(tol=1e-6, max_sweeps=10):
    """custom_vmap'd (H (42,42), Qwarm (42,42)) -> (w, Q): per-lane calls
    fall back to jnp.linalg.eigh; under vmap (the batched fit) the whole
    batch routes through the Pallas Jacobi path."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def eigh_tr(Hp, Qp):
        w, Q = jnp.linalg.eigh(Hp)
        return w, Q

    @eigh_tr.def_vmap
    def _rule(axis_size, in_batched, Hp, Qp):
        hb, qb = in_batched
        if not hb:
            Hp = jnp.broadcast_to(Hp, (axis_size,) + Hp.shape)
        if not qb:
            Qp = jnp.broadcast_to(Qp, (axis_size,) + Qp.shape)
        # Nested vmaps re-enter this rule with extra leading batch dims;
        # flatten to one batch axis and restore on the way out (ADVICE r4).
        lead = Hp.shape[:-2]
        if Hp.ndim > 3:
            Hp = Hp.reshape((-1,) + Hp.shape[-2:])
            Qp = Qp.reshape((-1,) + Qp.shape[-2:])
        # the Pallas path is the f32 TPU fast path; anything else
        # (CPU parity runs, f64) batches through XLA's eigh.
        # CELESTE_PALLAS_INTERPRET=1 (read at trace time) routes f32
        # batches through the INTERPRETED kernel on any backend — the
        # in-suite CPU regression path for the production TPU solver.
        import os
        force_interp = (os.environ.get("CELESTE_PALLAS_INTERPRET") == "1"
                        and Hp.dtype == jnp.float32)
        if force_interp:
            w, Q = _eigh_tr_batched(Hp, Qp, tol, max_sweeps, interpret=True)
        elif Hp.dtype != jnp.float32 or jax.default_backend() != "tpu":
            w, Q = jnp.linalg.eigh(Hp)
        else:
            w, Q = _eigh_tr_batched(Hp, Qp, tol, max_sweeps)
        w = w.reshape(lead + w.shape[-1:])
        Q = Q.reshape(lead + Q.shape[-2:])
        return (w, Q), (True, True)

    return eigh_tr
