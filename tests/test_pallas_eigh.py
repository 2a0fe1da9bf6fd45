"""In-suite regression coverage for the production TPU trust-region
eigensolver (ops/pallas_eigh.py, tr_solver="pjacobi" — the solver
parallel/run._platform_newton_config auto-selects on TPU). Runs the
kernels in Pallas interpret mode on CPU, so a kernel regression fails
`pytest tests/` instead of only the TPU bench (VERDICT r4 item 4).

Quality bars mirror tools/test_pallas_eigh.py (wide-spectrum batches) and
tools/quality_pjacobi.py (fit-trajectory parity vs the XLA "eig" solver).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celeste_jl_tpu.ops.pallas_eigh import D, pallas_jacobi_eigh


def _wide_spectrum_batch(rng, B, noise=1e-3):
    """B jittered copies of a symmetric D x D matrix whose spectrum spans
    ~8 decades with a negative tail — the fit Hessian's regime (the f32
    failure mode that killed the tridiag solver, ops/newton.py:70-77)."""
    w_true = np.concatenate([-np.logspace(-4, 1, 6),
                             np.logspace(-5, 3, D - 6)])
    V, _ = np.linalg.qr(rng.standard_normal((D, D)))
    A0 = (V * w_true) @ V.T
    A0 = 0.5 * (A0 + A0.T)
    batch = np.stack([A0 + noise * rng.standard_normal((D, D))
                      for _ in range(B)])
    return (0.5 * (batch + batch.transpose(0, 2, 1))).astype(np.float32)


def test_pjacobi_eigenpairs_wide_spectrum_interpret():
    rng = np.random.default_rng(0)
    batch = _wide_spectrum_batch(rng, B=16)
    w, Q, sweeps = pallas_jacobi_eigh(jnp.asarray(batch), max_sweeps=10,
                                      tol=1e-6, interpret=True)
    w = np.asarray(w, np.float64)
    Q = np.asarray(Q, np.float64)

    # Eigenvalues vs f64 LAPACK: absolute error on an O(1e3)-norm spectrum.
    w64 = np.linalg.eigvalsh(batch.astype(np.float64))
    err = np.max(np.abs(np.sort(w, axis=-1) - w64))
    assert err < 5e-3, err  # measured ~1e-4 (module docstring); XLA f32 ~4e-3

    # Orthogonality and eigenpair residuals ||H q - w q|| / ||H||.
    eye = np.eye(D)
    orth = np.max(np.abs(np.einsum("bji,bjk->bik", Q, Q) - eye))
    assert orth < 1e-4, orth
    resid = np.einsum("bij,bjk->bik", batch.astype(np.float64), Q) - w[:, None, :] * Q
    rel = np.max(np.abs(resid)) / np.linalg.norm(batch[0])
    assert rel < 1e-4, rel


def test_pjacobi_lane_padding_is_harmless():
    """B not a multiple of 128: padded identity lanes must not perturb the
    real lanes' eigenpairs (compare B=3 vs the same rows inside B=16)."""
    rng = np.random.default_rng(3)
    batch = _wide_spectrum_batch(rng, B=5)
    w_a, _, _ = pallas_jacobi_eigh(jnp.asarray(batch), max_sweeps=10,
                                   tol=1e-6, interpret=True)
    w64 = np.linalg.eigvalsh(batch.astype(np.float64))
    err = np.max(np.abs(np.sort(np.asarray(w_a, np.float64), -1) - w64))
    assert err < 5e-3, err


def test_pjacobi_fit_trajectory_parity_cpu():
    """The pjacobi TR solver (interpreted kernel) must land the same basins
    as the "eig" solver on a small star/galaxy fit batch: identical
    classifications, ELBO within optimizer tolerance (the
    tools/quality_pjacobi.py bar, in-suite)."""
    from __graft_entry__ import _synthetic_batch
    from celeste_jl_tpu.models.params import ids
    from celeste_jl_tpu.ops.newton import NewtonConfig
    from celeste_jl_tpu.vi.optimize import fit_sources

    vp0s, patches = _synthetic_batch(n_sources=4, tile=16, seed=2)
    vp0s = jnp.asarray(np.asarray(vp0s, dtype=np.float32))
    patches = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32))
                           if jnp.asarray(x).dtype == jnp.float64 else x,
                           patches)

    res_e = fit_sources(vp0s, patches,
                        config=NewtonConfig(tr_solver="eig", max_iters=12))
    os.environ["CELESTE_PALLAS_INTERPRET"] = "1"
    try:
        # distinct static config => distinct jit cache entry, so the
        # trace-time env read above cannot be hidden by an earlier compile
        res_p = fit_sources(vp0s, patches,
                            config=NewtonConfig(tr_solver="pjacobi",
                                                jacobi_max_sweeps=4,
                                                max_iters=12))
    finally:
        del os.environ["CELESTE_PALLAS_INTERPRET"]

    e_vp = np.asarray(res_e.vp)
    p_vp = np.asarray(res_p.vp)
    types_e = e_vp[:, ids.is_star[0]] > 0.5
    types_p = p_vp[:, ids.is_star[0]] > 0.5
    np.testing.assert_array_equal(types_e, types_p)
    e_elbo = np.asarray(res_e.elbo)
    p_elbo = np.asarray(res_p.elbo)
    rel = (p_elbo - e_elbo) / np.abs(e_elbo)
    # pjacobi may differ within optimizer tolerance but must not land
    # measurably worse optima (tools/quality_pjacobi.py: mean-zero parity)
    assert np.all(rel > -1e-4), rel
