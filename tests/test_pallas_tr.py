"""The Pallas TR-subproblem kernel (ops/pallas_tr.py) must reproduce the
host _solve_tr_eig (ops/newton.py) term for term: interior Newton steps,
secular-bisection boundary steps, and hard-case ridge steps. Run in
interpret mode on CPU (the compiled kernel is the TPU/f32 fast path; the
custom_vmap rule falls back to the host solver everywhere else, so the
CPU fit path is unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np

from celeste_jl_tpu.ops.newton import _solve_tr_eig
from celeste_jl_tpu.ops.pallas_tr import tr_eig_batched


def _host_batch(gq, w, delta, iters):
    return jax.vmap(
        lambda a, b, d: _solve_tr_eig(a, b, d, iters, "bisect"))(
            gq, w, delta)


def _cases(rng, B, D):
    """Mixed batch: PD interior lanes, indefinite boundary lanes, and a
    hard-case lane (gq orthogonal to the bottom eigenvector)."""
    w = rng.standard_normal((B, D)).astype(np.float32) * 3.0
    w[: B // 3] = np.abs(w[: B // 3]) + 0.5          # PD -> interior-ish
    gq = rng.standard_normal((B, D)).astype(np.float32)
    gq[: B // 6] *= 1e-3                             # small g: interior
    delta = (10.0 ** rng.uniform(-3, 1, B)).astype(np.float32)
    # near-hard case: negative bottom eigenvalue, (almost) no gradient
    # along it. An EXACT zero makes both host and kernel hit 0/0 at the
    # bottom component once the bisection bracket collapses onto
    # -lam_min in f32 — unreachable in the fit (gradients are never
    # exactly zero; non-finite trial steps are rejected by the driver's
    # rho guard), so the parity case stays at the reachable near-zero.
    w[-1] = np.linspace(3.0, 0.5, D, dtype=np.float32)
    w[-1, -1] = -2.0
    gq[-1, -1] = 1e-6
    delta[-1] = 5.0
    return jnp.asarray(gq), jnp.asarray(w), jnp.asarray(delta)


def test_tr_kernel_matches_host():
    rng = np.random.default_rng(7)
    B, D, iters = 48, 42, 48
    gq, w, delta = _cases(rng, B, D)
    p_h, pred_h = _host_batch(gq, w, delta, iters)
    p_k, pred_k = tr_eig_batched(gq, w, delta, iters, interpret=True)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_h),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_k), np.asarray(pred_h),
                               rtol=2e-5, atol=2e-5)
    # every FINITE step respects the region (loose f32 margin); the
    # near-hard lane legitimately overflows in f32 — identically in both
    # implementations — and the driver's rho guard rejects such steps.
    norms = np.linalg.norm(np.asarray(p_k), axis=1)
    finite = np.isfinite(norms)
    assert finite.sum() >= len(norms) - 1
    assert (norms[finite] <= np.asarray(delta)[finite] * 1.001 + 1e-6).all()


def test_tr_kernel_lane_padding_is_harmless():
    """B not a multiple of 128: pad lanes must not perturb real lanes."""
    rng = np.random.default_rng(3)
    gq, w, delta = _cases(rng, 10, 42)
    p_k, pred_k = tr_eig_batched(gq, w, delta, 48, interpret=True)
    p_h, pred_h = _host_batch(gq, w, delta, 48)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_h),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_k), np.asarray(pred_h),
                               rtol=2e-5, atol=2e-5)


def test_config_plumbs_tr_kernel_without_changing_cpu_fit():
    """tr_kernel="pallas" on CPU routes through the custom_vmap fallback:
    the batched fit must be identical to tr_kernel="xla"."""
    from celeste_jl_tpu.ops.newton import NewtonConfig, minimize_newton_tr

    D = 5
    A = jnp.asarray(np.diag(np.linspace(1.0, 4.0, D)).astype(np.float32))
    b = jnp.asarray(np.linspace(1.0, 2.0, D).astype(np.float32))

    def fgh(x):
        g = A @ x - b
        return 0.5 * x @ A @ x - b @ x, g, A

    x0 = jnp.zeros((3, D), jnp.float32) + jnp.arange(3)[:, None] * 0.1
    outs = []
    for kern in ("xla", "pallas"):
        cfg = NewtonConfig(tr_solver="eig", tr_kernel=kern, max_iters=10)
        st = jax.vmap(lambda x: minimize_newton_tr(fgh, x, cfg))(x0)
        outs.append(np.asarray(st.x))
    np.testing.assert_array_equal(outs[0], outs[1])
