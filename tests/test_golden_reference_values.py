"""Golden cross-implementation value tests against the reference's
CHECKED-IN binary artifacts (read directly with h5py — Julia 0.6 JLD files
are plain HDF5). These pin the rebuild's constants to the reference's
actual trained values, not just to re-typed literals.

(The reference's test/data/kl_values.jld is an orphaned fixture — nothing
in the reference's test tree loads it, and its 32-dim SensitiveFloat
predates the 44-param layout — so no KL golden values are extractable;
KL correctness is covered by the 4-sigma Monte Carlo checks in
tests/test_kl.py instead, mirroring test_kl.jl.)"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

STAR_JLD = "/root/reference/cfg/star_prior.jld"
GAL_JLD = "/root/reference/cfg/gal_prior.jld"

needs_ref = pytest.mark.skipif(
    not __import__("os").path.exists(STAR_JLD),
    reason="reference cfg artifacts not present")


@needs_ref
def test_priors_npz_bit_equal_to_reference_jld():
    """data/priors.npz must be numerically identical to the reference's
    trained prior artifacts (cfg/gen_priors.jl outputs, loaded by
    model/light_source_model.jl:99-105)."""
    import celeste_jl_tpu.models.priors as priors_mod

    d = np.load(priors_mod._DATA)
    for tag, path in (("star", STAR_JLD), ("gal", GAL_JLD)):
        with h5py.File(path, "r") as f:
            np.testing.assert_array_equal(d[f"{tag}_prior_weights"],
                                          np.asarray(f["c_weights"]))
            np.testing.assert_array_equal(d[f"{tag}_prior_means"],
                                          np.asarray(f["c_means"]).T)
            np.testing.assert_array_equal(
                d[f"{tag}_prior_covs"],
                np.asarray(f["c_covs"]).transpose(2, 1, 0))
            np.testing.assert_array_equal(d[f"{tag}_prior_r"],
                                          np.asarray(f["r_params"]))


@needs_ref
def test_live_prior_struct_matches_reference_artifacts():
    """The in-memory PriorConstants used by the ELBO must carry the same
    flux/color values the reference loads."""
    from celeste_jl_tpu.models.priors import prior

    with h5py.File(STAR_JLD, "r") as fs, h5py.File(GAL_JLD, "r") as fg:
        # k weights: (8, 2) [star, gal]
        np.testing.assert_allclose(prior.k[:, 0], np.asarray(fs["c_weights"]))
        np.testing.assert_allclose(prior.k[:, 1], np.asarray(fg["c_weights"]))
        # color GMM means: prior.color_mean (4, 8, 2)
        np.testing.assert_allclose(prior.color_mean[:, :, 0],
                                   np.asarray(fs["c_means"]).T)
        np.testing.assert_allclose(prior.color_mean[:, :, 1],
                                   np.asarray(fg["c_means"]).T)
    # flux/radius lognormals: the reference IGNORES the JLD r_params and
    # hardcodes ML fits to primary output (light_source_model.jl:110-127);
    # pin those literals, not the superseded artifact values
    np.testing.assert_allclose(prior.flux_mean, [1.5035546, 1.07431])
    np.testing.assert_allclose(prior.flux_var,
                               [1.9039063 ** 2, 1.1177502 ** 2])
    np.testing.assert_allclose(
        [prior.gal_radius_px_mean, prior.gal_radius_px_var],
        [0.5015693, 0.8590007 ** 2])
    np.testing.assert_allclose(prior.is_star, [0.95, 0.05])


def test_galaxy_prototypes_match_reference_literals():
    """GAL_ETA/GAL_NU pinned to light_source_model.jl:45-75 (8-component
    de Vaucouleurs + 6-component exponential, with the effective-radius
    corrections)."""
    from celeste_jl_tpu.models.params import GAL_ETA, GAL_IS_DEV, GAL_NU

    dev_amp = np.array([4.26347652e-2, 2.40127183e-1, 6.85907632e-1,
                        1.51937350, 2.83627243, 4.46467501, 5.72440830,
                        5.60989349])
    dev_var = np.array([2.23759216e-4, 1.00220099e-3, 4.18731126e-3,
                        1.69432589e-2, 6.84850479e-2, 2.87207080e-1,
                        1.33320254, 8.40215071]) / 1.078031 ** 2
    exp_amp = np.array([2.34853813e-3, 3.07995260e-2, 2.23364214e-1,
                        1.17949102, 4.33873750, 5.99820770])
    exp_var = np.array([1.20078965e-3, 8.84526493e-3, 3.91463084e-2,
                        1.39976817e-1, 4.60962500e-1, 1.50159566]) \
        / 0.928896 ** 2
    np.testing.assert_allclose(GAL_ETA[:8], dev_amp / dev_amp.sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(GAL_ETA[8:], exp_amp / exp_amp.sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(GAL_NU[:8], dev_var, rtol=1e-12)
    np.testing.assert_allclose(GAL_NU[8:], exp_var, rtol=1e-12)
    np.testing.assert_array_equal(GAL_IS_DEV,
                                  np.concatenate([np.ones(8), np.zeros(6)]))


def test_asinh_softening_matches_reference():
    """AccuracyBenchmark.jl:132-137 band softening parameters."""
    from celeste_jl_tpu.benchmark.accuracy import ASINH_SOFTENING

    np.testing.assert_array_equal(
        ASINH_SOFTENING, [1.4e-10, 0.9e-10, 1.2e-10, 1.8e-10, 7.4e-10])
