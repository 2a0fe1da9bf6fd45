"""celeste_jl_tpu — a TPU-native framework for approximate Bayesian inference
of astronomical catalogs (stars & galaxies) from survey images.

Re-designed from scratch for TPU (JAX / XLA / pjit / shard_map / Pallas) with
the capabilities of the Celeste.jl reference (variational & MCMC inference of
the Regier et al. graphical model over SDSS-like multi-band imagery).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  models/     parameter layout, priors, bivariate-normal mixtures, PSF,
              brightness moments, patch tiles, pixel renderers
  ops/        bijectors (constraint transforms), batched Newton trust-region,
              Pallas kernels
  vi/         deterministic VI: ELBO (value via renderers, derivatives via
              jax.grad/jax.hessian), maximize!, stochastic VI
  mcmc/       slice sampling, annealed importance sampling, MCMC inference
  parallel/   Cyclades conflict-free partitioning, device-mesh scheduling,
              multi-chip sharding
  io/         pure-numpy FITS reader/writer, SDSS & DECaLS survey loaders
  detection/  background estimation + source extraction (SEP-equivalent)
  utils/      logging, config, coordinates, argument parsing
"""

__version__ = "0.1.0"

NUM_BANDS = 5
NUM_SOURCE_TYPES = 2
NUM_COLOR_COMPONENTS = 8
