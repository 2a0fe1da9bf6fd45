"""MCMC validation path: slice sampling, annealed importance sampling,
star/galaxy log densities (MCMC.jl + src/mcmc/* equivalents)."""

from .ais import ais, ais_slicesample, bootstrap_lnZ, sigmoid_schedule  # noqa
from .infer import (one_node_mcmc_infer, potential_scale_reduction,  # noqa
                    run_ais, run_mcmc)
from .log_prob import (gal_loglike, gal_logpost, gal_logprior,  # noqa
                       make_source_target, sample_gal_prior,
                       sample_star_prior, star_loglike, star_logpost,
                       star_logprior)
from .slice import slicesample, slicesample_chain  # noqa
