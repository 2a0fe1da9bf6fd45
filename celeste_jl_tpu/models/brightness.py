"""Expected per-band brightness moments under the variational posterior.

E[l_b | a=i] and E[l_b^2 | a=i] for the 5 bands and 2 source types, from the
lognormal flux (band 3 = r is the reference band) and lognormal color chain.
Values match source_brightness.jl:27-202; derivatives come from JAX.
"""

import jax.numpy as jnp

from .params import ids


def brightness_moments(vp):
    """vp: (44,) canonical params. Returns (E_l (5,2), E_ll (5,2))."""
    flux_loc = vp[ids.flux_loc]        # (2,)
    flux_scale = vp[ids.flux_scale]    # (2,)
    color_mean = vp[ids.color_mean]    # (4, 2)
    color_var = vp[ids.color_var]      # (4, 2)

    # E[l]: reference band (index 2) is lognormal; adjacent bands chain
    # multiplicatively through the colors.
    e3 = jnp.exp(flux_loc + 0.5 * flux_scale)
    e4 = e3 * jnp.exp(color_mean[2] + 0.5 * color_var[2])
    e5 = e4 * jnp.exp(color_mean[3] + 0.5 * color_var[3])
    e2 = e3 * jnp.exp(-color_mean[1] + 0.5 * color_var[1])
    e1 = e2 * jnp.exp(-color_mean[0] + 0.5 * color_var[0])
    E_l = jnp.stack([e1, e2, e3, e4, e5])  # (5, 2)

    # E[l^2]
    f3 = jnp.exp(2.0 * flux_loc + 2.0 * flux_scale)
    f4 = f3 * jnp.exp(2.0 * color_mean[2] + 2.0 * color_var[2])
    f5 = f4 * jnp.exp(2.0 * color_mean[3] + 2.0 * color_var[3])
    f2 = f3 * jnp.exp(-2.0 * color_mean[1] + 2.0 * color_var[1])
    f1 = f2 * jnp.exp(-2.0 * color_mean[0] + 2.0 * color_var[0])
    E_ll = jnp.stack([f1, f2, f3, f4, f5])  # (5, 2)

    return E_l, E_ll
