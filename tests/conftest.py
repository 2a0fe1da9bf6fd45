import os

# Multi-chip sharding is tested on a virtual 8-device CPU mesh; parity tests
# run in float64 (the TPU bench path uses float32 — see bench.py).
#
# Force CPU. The ambient environment may point JAX at a real TPU
# (JAX_PLATFORMS=axon), and pytest plugins (jaxtyping) import jax *before*
# this conftest runs, so setting the env var alone is not enough — update
# the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()
