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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# AVX2 ISA cap: this jaxlib's XLA:CPU AOT loader rejects (and sometimes
# SIGSEGVs on) its OWN cache entries — the entries carry per-model tuning
# pseudo-features (prefer-no-gather/scatter) the loader's host-feature
# check doesn't know, even for a same-process write-then-read. Capping the
# ISA at AVX2 keeps those features out of the serialized executables, which
# both stops the crashes and makes entries portable across the fleet's
# hosts (see utils/config.host_cache_tag).
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is dominated by XLA compiles of
# the batched Newton fit; cache them across pytest processes. The directory
# is keyed by host CPU identity + platform (utils/config.host_cache_tag).
from celeste_jl_tpu.utils.config import host_cache_tag  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 f"/tmp/jax_cache-{host_cache_tag()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
