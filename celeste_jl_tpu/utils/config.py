"""Global inference configuration (config.jl:2-25 equivalent)."""

from dataclasses import dataclass


@dataclass
class Config:
    # patches must be at least this many pixels in radius
    min_radius_pix: float = 8.0
    # number of temperatures in the annealed importance sampling ladder
    num_ais_temperatures: int = 50
    # number of AIS importance samples
    num_ais_samples: int = 10
    # outer iterations of joint (Cyclades) variational inference
    num_joint_vi_iters: int = 3


def host_cache_tag():
    """Short tag identifying this host's CPU feature set. XLA:CPU caches
    AOT-compiled executables keyed only by program; loading one compiled on
    a host with different vector extensions aborts the process mid-
    deserialization (observed as SIGABRT in compilation_cache
    get_executable_and_time after a machine migration). Keying the cache
    directory by CPU flags makes a host change start a fresh cache instead
    of crashing on the stale one."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


def enable_compile_cache(path=None):
    """Persistent XLA compile cache. The fit programs take minutes to
    compile cold (one per (batch, tile) shape) but milliseconds to run —
    a fresh process without the cache spends ~97% of a field's wall time
    recompiling launches measured at 0.03-0.45 s warm. Call this before
    any jit; main() and the benchmark drivers do."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("CELESTE_JAX_CACHE",
                                   f"/tmp/jax_cache-{host_cache_tag()}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
