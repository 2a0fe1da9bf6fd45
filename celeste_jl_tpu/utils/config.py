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
    # Hessian-refresh budget per joint class-step (each refresh =
    # NewtonConfig.hess_every TR steps). A batched class-step's while_loop
    # runs every lane until the SLOWEST lane converges; without a cap one
    # straggler lane burns the full NewtonConfig.max_iters (50) cycles on
    # every one of its ~(classes x sweeps) steps — measured 4x the
    # multi-field schedule's wall (benchmark/multifield_results.md). A
    # truncated lane resumes next sweep from its current vp with
    # re-centered position bounds (the schedule's normal warm-start path),
    # so the budget bounds per-step depth, not total optimization work:
    # stragglers get sweeps x cap + restart cap cycles in total, on par
    # with the reference's 50-iteration single-fit cap
    # (ElboMaximize.jl:99).
    joint_step_refreshes: int = 15
    # Hessian-refresh budget for the POLISH sweeps of the joint split
    # schedule. 0 = the caller's full budget.
    # Polish lanes are warm-started at states already optimized under
    # near-final backgrounds, so they converge in a few refreshes; the cap
    # only bounds what a never-converging straggler can burn per
    # class-step (the same rationale as joint_step_refreshes).
    polish_refreshes: int = 15
    # number of full-coverage Gauss-Seidel polish sweeps after the probe.
    # 2 is load-bearing: with 1 the probe's basin flip on the hardest
    # 3-source blend is not re-equilibrated and the GalSim noise-free
    # gate re-breaks (three_sources_all_overlap is_star 0.006, measured
    # round 4); with 2 the gate holds at 0 violations.
    polish_sweeps: int = 2
    # Hessian-refresh budget for the wide fresh-init PROBE pass. The
    # probe's job is basin ESCAPE — an improving escape only has to BEAT
    # the incumbent's ELBO under the same background to be accepted, and
    # the two polish sweeps then finish convergence. 25 halves the
    # probe's serialized depth vs the full 50 with the GalSim noise-free
    # gate intact (0 violations, type accuracy 1.000, measured round 4).
    # 0 = the caller's full budget.
    probe_refreshes: int = 25


def host_cache_tag():
    """Short tag identifying this host's CPU. XLA:CPU caches AOT-compiled
    executables keyed only by program; loading one compiled on a different
    host aborts the process mid-deserialization (SIGABRT in
    compilation_cache get_executable_and_time after a machine migration).
    The tag must include the CPU MODEL, not just the /proc/cpuinfo flags
    line: LLVM picks per-model tuning features (e.g. prefer-no-gather on
    Downfall-mitigated parts) that differ between hosts whose flag lists
    are identical — observed as a cpu_aot_loader feature-mismatch abort
    with matching flags. Keying the cache directory by (model, flags)
    makes a host change start a fresh cache instead of crashing."""
    import hashlib

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("vendor_id", "cpu family", "model", "model name",
                           "stepping", "microcode", "flags"):
                    ident.append(line.strip())
                if key == "flags":
                    break  # one physical package is enough
    except OSError:
        import platform

        ident.append(platform.processor())
    import jaxlib

    ident.append(getattr(jaxlib, "__version__", ""))
    # Separate dirs per JAX platform: a TPU-backend process and a CPU test
    # process sharing one directory has produced SIGSEGV/SIGABRT on
    # concurrent reads (observed only with an axon-backend writer active;
    # every single-process run of the same programs loads cleanly). Read
    # the configured platform WITHOUT initializing the backend.
    import os

    import jax

    platform = (str(getattr(jax.config, "jax_platforms", None) or "")
                or os.environ.get("JAX_PLATFORMS", "") or "auto")
    ident.append(platform)
    # ISA-capped executables (see enable_compile_cache) must not share a
    # directory with uncapped ones.
    if "xla_cpu_max_isa" in os.environ.get("XLA_FLAGS", ""):
        ident.append(os.environ["XLA_FLAGS"])
    return hashlib.md5("\n".join(ident).encode()).hexdigest()[:8]


def enable_compile_cache(path=None):
    """Persistent XLA compile cache. The fit programs take minutes to
    compile cold (one per (batch, tile) shape) but milliseconds to run —
    a fresh process without the cache spends ~97% of a field's wall time
    recompiling launches measured at 0.03-0.45 s warm. Call this before
    any jit; main() and the benchmark drivers do.

    Also caps XLA:CPU codegen at AVX2 (before backend init): this
    jaxlib's CPU AOT loader rejects — and sometimes SIGSEGVs on — cache
    entries carrying per-model tuning pseudo-features
    (prefer-no-gather/scatter), including the process's OWN writes.
    AVX2-capped executables round-trip cleanly and are portable across
    the fleet's hosts. TPU codegen is unaffected by the flag."""
    import os

    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("CELESTE_JAX_CACHE",
                                   f"/tmp/jax_cache-{host_cache_tag()}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
