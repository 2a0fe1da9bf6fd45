"""Validation & benchmarking: catalog schema, scoring, prior-draw catalogs
(AccuracyBenchmark.jl), and the GalSim-style ground-truth scene suite
(GalsimBenchmark.jl + benchmark/galsim)."""
