"""Benchmark drivers and campaign sweeps (CLI: python -m rfhe_tpu.bench.sweeps)."""
