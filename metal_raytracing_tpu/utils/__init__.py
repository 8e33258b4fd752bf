"""Observability utilities: metrics, timing, profiling (SURVEY.md §5)."""

from .metrics import BenchResult, benchmark_renderer, wavefront_stats  # noqa: F401
