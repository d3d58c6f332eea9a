"""Utilities: metrics logging/observability and profiling (SURVEY.md §5)."""

from triplegan_tpu.utils.logging import MetricsLogger
from triplegan_tpu.utils.profiling import step_timer, trace

__all__ = ["MetricsLogger", "step_timer", "trace"]
