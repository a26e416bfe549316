"""Utilities: data loading, profiling, benchmark geometry."""

from .profiling import StepTimer, trace
from .seven_fractures import (
    benchmark_seven_fracture_geometry,
    build_benchmark_network,
    load_seven_fractures_raw,
    seven_fractures_rectangles,
)

__all__ = [
    "StepTimer",
    "trace",
    "benchmark_seven_fracture_geometry",
    "build_benchmark_network",
    "load_seven_fractures_raw",
    "seven_fractures_rectangles",
]
