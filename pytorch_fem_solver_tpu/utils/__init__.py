"""Utilities: data loading, profiling, benchmark geometry."""

from .profiling import StepTimer, trace
from .vtk import write_vtk
from .seven_fractures import (
    benchmark_seven_fracture_geometry,
    build_benchmark_network,
    load_seven_fractures_raw,
    seven_fractures_rectangles,
)

__all__ = [
    "StepTimer",
    "write_vtk",
    "trace",
    "benchmark_seven_fracture_geometry",
    "build_benchmark_network",
    "load_seven_fractures_raw",
    "seven_fractures_rectangles",
]
