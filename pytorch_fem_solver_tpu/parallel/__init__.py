"""Multi-chip scaling via jax.sharding + shard_map."""

from .sharded_bsr import (
    get_bsr_shard_plan,
    sharded_bsr_solver,
    solve_pcg_sharded_bsr,
)
from .sharded_eigen import sharded_eigsh_solver
from .sharded_newton import sharded_newton_solver
from .sharded_stokes import sharded_stokes_solver
from .sharding import (
    CELL_AXIS,
    make_device_mesh,
    shard_basis_cells,
    solve_pcg_sharded,
    solve_pcg_sharded_ell,
)

__all__ = [
    "CELL_AXIS",
    "get_bsr_shard_plan",
    "sharded_bsr_solver",
    "make_device_mesh",
    "sharded_eigsh_solver",
    "sharded_newton_solver",
    "sharded_stokes_solver",
    "shard_basis_cells",
    "solve_pcg_sharded",
    "solve_pcg_sharded_bsr",
    "solve_pcg_sharded_ell",
]
