"""Multi-chip scaling via jax.sharding + shard_map."""

from .sharding import (
    CELL_AXIS,
    make_device_mesh,
    shard_basis_cells,
    solve_pcg_sharded,
    solve_pcg_sharded_bsr,
    solve_pcg_sharded_ell,
)

__all__ = [
    "CELL_AXIS",
    "make_device_mesh",
    "shard_basis_cells",
    "solve_pcg_sharded",
    "solve_pcg_sharded_bsr",
    "solve_pcg_sharded_ell",
]
